package graft.oracle

/** Generated DuckDB oracle for the portable-sketch family
  * ([[graft.pipeline.PortableSketches]]): the register state is a pure
  * integer function of xxhash64 over the stringified keys, so the
  * whole sketch replays through [[DuckDbXxHash]]. Both dialects print
  * minimal-length binary via `bin()`, which is how the leading-zero
  * count stays expression-only on both sides.
  */
object SketchOracles {

  /** HLL registers over `srcSql` (must yield one VARCHAR column `s`).
    * `withHead` lets callers prepend their own CTEs (pass e.g. the
    * ratings CTE followed by a comma).
    */
  def hllRegistersSql(srcSql: String, p: Int = 12,
      withHead: String = "WITH"): String = {
    val m64 = BigInt(1) << 64
    val shift = BigInt(1) << p
    val bucketDiv = BigInt(1) << (64 - p)
    s"""$withHead
       |dk AS (SELECT DISTINCT s FROM ($srcSql) WHERE s IS NOT NULL),
       |${DuckDbXxHash.xxh64Ctes("dk", "s", "kh", idCols = "s AS ids")},
       |rh AS (SELECT CAST(h64 // $bucketDiv AS BIGINT) AS bucket,
       |              CASE WHEN (CAST(h64 AS UHUGEINT) * $shift) % $m64 = 0
       |                   THEN ${64 - p + 1}
       |                   ELSE 65 - length(bin(CAST(
       |                     (CAST(h64 AS UHUGEINT) * $shift) % $m64
       |                     AS UBIGINT))) END AS rho
       |       FROM kh)
       |SELECT bucket, CAST(max(rho) AS INT) AS max_rho
       |FROM rh GROUP BY 1""".stripMargin
  }

  /** Count-Min cells over `srcSql` (one VARCHAR column `s`, duplicates
    * meaningful): occurrences are pre-aggregated per key so the
    * byte-level hash chain runs once per (row, distinct key).
    */
  def cmSketchSql(srcSql: String, depth: Int = 4, width: Int = 1024,
      withHead: String = "WITH"): String =
    s"""$withHead
       |ko AS (SELECT s, count(*) AS n FROM ($srcSql)
       |       WHERE s IS NOT NULL GROUP BY 1),
       |dk AS (SELECT CAST(j.j AS VARCHAR) || ':' || ko.s AS s,
       |              j.j AS jr, ko.n AS kn
       |       FROM ko CROSS JOIN range($depth) j(j)),
       |${DuckDbXxHash.xxh64Ctes("dk", "s", "kh", idCols = "jr, kn")}
       |SELECT CAST(jr AS INT) AS "row",
       |       CAST(h64 % $width AS BIGINT) AS col,
       |       CAST(sum(kn) AS BIGINT) AS cnt
       |FROM kh GROUP BY 1, 2""".stripMargin

  /** Per-group HLL registers over `srcSql` (columns `g`, `s`): the
    * grouped form of [[hllRegistersSql]].
    */
  def hllRegistersBySql(srcSql: String, p: Int = 12,
      withHead: String = "WITH"): String = {
    val m64 = BigInt(1) << 64
    val shift = BigInt(1) << p
    val bucketDiv = BigInt(1) << (64 - p)
    s"""$withHead
       |gk AS (SELECT g, s FROM ($srcSql) WHERE s IS NOT NULL),
       |dk AS (SELECT DISTINCT s FROM gk),
       |${DuckDbXxHash.xxh64Ctes("dk", "s", "kh", idCols = "s AS ids")},
       |rh AS (SELECT gk.g,
       |              CAST(kh.h64 // $bucketDiv AS BIGINT) AS bucket,
       |              CASE WHEN (CAST(kh.h64 AS UHUGEINT) * $shift) % $m64 = 0
       |                   THEN ${64 - p + 1}
       |                   ELSE 65 - length(bin(CAST(
       |                     (CAST(kh.h64 AS UHUGEINT) * $shift) % $m64
       |                     AS UBIGINT))) END AS rho
       |       FROM gk JOIN kh ON kh.s = gk.s)
       |SELECT g AS "group", bucket, CAST(max(rho) AS INT) AS max_rho
       |FROM rh GROUP BY 1, 2""".stripMargin
  }

  /** Bottom-k consistent sample over `srcSql` (one VARCHAR column
    * `s`): the k distinct keys with the smallest SIGNED xxhash64
    * (matching the engine's long ordering), with deterministic
    * key tie-break.
    */
  def bottomKSql(srcSql: String, k: Int,
      withHead: String = "WITH"): String =
    s"""$withHead
       |dk AS (SELECT DISTINCT s FROM ($srcSql) WHERE s IS NOT NULL),
       |${DuckDbXxHash.xxh64Ctes("dk", "s", "kh", idCols = "s AS ids")}
       |SELECT s AS key,
       |  CAST(${DuckDbXxHash.signedSql("h64")} AS BIGINT) AS h
       |FROM kh
       |ORDER BY h, key LIMIT $k""".stripMargin

  /** Bloom set-bit relation over `srcSql` (one VARCHAR column `s`):
    * DISTINCT bits of xxhash64("j:key") % bits for j < numHashes.
    */
  def bloomBitsSql(srcSql: String, numHashes: Int = 5, bits: Int = 65536,
      withHead: String = "WITH"): String =
    s"""$withHead
       |bk AS (SELECT DISTINCT s FROM ($srcSql) WHERE s IS NOT NULL),
       |dk AS (SELECT CAST(j.j AS VARCHAR) || ':' || bk.s AS s
       |       FROM bk CROSS JOIN range($numHashes) j(j)),
       |${DuckDbXxHash.xxh64Ctes("dk", "s", "kh", idCols = "s AS ids")}
       |SELECT DISTINCT CAST(h64 % $bits AS BIGINT) AS bit FROM kh""".stripMargin

  /** Bloom membership probe: corpus rows (`corpusSql` yields
    * (doc_id, s)) probed against the filter built from `benchSql`
    * (yields `s`); output (doc_id, might_contain). One shared hash
    * pass covers both sides' keys.
    */
  def bloomProbeSql(corpusSql: String, benchSql: String,
      numHashes: Int = 5, bits: Int = 65536,
      withHead: String = "WITH"): String =
    s"""$withHead
       |bm AS (SELECT DISTINCT s AS fp FROM ($benchSql)
       |       WHERE s IS NOT NULL),
       |dc AS (SELECT doc_id, s AS fp FROM ($corpusSql)),
       |allk AS (SELECT DISTINCT fp FROM
       |           (SELECT fp FROM bm UNION ALL
       |            SELECT fp FROM dc WHERE fp IS NOT NULL)),
       |dk AS (SELECT CAST(j.j AS VARCHAR) || ':' || allk.fp AS s,
       |              allk.fp AS kfp, j.j AS jr
       |       FROM allk CROSS JOIN range($numHashes) j(j)),
       |${DuckDbXxHash.xxh64Ctes("dk", "s", "kh", idCols = "kfp, jr")},
       |bitsrel AS (SELECT kfp, jr, CAST(h64 % $bits AS BIGINT) AS bit
       |            FROM kh),
       |bloom AS (SELECT DISTINCT b.bit
       |          FROM bitsrel b JOIN bm ON bm.fp = b.kfp),
       |hits AS (SELECT d.doc_id, count(*) AS nhit
       |         FROM dc d JOIN bitsrel b ON b.kfp = d.fp
       |                   JOIN bloom ON bloom.bit = b.bit
       |         GROUP BY 1)
       |SELECT d.doc_id, coalesce(h.nhit, 0) = $numHashes AS might_contain
       |FROM dc d LEFT JOIN hits h ON h.doc_id = d.doc_id""".stripMargin

  /** Fixed-range histogram registers over `srcSql` (one numeric column
    * `v`): the bucket chain mirrors the engine's shape exactly —
    * ((v − lo) / (hi − lo)) · buckets, floored then clamped.
    */
  def histRegistersSql(srcSql: String, lo: Double, hi: Double,
      buckets: Int = 64, withHead: String = "WITH"): String =
    s"""$withHead
       |hv AS (SELECT v FROM ($srcSql) WHERE v IS NOT NULL),
       |hb AS (SELECT least(greatest(CAST(floor(
       |         (CAST(v AS DOUBLE) - $lo) / ${hi - lo} * ${buckets.toDouble})
       |         AS BIGINT), 0), ${buckets - 1}) AS bucket FROM hv)
       |SELECT bucket, count(*) AS cnt FROM hb GROUP BY 1""".stripMargin
}
