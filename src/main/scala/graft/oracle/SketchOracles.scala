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
