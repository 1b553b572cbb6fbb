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
}
