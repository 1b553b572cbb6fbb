package graft.functions

/** Driver-side evaluation of Spark's own hash expressions — for
  * generating plan constants (Rademacher plane signs, sketch probes)
  * from the SAME hash the distributed expressions and the DuckDB
  * oracle replication speak. Never use a JVM reimplementation here:
  * the whole point is that a Spark upgrade changing `xxhash64` would
  * change these constants in lockstep.
  */
object HashUtil {

  /** Spark's `xxhash64` of a string literal (seed 42 by default). */
  def xxh64String(s: String, seed: Long = 42L): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
        s, org.apache.spark.sql.types.StringType)), seed)
      .eval(null).asInstanceOf[Long]
}
