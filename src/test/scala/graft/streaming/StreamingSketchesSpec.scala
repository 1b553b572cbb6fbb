package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.PortableSketches

/** Rolling HLL over a stream (q129): fold-equals-batch and the
  * replay-idempotence claim (max-merge absorbs an at-least-once
  * re-delivery — the property that lets this op skip the dedup
  * indexes' batchId guard).
  */
class StreamingSketchesSpec extends SparkSpec {
  import spark.implicits._

  test("rolling registers after all batches equal the batch sketch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val run = StreamingSketches.startHll(
      mem.toDF().withColumnRenamed("value", "k"), col("k")) { (_, _) => () }
    try {
      mem.addData(0L until 300L: _*)
      run.query.processAllAvailable()
      mem.addData(200L until 700L: _*) // overlap: max absorbs
      run.query.processAllAvailable()
      val got = run.registers().get
        .as[(Long, Int)].collect().toSet
      val want = PortableSketches.hllRegisters(
        spark.range(700).select(col("id").as("k")), col("k"))
        .as[(Long, Int)].collect().toSet
      assert(got === want)
    } finally { run.query.stop(); run.release() }
  }

  test("re-folding the same registers is a no-op (replay idempotence)") {
    val df = spark.range(1000).select(col("id").cast("string").as("k"))
    val regs = PortableSketches.hllRegisters(df, col("k"))
    val refolded = PortableSketches.hllMerge(regs, regs)
      .as[(Long, Int)].collect().toSet
    assert(refolded === regs.as[(Long, Int)].collect().toSet)
  }
}
