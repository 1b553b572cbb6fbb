package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  test("cross-batch repeated lines drop against the evolving line index") {
    val tbl = s"graft_pd_spec_${System.nanoTime()}"
    val mem = MemoryStream[(Long, String)](spark)
    val got = mutable.Map.empty[Long, (String, Long, Long)]
    val q = StreamingParagraphDedup.start(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", indexTable = tbl) {
      (out, _) =>
        got ++= out.as[(Long, String, Long, Long)].collect()
          .map(r => r._1 -> ((r._2, r._3, r._4)))
    }
    try {
      // batch 1: doc 1 owns the footer; doc 2's copy drops WITHIN batch
      mem.addData(
        (1L, "alpha line\nShared Footer"),
        (2L, "beta line\nshared  FOOTER"))
      q.processAllAvailable()
      // batch 2: footer recurs (cross-batch → dropped); empty line kept;
      // a fully-boilerplate doc reduces to ""
      mem.addData(
        (10L, "gamma line\n\nshared footer"),
        (11L, "shared footer"))
      q.processAllAvailable()
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
    assert(got(1L) === (("alpha line\nShared Footer", 2L, 0L)))
    assert(got(2L) === (("beta line", 1L, 1L)))
    assert(got(10L) === (("gamma line\n", 2L, 1L)))
    assert(got(11L) === (("", 0L, 1L)))
  }

  test("per-batch shuffle volume scales with batch, not index") {
    def doc(i: Int): String =
      (0 until 4).map(j => s"pd${i}line$j word word").mkString("\n")
    val tbl = s"graft_pd_vol_${System.nanoTime()}"
    val mem = MemoryStream[(Long, String)](spark)
    val q = StreamingParagraphDedup.start(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", indexTable = tbl) {
      (_, _) => ()
    }
    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    try {
      // seed: 500 docs × 4 unique lines = 2000 indexed hashes
      mem.addData((1 to 500).map(i => (i.toLong, doc(i))): _*)
      q.processAllAvailable()
      spark.sparkContext.addSparkListener(listener)
      mem.addData((1001 to 1010).map(i => (i.toLong, doc(i))): _*)
      q.processAllAvailable()
      var last = -1L
      var spins = 0
      while (shuffleRecords.get != last && spins < 40) {
        last = shuffleRecords.get; spins += 1; Thread.sleep(250)
      }
      assert(shuffleRecords.get < 1000,
        s"batch shuffle ${shuffleRecords.get} records vs 2000-line index — " +
          "index-sized re-shuffle regression")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}
