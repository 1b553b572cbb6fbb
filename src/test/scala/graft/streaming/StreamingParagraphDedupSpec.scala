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
}
