package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("cross-batch near-dups drop against the evolving index; novelty survives") {
    // disjoint vocabulary per doc id — a modular-progression vocab
    // (w{(i*31+j*7)%97}) makes distinct ids share long word RUNS, which
    // the dedup then CORRECTLY flags (found the hard way)
    def doc(i: Int): String =
      (0 until 30).map(j => s"d${i}w$j").mkString(" ")
    val mem = MemoryStream[(Long, String)](spark)
    val verdicts = mutable.ArrayBuffer.empty[(Long, Option[Long])]
    val q = StreamingDedup.start(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text") { (v, _) =>
      verdicts ++= v.select("doc_id", "dup_of")
        .as[(Long, Option[Long])].collect()
    }
    try {
      // batch 1: two novel docs — both survive, seed the index
      mem.addData((1L, doc(1)), (2L, doc(2)))
      q.processAllAvailable()
      // batch 2: near-copy of doc 1 (one word appended) + a novel doc
      mem.addData((10L, doc(1) + " omega"), (11L, doc(3)))
      q.processAllAvailable()
      // batch 3: near-copy of batch 2's SURVIVOR (proves the index
      // folded batch 2 in), plus a near-copy of a batch-2 DUP's
      // original (still owned by doc 1)
      mem.addData((20L, doc(3) + " extra"), (21L, doc(1) + " beta"))
      q.processAllAvailable()
    } finally q.stop()

    val byId = verdicts.toMap
    assert(byId(1L).isEmpty && byId(2L).isEmpty)
    assert(byId(10L) === Some(1L)) // caught by batch-1 index
    assert(byId(11L).isEmpty)      // novel → admitted
    assert(byId(20L) === Some(11L)) // caught by index updated with batch 2
    assert(byId(21L) === Some(1L))  // original owner, not the dropped 10
    assert(verdicts.size === 6)
  }
}
