package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Event-time sessionization needs the watermark to ADVANCE between
  * micro-batches for timeouts to fire; a single-batch file source never
  * does that. `maxFilesPerTrigger=1` over two files drives two batches:
  * batch 2's watermark (derived from batch 1's max event time) closes
  * batch-1 sessions.
  */
class EventTimeSessionSpec extends SparkSpec {
  import spark.implicits._

  test("EventTimeTimeout closes sessions when the watermark passes the gap") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ets").toString
    val gapUs = 10L * 60 * 1000 * 1000 // 10 min
    // batch 1: two sessions for user 1 (events 0min,1min then a lone
    // event at 60min) — first closes inline on the 60min arrival;
    // batch 2: far-future event advances the watermark and times out
    // the 60min session
    def row(id: Long, us: Long, u: Long) = (id, us * 1000, u, "e", 1.0, "{}")
    // three files -> three micro-batches: the watermark computed from a
    // batch's max event time only applies to the NEXT batch, so the
    // timeout for the 3600s session (due 4200s) fires in batch 3
    Seq(row(0, 1000000, 1), row(1, 60L * 1000000, 1), row(2, 3600L * 1000000, 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$tmp/f1.parquet")
    Seq(row(3, 36000L * 1000000, 2))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$tmp/f2.parquet")
    Seq(row(4, 37000L * 1000000, 2))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$tmp/f3.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // legacy ns-INT64 shape, normalized through the same shared helper
    // as the production readers
    import org.apache.spark.sql.types._
    val nsSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val stream = graft.io.Tables.normalizeEventsTs(
      spark.readStream
        .schema(nsSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$tmp/*"))

    val sessions = StreamingPrep.runToMemory(
      StreamingPrep.sessionizeEventTime(stream, "0 seconds", gapUs))
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    // session 1: events at 1s and 60s (closed inline by the 3600s event;
    // ts=0 would sit AT the initial watermark and be dropped — stateful
    // ops discard rows <= watermark);
    // session 2: the lone 3600s event (closed by watermark timeout)
    assert(sessions.contains((1L, 1000000L, 60L * 1000000, 2L)))
    assert(sessions.contains((1L, 3600L * 1000000, 3600L * 1000000, 1L)))
  }
}
