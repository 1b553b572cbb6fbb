package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming surface (SURVEY §2.10): the reference is batch
  * only; per the BASELINE north-star the *preprocessing* operator subset
  * (project/filter/dedup-by-key) plus windowed aggregation and custom
  * sessionization also run as streams. Training stays batch.
  *
  * Scale posture: every streaming op here is keyed state with a
  * watermark bound — state size is O(keys in the watermark horizon),
  * never O(stream length); all operators run identically on a real
  * unbounded source (kafka/files) since nothing below depends on the
  * test harness's one-batch parquet drive.
  */
object StreamingPrep {

  /** Streaming scan of the events table (file source; on a cluster this
    * would be a kafka/file-watch source — same downstream plan).
    *
    * A streaming file source needs a caller-supplied schema, and the
    * fixture has shipped `ts` as both nanosecond INT64 and MICROS
    * timestamp across rounds — so probe the footer of the files we are
    * about to stream with ONE batch-side schema read (metadata only, no
    * data scan) and declare exactly what the footer says. Hardcoding
    * either encoding silently corrupts timestamps when the producer
    * changes its writer (a micros value divided by 1000 shrinks time
    * 1000×: 30 days of events collapse into ~43 minutes). The shared
    * [[graft.io.Tables.normalizeEventsTs]] then yields the same
    * canonical `(…, ts_ns, …, ts)` shape as the batch reader.
    */
  def streamEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val observed = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(sfDir).schema
    graft.io.Tables.normalizeEventsTs(
      spark.readStream
        .schema(observed)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
  }

  /** Streaming scan of the documents corpus (file source): the
    * continuous-ingest half of the curation pipeline — new corpus
    * batches arrive as files and flow through the same stateless
    * curation expressions (profile, fingerprint, decontaminate) as
    * batch.
    */
  def streamDocuments(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType))))
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)

  /** Streaming scan of the embeddings table (file source) — the
    * ingest-time face of the embedding operators (semantic
    * decontamination, assignment probes). Frozen-model consumers
    * (centroids, benchmark indexes) are stateless over this stream.
    */
  def streamEmbeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream
      .schema(StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(sfDir)

  /** One packed document in the streaming sequence-pack output. */
  final case class PackedDoc(doc_id: Long, lang: String, n_tokens: Long,
      seq_id: Long, seq_offset: Long)

  /** Streaming sequence packing: the stateful streaming twin of
    * `Curation.packSequences` — per-shard state is ONE running token
    * count, so a continuously-ingesting tokenizer feeder assigns every
    * arriving document its (seq_id, seq_offset) without re-reading
    * history.
    *
    * ORDERING CONTRACT (API-level, not an aside): documents are packed
    * in `doc_id` order WITHIN each micro-batch only — parity with the
    * batch packer requires ingest to deliver doc_ids in
    * non-interleaved order across batches (one batch, or ordered file
    * arrival). Out-of-order ingest must use [[packSequencesOrdered]],
    * which buffers inside the watermark horizon and flushes in order.
    * Each invocation also materializes its batch's group to sort it,
    * so per-task memory is O(largest shard per micro-batch); state
    * never grows with stream length — one long per shard.
    */
  def packSequences(docs: DataFrame, seqLen: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = docs.select(col("doc_id").cast("long"), col("lang"),
      col("n_tokens").cast("long")).as[(Long, String, Long)]
    ds.groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (lang: String, batch: Iterator[(Long, String, Long)],
         state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = batch.toSeq.sortBy(_._1).map { case (id, _, n) =>
            val start = cum
            cum += n
            PackedDoc(id, lang, n, start / seqLen, start % seqLen)
          }
          state.update(cum)
          out.iterator
      }
      .toDF()
  }

  /** Per-shard state for [[packSequencesOrdered]]: running token count
    * plus the docs still inside the watermark horizon (doc_id, n_tokens).
    */
  final case class OrderedPackState(cum: Long, buf: Seq[(Long, Long)])

  /** Event-time-ordered streaming sequence packing: the out-of-order
    * ingest variant of [[packSequences]].
    *
    * Each document carries an event time derived from its `doc_id`
    * (one second per id — a monotone proxy for ingest time; a real
    * deployment substitutes its ingest timestamp). Arrivals buffer in
    * keyed state; once the WATERMARK passes a document's event time no
    * earlier document can still arrive (Spark drops rows at or behind
    * the watermark), so the buffered prefix at or behind the watermark
    * is flushed in `doc_id` order with running offsets — yielding
    * EXACTLY the batch packer's assignment on the delivered set, no
    * matter how arrivals interleave across micro-batches. Flushes are
    * driven both by new data and by EventTimeTimeout, so a shard with
    * no further arrivals still drains once the watermark advances.
    * State is O(docs inside the watermark horizon) per shard — bounded
    * by the `delay` the ingest actually needs, never by stream length.
    */
  def packSequencesOrdered(docs: DataFrame, seqLen: Int,
      delay: String = "60 seconds"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ds = docs
      .select(col("doc_id").cast("long").as("doc_id"), col("lang"),
        col("n_tokens").cast("long").as("n_tokens"),
        // +1: rows AT the watermark are dropped (boundary inclusive),
        // and the watermark starts at 0 — doc_id 0 must sit above it
        timestamp_micros((col("doc_id") + 1) * lit(1000000L)).as("ts"))
      .withWatermark("ts", delay)
      .as[(Long, String, Long, java.sql.Timestamp)]
    ds.groupByKey(_._2)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (lang: String, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
         state: GroupState[OrderedPackState]) =>
          val st = state.getOption.getOrElse(OrderedPackState(0L, Nil))
          val arrivals = rows.map(r => (r._1, r._3)).toSeq
          val wmMs = state.getCurrentWatermarkMs()
          // ready = ids whose event time ((id+1) seconds) the watermark
          // has passed; they can no longer be preceded, so their order
          // is final
          val (ready, hold) = (st.buf ++ arrivals).sortBy(_._1)
            .partition { case (id, _) => (id + 1) * 1000L <= wmMs }
          var cum = st.cum
          val out = ready.map { case (id, n) =>
            val start = cum
            cum += n
            PackedDoc(id, lang, n, start / seqLen, start % seqLen)
          }
          // the running count is the shard's permanent state (every
          // future arrival packs after it) — never removed; the buffer
          // drains to empty, so steady-state is one long per shard
          state.update(OrderedPackState(cum, hold))
          if (hold.nonEmpty)
            // re-arm: fire as soon as the watermark can release the
            // earliest held doc (must arm strictly past the current wm)
            state.setTimeoutTimestamp(
              math.max(wmMs + 1, (hold.head._1 + 1) * 1000L + 1))
          out.iterator
      }
      .toDF()
  }

  /** Streaming keyed dedup (the streaming analog of the reference's
    * keep-one-per-(item,user), `run_als.py:10`): first arrival per key
    * wins. Uses dropDuplicatesWithinWatermark — plain dropDuplicates on
    * keys that exclude the event-time column never evicts its state, so
    * only the within-watermark variant keeps state bounded on an
    * unbounded source.
    */
  def dedupByKey(stream: DataFrame, watermark: String, keys: Seq[String]): DataFrame =
    stream.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Tumbling-window aggregation per event_type. The sum is fixed-point
    * (floor(value·10⁶) summed as DECIMAL(38,0), rescaled): double
    * addition is order-dependent, and micro-batch boundaries make the
    * accumulation order of a streaming sum even less reproducible than
    * a batch shuffle's — this was the one driver-gate hash mismatch of
    * round 1. Exact integer accumulation is deterministic at any
    * parallelism/batching and can't overflow.
    */
  def windowedAgg(stream: DataFrame, watermark: String, windowLen: String): DataFrame =
    stream.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * lit(1e6)).cast(DecimalType(38, 0)))
          .cast("double") / lit(1e6)).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Built-in session windows: gap-merged per-user sessions via
    * `session_window` — Spark's native dynamic-gap state machine, the
    * declarative sibling of `sessionize`'s hand-rolled
    * flatMapGroupsWithState. Window end = last event + gap (so two
    * events exactly `gap` apart land in different sessions).
    */
  def sessionWindowAgg(stream: DataFrame, gap: String): DataFrame =
    stream
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start"),
        unix_micros(col("session_window.end")).as("session_end"),
        col("n_events"))

  final case class SessionEvent(user_id: Long, ts_us: Long, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class Session(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long, sum_value: Double)

  /** Custom keyed state: gap-based sessionization via
    * flatMapGroupsWithState (the mapGroupsWithState family, SURVEY
    * §2.11's "custom state" analog). Emits a session when `gapUs` of
    * user inactivity elapses (processing-time-driven for the test
    * harness; production would use EventTimeTimeout).
    */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events.select(col("user_id"), col("ts_ns"), col("value"))
      .as[(Long, Long, Double)]
      .map { case (u, ns, v) => SessionEvent(u, ns / 1000, v) }
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(sessionFn(gapUs))
      .toDF()
  }

  private def sessionFn(gapUs: Long)(
      userId: Long, events: Iterator[SessionEvent],
      state: GroupState[SessionState]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => e.ts_us)
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var cur = state.getOption
    sorted.foreach { e =>
      cur match {
        case Some(s) if e.ts_us - s.last <= gapUs =>
          cur = Some(SessionState(s.start, e.ts_us, s.n + 1, s.sum + e.value))
        case Some(s) =>
          out += Session(userId, s.start, s.last, s.n, s.sum)
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
        case None =>
          cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
      }
    }
    cur.foreach(state.update)
    out.iterator
  }

  /** Production sessionization: EventTimeTimeout — a session closes when
    * the *watermark* passes its last event + gap, so emission is driven
    * by event time, not by the next event of the same user (which may
    * never come). State per active user only; watermark bounds it.
    */
  /** Event carrying its watermarked TimestampType column — a typed
    * `.map` would drop the event-time attribute and Spark rejects
    * EventTimeTimeout without it, so the timestamp stays a field.
    */
  final case class TimedEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)

  def sessionizeEventTime(events: DataFrame, gap: String, gapUs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ds = events.select(col("user_id"), col("ts"), col("value"))
      .withWatermark("ts", gap)
      .as[TimedEvent]
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        eventTimeSessionFn(gapUs))
      .toDF()
  }

  private def usOf(t: java.sql.Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  private def eventTimeSessionFn(gapUs: Long)(
      userId: Long, events: Iterator[TimedEvent],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(Session(userId, s.start, s.last, s.n, s.sum))
    } else {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var cur = state.getOption
      events.toSeq.map(e => (usOf(e.ts), e.value)).sortBy(_._1).foreach {
        case (tUs, v) =>
          cur match {
            case Some(s) if tUs - s.last <= gapUs =>
              cur = Some(SessionState(s.start, tUs, s.n + 1, s.sum + v))
            case Some(s) =>
              out += Session(userId, s.start, s.last, s.n, s.sum)
              cur = Some(SessionState(tUs, tUs, 1, v))
            case None =>
              cur = Some(SessionState(tUs, tUs, 1, v))
          }
      }
      cur.foreach { s =>
        state.update(s)
        // close when the watermark passes last-event + gap
        state.setTimeoutTimestamp(s.last / 1000 + gapUs / 1000)
      }
      out.iterator
    }
  }

  private val sinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Drive a (bounded) streaming DataFrame to completion through a
    * memory sink and return the materialized result — the local test
    * harness for streaming plans (`processAllAvailable` on a file
    * source = run every pending micro-batch).
    */
  def runToMemory(stream: DataFrame, outputMode: String = "append"): DataFrame = {
    val name = s"graft_stream_${sinkCounter.incrementAndGet()}"
    val q = stream.writeStream
      .format("memory").queryName(name).outputMode(outputMode)
      .start()
    q.processAllAvailable()
    q.stop()
    stream.sparkSession.table(name)
  }
}
