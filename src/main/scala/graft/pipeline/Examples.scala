package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Training-example generation: the step after curation that turns a
  * clean corpus into model-ready examples. First member: BERT-style
  * masked-language-model corruption (Devlin et al. 2018 §3.1 — the
  * 15% / 80-10-10 rule), made FULLY deterministic so the examples are
  * reproducible across runs, engines and partitionings.
  *
  * Determinism design: every per-position decision is a pure function
  * of (tag, doc_id, pos) through Spark's `xxhash64` over a STRING key
  * — no RNG state, no partition-order dependence. The three decision
  * streams (mask?, which corruption, which replacement token) use
  * distinct tag prefixes of one hash family rather than bit-slices of
  * one hash, so each is uniform and independently replayable; the
  * DuckDB oracle replays the exact same hashes (DuckDbXxHash), making
  * the whole example set hash-gateable.
  *
  * Scale posture: tokenize + hash decisions are map-only; the only
  * shuffles are the bounded vocabulary build (distinct tokens —
  * tokenizer-artifact-sized by definition, same class as the BPE/
  * WordPiece vocab artifacts) and none on the corpus itself. The
  * replacement-token lookup joins the ~1.5% random-corruption rows
  * against the broadcast vocab.
  */
object Examples {

  /** Masked positions of the corpus under the MLM corruption rule:
    * (doc_id, pos, orig_token, input_token, action) for every selected
    * position — `action` ∈ mask (→ `maskToken`), random (→ a hash-
    * chosen vocabulary token), keep (original survives but is still a
    * prediction target). Non-selected positions pass through the model
    * input unchanged and are omitted here.
    *
    * `maskRateFp` is the selection threshold in 1e-6 units (150000 =
    * the canonical 15%); the 80/10/10 split among selected positions is
    * fixed per the paper.
    */
  def mlmMask(docs: DataFrame, idCol: String, textCol: String,
      seedTag: String = "mlm", maskRateFp: Long = 150000L,
      maskToken: String = "[MASK]"): DataFrame = {
    // bounded artifact: the corpus vocabulary with stable dense ids
    // (sorted order), built once; the count pins the modulus
    val vocab = mlmVocab(docs, idCol, textCol)
    mlmMaskWithVocab(docs, idCol, textCol, vocab, vocab.count(),
      seedTag, maskRateFp, maskToken)
  }

  /** The replacement vocabulary [[mlmMask]] trains: sorted distinct
    * corpus tokens with dense ids (vtok, vidx) — tokenizer-artifact
    * sized, reusable as a frozen artifact (the streaming twin's input).
    */
  def mlmVocab(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.words(TextAnalysis.normalizeText(
        coalesce(col(textCol), lit(""))))).as("vtok"))
      .filter(length(col("vtok")) > 0).distinct()
      .withColumn("vidx",
        row_number().over(Window.orderBy(col("vtok"))).cast("long") - 1L)

  /** [[mlmMask]] under a FROZEN vocabulary artifact — pure per-row
    * column expressions plus one broadcast join, so it runs unchanged
    * on a streaming DataFrame (stateless per micro-batch).
    * `vocabSize` pins the replacement modulus (pass the artifact's
    * count; a parameter because `count()` is illegal on a stream).
    */
  def mlmMaskWithVocab(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, vocabSize: Long, seedTag: String = "mlm",
      maskRateFp: Long = 150000L, maskToken: String = "[MASK]"): DataFrame = {
    require(maskRateFp >= 0 && maskRateFp <= 1000000L,
      s"maskRateFp is 1e-6 units in [0, 1000000], got $maskRateFp")
    require(vocabSize > 0, s"need vocabSize > 0, got $vocabSize")
    val toks = docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.words(TextAnalysis.normalizeText(
          coalesce(col(textCol), lit(""))))).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))

    def decision(tag: String) = xxhash64(
      concat(lit(s"${seedTag}_$tag:"), col("doc_id"), lit(":"), col("pos")))

    val selected = toks
      .filter(pmod(decision("m"), lit(1000000L)) < maskRateFp)
      .withColumn("act", pmod(decision("a"), lit(10L)))
      .withColumn("ridx", pmod(decision("r"), lit(vocabSize)))
    // a random-corruption row whose hash index misses the artifact can
    // only mean the caller's vocabSize disagrees with the artifact's
    // real count (the modulus at line `ridx` above) — fail loudly at
    // execution time instead of silently emitting NULL input_token;
    // raise_error only evaluates when the lookup actually missed, so
    // the consistent case is untouched (and it works on streams, where
    // a driver-side count assert is illegal)
    val replacement = coalesce(col("vtok"), raise_error(concat(
      lit("mlmMaskWithVocab: replacement index "), col("ridx"),
      lit(s" missing from the vocab artifact — vocabSize ($vocabSize) " +
        "must equal the artifact's row count"))))
    selected
      .join(broadcast(vocab), selected("ridx") === vocab("vidx"), "left_outer")
      .select(col("doc_id"), col("pos"), col("tok").as("orig_token"),
        when(col("act") < 8, lit(maskToken))
          .when(col("act") === 8, replacement)
          .otherwise(col("tok")).as("input_token"),
        when(col("act") < 8, lit("mask"))
          .when(col("act") === 8, lit("random"))
          .otherwise(lit("keep")).as("action"))
  }

  /** Sliding token-window chunking — the context-window preparation
    * step for RAG indexes and long-document pretraining: split each
    * document into `chunkTokens`-token windows starting every
    * `stride` tokens (stride < chunkTokens ⇒ overlapping windows, the
    * standard retrieval-chunk shape). Pure per-row expression: the
    * token array materializes once per doc and every window is a
    * slice — map-only, zero shuffle, stateless on a stream.
    *
    * Chunk grid: starts 0, stride, 2·stride, … while start < n_words;
    * the last window may be short (kept — its tokens appear nowhere
    * else when stride == chunkTokens). Docs with no words emit no
    * rows. Returns (doc_id, chunk_id, begin_tok, n_tok, chunk_text)
    * with chunk_id = start/stride.
    */
  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(stride >= 1 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens], got $stride")
    val ws = filter(TextAnalysis.words(TextAnalysis.normalizeText(
      coalesce(col(textCol), lit("")))), w => length(w) > 0)
    val n = size(ws)
    val starts = when(n > 0,
      sequence(lit(0), n - 1, lit(stride))).otherwise(
      array().cast("array<int>"))
    docs.select(col(idCol).as("doc_id"), ws.as("__ws"), n.as("__n"),
        explode(starts).as("__start"))
      .select(col("doc_id"),
        (col("__start") / lit(stride)).cast("long").as("chunk_id"),
        col("__start").cast("long").as("begin_tok"),
        least(lit(chunkTokens), col("__n") - col("__start"))
          .cast("long").as("n_tok"),
        array_join(slice(col("__ws"), col("__start") + 1, lit(chunkTokens)),
          " ").as("chunk_text"))
  }

  /** Next-segment-prediction pair generation (BERT §3.1's NSP task,
    * segment-windowed): for every pair of ADJACENT non-overlapping
    * `segTokens`-token segments of a document, a deterministic coin
    * keeps the true next segment (`is_next = true`) or swaps in a
    * corpus-random segment (`is_next = false`) — 50/50, the paper's
    * rate. Fully deterministic: every decision is xxhash64 of a
    * (tag, doc_id, pos) string key (the [[mlmMask]] discipline).
    *
    * The negative pick is the DETERMINISTIC-RANDOM-ROW pattern that
    * scales: a dense global index over all segments would be one
    * single-partition window (forbidden shape); instead segments
    * hash into `negBuckets` groups with PER-BUCKET dense ranks (a
    * bucket-partitioned window), bucket sizes broadcast as a
    * |negBuckets|-row relation, and the pick is (bucket = h₁ mod K,
    * rank = h₂ mod size(bucket)). The picked segment may occasionally
    * be the true next or from the same document — BERT's own sampler
    * has the same property and the label stays honest either way.
    *
    * Returns (doc_id, pos, seg_a, seg_b, is_next).
    */
  def nspPairs(docs: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 12, seedTag: String = "nsp",
      negBuckets: Int = 16): DataFrame = {
    require(segTokens >= 1, s"segTokens must be >= 1, got $segTokens")
    require(negBuckets >= 1, s"negBuckets must be >= 1, got $negBuckets")
    val segs = chunkDocuments(docs, idCol, textCol, segTokens, segTokens)
      .select(col("doc_id"), col("chunk_id").as("seg_no"),
        col("chunk_text").as("seg"))
    def h(tag: String, d: Column, p: Column) = xxhash64(
      concat(lit(s"${seedTag}_$tag:"), d, lit(":"), p))
    // per-bucket dense ranks over the segment table — the bounded
    // stand-in for a global dense index
    val bucketed = segs.withColumn("nbucket",
        pmod(h("t", col("doc_id"), col("seg_no")), lit(negBuckets.toLong)))
      .withColumn("nrank", row_number().over(
        Window.partitionBy("nbucket").orderBy("doc_id", "seg_no"))
        .cast("long") - 1L)
    val sizes = bucketed.groupBy("nbucket")
      .agg(count(lit(1)).as("nbsize"))
    val pairs = segs.as("a").join(segs.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.seg_no") === col("a.seg_no") + 1)
      .select(col("a.doc_id").as("doc_id"), col("a.seg_no").as("pos"),
        col("a.seg").as("seg_a"), col("b.seg").as("seg_next"))
      .withColumn("is_next",
        pmod(h("c", col("doc_id"), col("pos")), lit(2L)) === 1)
      .withColumn("nbucket",
        pmod(h("b", col("doc_id"), col("pos")), lit(negBuckets.toLong)))
    val withPick = pairs.join(broadcast(sizes), Seq("nbucket"))
      .withColumn("nrank",
        pmod(h("r", col("doc_id"), col("pos")), col("nbsize")))
    withPick.join(
        bucketed.select(col("nbucket"), col("nrank"), col("seg").as("seg_neg")),
        Seq("nbucket", "nrank"))
      .select(col("doc_id"), col("pos"), col("seg_a"),
        when(col("is_next"), col("seg_next")).otherwise(col("seg_neg"))
          .as("seg_b"),
        col("is_next"))
  }

  /** Per-epoch deterministic reshuffle — [[shardAssign]]'s order
    * machinery with the EPOCH salted into both hashes: multi-epoch
    * training wants a DIFFERENT global order every pass (repeating one
    * order correlates batch composition across epochs), but each
    * epoch's order must still be a pure function of (seedTag, epoch,
    * doc_id) so any worker, cluster, or engine reproduces it. Returns
    * `(epoch, doc_id, shard, ord)` for epochs `0..nEpochs-1` — every
    * epoch holds the full document multiset, shuffled independently.
    *
    * Scale posture: the epoch fan-out is a generator explode (no self
    * join); shard/order keys are map-only; the one shuffle is the
    * per-(epoch, shard) row_number window — nEpochs·nShards
    * executor-sized sorts, exactly the work the reshuffles must do.
    * At 100 TB you'd materialize one epoch at a time by filtering the
    * generator column — the plan is identical, so the gate covers it.
    */
  def epochShuffle(docs: DataFrame, idCol: String, nEpochs: Int,
      nShards: Int, seedTag: String = "epoch"): DataFrame = {
    require(nEpochs > 0, s"need nEpochs > 0, got $nEpochs")
    require(nShards > 0, s"need nShards > 0, got $nShards")
    def h(tag: String) = xxhash64(concat(lit(s"${seedTag}_$tag:"),
      col("epoch"), lit(":"), col("doc_id")))
    docs.select(col(idCol).as("doc_id"))
      .withColumn("epoch", explode(sequence(lit(0L), lit(nEpochs - 1L))))
      .withColumn("shard", pmod(h("s"), lit(nShards.toLong)))
      .withColumn("ord", row_number().over(
          Window.partitionBy("epoch", "shard")
            .orderBy(h("o"), col("doc_id")))
        .cast("long") - 1L)
      .select("epoch", "doc_id", "shard", "ord")
  }

  /** Deterministic training-export sharding — the reproducible "global
    * shuffle" that precedes writing a training dataset: every document
    * gets a hash-assigned shard and a hash-ordered position within it,
    * both pure functions of (seedTag, doc_id), so the exact same
    * example order reproduces on any cluster, any partitioning, any
    * engine. Ties on the order hash break on doc_id.
    *
    * Scale posture: shard + order keys are map-only; the only shuffle
    * is the per-shard row_number window — one exchange on `shard`
    * (nShards ≈ thousands at 100 TB, each shard sorts ~n/nShards rows,
    * which is exactly the work a training-data shuffle must do).
    *
    * Returns (doc_id, shard, ord, n_tokens).
    */
  def shardAssign(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, seedTag: String = "shard"): DataFrame = {
    require(nShards > 0, s"need nShards > 0, got $nShards")
    def h(tag: String) = xxhash64(
      concat(lit(s"${seedTag}_$tag:"), col("doc_id")))
    docs.select(col(idCol).as("doc_id"),
        size(filter(TextAnalysis.words(TextAnalysis.normalizeText(
            coalesce(col(textCol), lit("")))), t => length(t) > 0))
          .cast("long").as("n_tokens"))
      .withColumn("shard", pmod(h("s"), lit(nShards.toLong)))
      .withColumn("ord", row_number().over(
          Window.partitionBy("shard").orderBy(h("o"), col("doc_id")))
        .cast("long") - 1L)
      .select("doc_id", "shard", "ord", "n_tokens")
  }

  /** Per-shard export manifest: (shard, n_docs, n_tokens, checksum) —
    * the record that lets a 100-TB export be validated without
    * re-reading it. The checksum is an ORDER-INDEPENDENT fold
    * (bit_xor) of per-document content hashes xxhash64(doc_id ":"
    * md5(normalized text)), so two manifests agree iff the shards hold
    * the same document set with the same contents. One map-only pass +
    * one nShards-row aggregation.
    */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int, seedTag: String = "shard"): DataFrame = {
    val norm = TextAnalysis.normalizeText(coalesce(col(textCol), lit("")))
    val assigned = docs.select(col(idCol).as("doc_id"),
        size(filter(TextAnalysis.words(norm), t => length(t) > 0))
          .cast("long").as("n_tokens"),
        xxhash64(concat(col(idCol), lit(":"), md5(norm))).as("doc_hash"))
      .withColumn("shard", pmod(xxhash64(
        concat(lit(s"${seedTag}_s:"), col("doc_id"))), lit(nShards.toLong)))
    assigned.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      bit_xor(col("doc_hash")).as("checksum"))
  }

  /** Manifest diff — the incremental-export validation: compare two
    * [[shardManifest]] frames and report per-shard status. `unchanged`
    * = identical (n_docs, n_tokens, checksum); `changed` = present in
    * both but any field moved (the xor checksum catches any content
    * drift, including swaps that keep counts equal); `added`/`removed`
    * = shard only in `current`/`base`. One full-outer join on the
    * nShards-row manifests — validating a re-export costs nothing.
    */
  def manifestDiff(base: DataFrame, current: DataFrame): DataFrame = {
    def pfx(df: DataFrame, p: String) = df.select(col("shard"),
      col("n_docs").as(s"${p}_docs"), col("n_tokens").as(s"${p}_tokens"),
      col("checksum").as(s"${p}_checksum"))
    pfx(base, "base").join(pfx(current, "cur"), Seq("shard"), "full_outer")
      .select(col("shard"),
        when(col("base_docs").isNull, lit("added"))
          .when(col("cur_docs").isNull, lit("removed"))
          .when(col("base_docs") === col("cur_docs") &&
            col("base_tokens") === col("cur_tokens") &&
            col("base_checksum") === col("cur_checksum"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        (coalesce(col("cur_docs"), lit(0L)) -
          coalesce(col("base_docs"), lit(0L))).as("delta_docs"),
        (coalesce(col("cur_tokens"), lit(0L)) -
          coalesce(col("base_tokens"), lit(0L))).as("delta_tokens"))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): replace
    * contiguous token spans with numbered sentinel tokens; the target
    * is the sentinel-delimited sequence of removed spans. Fully
    * deterministic like [[mlmMask]]: a position STARTS a span when its
    * hash clears `startRateFp` (1e-6 units), the span length is
    * 2 + hash mod 3 ∈ {2,3,4} (mean 3 — the paper's default), and
    * overlapping/adjacent spans merge into one sentinel (interval
    * union via gaps-and-islands on the covered-position set, the
    * `coveredPositions` shape). With the defaults ~5% of positions
    * start a span, so ~15% of tokens corrupt.
    *
    * Returns one row per document: (doc_id, n_spans, input_text,
    * target_text) — `input_text` is the normalized text with each span
    * collapsed to `<extra_id_k>` (k in span order), `target_text` is
    * `<extra_id_k> removed tokens …` in the same order. Docs with no
    * selected span (or no tokens) pass through with n_spans = 0 and an
    * empty target.
    *
    * Scale posture: hash decisions are map-only; everything else is
    * per-document work under a doc_id shuffle (window + groupBy on the
    * same key — one exchange, AQE-coalesced), with per-doc arrays
    * bounded by document length (the reassembleTokens precedent).
    */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
      seedTag: String = "t5", startRateFp: Long = 50000L): DataFrame = {
    require(startRateFp >= 0 && startRateFp <= 1000000L,
      s"startRateFp is 1e-6 units in [0, 1000000], got $startRateFp")
    val toks = docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.words(TextAnalysis.normalizeText(
          coalesce(col(textCol), lit(""))))).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))

    def decision(tag: String) = xxhash64(
      concat(lit(s"${seedTag}_$tag:"), col("doc_id"), lit(":"), col("pos")))

    val byDoc = Window.partitionBy("doc_id")
    val withMax = toks.withColumn("maxPos", max(col("pos")).over(byDoc))
    val spans = withMax
      .filter(pmod(decision("s"), lit(1000000L)) < startRateFp)
      .select(col("doc_id"), col("pos").as("s"),
        least(col("pos") + 1L + pmod(decision("l"), lit(3L)), col("maxPos"))
          .as("e"))
    // interval union: distinct covered positions → maximal runs
    val covered = spans
      .select(col("doc_id"), explode(sequence(col("s"), col("e"))).as("pos"))
      .distinct()
    val islands = covered.withColumn("isl",
      col("pos") - row_number().over(byDoc.orderBy("pos")))
    val merged = islands.groupBy("doc_id", "isl")
      .agg(min("pos").as("s"), max("pos").as("e"))
      .withColumn("k",
        row_number().over(byDoc.orderBy("s")).cast("long") - 1L)
    val sentinel = concat(lit("<extra_id_"), col("k"), lit(">"))

    // target: per span, sentinel + removed tokens in position order
    val spanToks = islands.join(toks, Seq("doc_id", "pos"))
    val targets = spanToks
      .join(merged.select(col("doc_id"), col("isl"), col("k")),
        Seq("doc_id", "isl"))
      .groupBy("doc_id", "k")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        _.getField("tok")), " ").as("piece"))
      .groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("k"),
          concat(lit("<extra_id_"), col("k"), lit("> "), col("piece"))
            .as("p")))),
        _.getField("p")), " ").as("target_text"),
        count(lit(1)).as("n_spans"))

    // input: uncovered tokens + one sentinel at each span start
    val pieces = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
      .select(col("doc_id"), col("pos"), col("tok").as("piece"))
      .unionAll(merged.select(col("doc_id"), col("s").as("pos"),
        sentinel.as("piece")))
    val inputs = pieces.groupBy("doc_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("piece")))),
        _.getField("piece")), " ").as("input_text"))

    docs.select(col(idCol).as("doc_id")).distinct()
      .join(inputs, Seq("doc_id"), "left_outer")
      .join(targets, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("input_text"), lit("")).as("input_text"),
        coalesce(col("target_text"), lit("")).as("target_text"))
  }
}
