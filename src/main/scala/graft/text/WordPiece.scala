package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece-style tokenizer with a FROZEN, deterministically-derived
  * vocabulary (reference: `models/als.py` has no tokenizer — this is
  * LLM-pipeline surface beyond the reference; greedy longest-match per
  * Wu et al. 2016). Two halves:
  *
  *  - [[trainFrozen]] derives the vocabulary from corpus word
  *    frequencies with NO iterative likelihood training: initial
  *    pieces are the topK highest-weight word PREFIXES (length
  *    2..[[MaxInitLen]], weighted by word frequency), continuation
  *    pieces the topK interior substrings (positions ≥ 2, length
  *    2..[[MaxContLen]]), plus every single character observed in
  *    training — a frequency-frozen stand-in with the exact vocabulary
  *    SHAPE of a trained WordPiece model. Because the ranking is a
  *    total order (weight desc, piece asc), the whole vocabulary — and
  *    therefore every downstream tokenization — replays bit-identically
  *    in DuckDB ([[graft.oracle.WordPieceOracles]]), unlike a
  *    likelihood-trained vocab which would be rows-only forever.
  *  - [[tokenStats]] tokenizes a corpus under a vocabulary via the
  *    codegen greedy matcher ([[graft.functions.WordPieceEncode]]).
  *
  * Scale shape: training aggregates the WORD-FREQUENCY relation, never
  * the corpus (the BPE trick — corpus-size-independent piece counts);
  * the candidate explode is O(distinct words × wordLen × maxPieceLen)
  * rows into two map-side-combinable aggregations, and the final topK
  * is a TakeOrdered, not a global sort. Tokenization pre-aggregates to
  * (doc, word, occurrences) — the dictionary-encoded replay shape that
  * won the BPE A/B ([[Bpe.tokenCountWithMergesDict]]) — so each
  * distinct word per document matches ONCE and the per-word result
  * multiplies by the occurrence count. The vocabulary itself is an
  * artifact (≤ 2·topK + alphabet rows) at any corpus scale.
  */
object WordPiece {

  /** Words are capped at this many codepoints before anything else —
    * bounds the unrolled oracle replay AND the per-word match cost; a
    * crawl's pathological 10k-char "word" costs the same as a real one.
    */
  val WordCap = 16
  val MaxInitLen = 6
  val MaxContLen = 4

  /** Frozen vocabulary. `initial`/`cont` are stored WITHOUT the `##`
    * label (the matcher adds it to output pieces). Sorted for
    * structural equality under Catalyst canonicalization.
    */
  final case class Vocab(initial: Seq[String], cont: Seq[String]) {
    require(initial.nonEmpty && cont.nonEmpty, "vocab must be non-empty")
    // the matcher only probes lengths up to the role's cap — a longer
    // piece would silently never match, so reject it loudly here
    private def cpLen(s: String) = s.codePointCount(0, s.length)
    require(initial.forall(p => p.nonEmpty && cpLen(p) <= MaxInitLen),
      s"initial pieces must be 1..$MaxInitLen codepoints")
    require(cont.forall(p => p.nonEmpty && cpLen(p) <= MaxContLen),
      s"continuation pieces must be 1..$MaxContLen codepoints")
  }

  /** (doc_id, word) occurrences: the proven-parity tokenization
    * fragment (normalize whitespace → split → drop empties), then the
    * codepoint cap.
    */
  private def wordOcc(docs: DataFrame, keyCol: String, textCol: String,
      keyAs: String): DataFrame =
    docs.select(col(keyCol).as(keyAs),
      explode(TextAnalysis.words(TextAnalysis.normalizeText(col(textCol)))).as("w0"))
      .filter(col("w0") =!= "")
      .select(col(keyAs), expr(s"substr(w0, 1, $WordCap)").as("word"))

  /** Candidate pieces of the word-frequency relation: one row per
    * (word, position p, length l) with p=1 lengths 1..MaxInitLen and
    * p≥2 lengths 1..MaxContLen (each clipped to the word end).
    */
  private def candidatePieces(wf: DataFrame): DataFrame =
    wf.select(col("word"), col("freq"),
      explode(sequence(lit(1), length(col("word")))).as("p"))
      .select(col("word"), col("freq"), col("p"),
        explode(sequence(lit(1), least(
          when(col("p") === 1, lit(MaxInitLen)).otherwise(lit(MaxContLen)),
          length(col("word")) - col("p") + 1))).as("l"))
      .select(col("p"), col("l"), expr("substr(word, p, l)").as("piece"),
        col("freq"))

  /** Derive the frozen vocabulary from `docs`. The three collects are
    * artifact-sized (topK + topK + alphabet), never corpus-sized.
    */
  def trainFrozen(docs: DataFrame, textCol: String, topK: Int = 1024): Vocab = {
    require(topK > 0, s"topK must be positive, got $topK")
    val wf = docs
      .select(explode(TextAnalysis.words(TextAnalysis.normalizeText(col(textCol)))).as("w0"))
      .filter(col("w0") =!= "")
      .select(expr(s"substr(w0, 1, $WordCap)").as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val cand = candidatePieces(wf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val singles = cand.filter(col("l") === 1)
        .select("piece").distinct()
        .collect().map(_.getString(0))
      def top(rolePred: Column): Array[String] = cand
        .filter(rolePred && col("l") >= 2)
        .groupBy("piece").agg(sum(col("freq")).as("w"))
        .orderBy(desc("w"), asc("piece")).limit(topK)
        .collect().map(_.getString(0))
      val im = top(col("p") === 1)
      val cm = top(col("p") >= 2)
      Vocab((singles ++ im).distinct.sorted.toSeq,
        (singles ++ cm).distinct.sorted.toSeq)
    } finally { cand.unpersist() }
  }

  /** Labelled greedy pieces of a word column under `v`. */
  def pieces(word: Column, v: Vocab): Column =
    graft.functions.WordPieceEncode.pieces(word, v.initial, v.cont,
      MaxInitLen, MaxContLen)

  /** Per-document tokenization summary under a frozen vocabulary:
    * (doc_id, n_words, n_pieces, piece_hash) where piece_hash is the
    * occurrence-weighted sum of each word's md5-prefix piece-sequence
    * hash — a row the DuckDB oracle replays exactly, so the WHOLE
    * greedy decomposition (not just counts) is gate-checked. Docs with
    * no words report zeros.
    */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String,
      v: Vocab): DataFrame = {
    val perWord = wordOcc(docs, idCol, textCol, "doc_id")
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("occ"))
      .withColumn("pieces", pieces(col("word"), v))
      .withColumn("np", size(col("pieces")).cast("long"))
      .withColumn("whash",
        conv(substring(md5(concat(lit("|"), array_join(col("pieces"), "|"))),
          1, 6), 16, 10).cast("long"))
    val agg = perWord.groupBy("doc_id").agg(
      sum(col("occ")).as("n_words"),
      sum(col("occ") * col("np")).as("n_pieces"),
      sum(col("occ") * col("whash")).as("piece_hash"))
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_words", "n_pieces", "piece_hash"))
  }

  /** Per-group vocabulary-coverage report — the tokenizer-health
    * table a pipeline monitors after a vocab freeze: occurrence-
    * weighted word, `[UNK]`-word and piece counts per `groupCol`
    * (source, language, day). Rising `n_unk_words / n_words` on a
    * source is the drift signal that triggers retraining. The UNK
    * test is on the emitted label, which is unambiguous: words are
    * lowercased before matching, so no genuine piece can ever equal
    * the uppercase `[UNK]` marker. Same dictionary-encoded scale
    * shape as [[tokenStats]] ((group, word) pre-agg, |groups| rows
    * out).
    */
  def coverageReport(docs: DataFrame, groupCol: String, textCol: String,
      v: Vocab): DataFrame = {
    val perWord = wordOcc(docs, groupCol, textCol, groupCol)
      .groupBy(col(groupCol), col("word"))
      .agg(count(lit(1)).as("occ"))
      .withColumn("p", pieces(col("word"), v))
      .withColumn("unk",
        size(col("p")) === 1 && element_at(col("p"), 1) === "[UNK]")
    perWord.groupBy(groupCol).agg(
      sum(col("occ")).as("n_words"),
      sum(when(col("unk"), col("occ")).otherwise(lit(0L))).as("n_unk_words"),
      sum(col("occ") * size(col("p")).cast("long")).as("n_pieces"))
  }

  /** MAP-ONLY twin of [[tokenStats]]: the whole per-document summary
    * as pure column expressions (words → per-word pieces → HOF
    * aggregate folds), zero shuffle — the form a continuous-ingest
    * STREAM can run per micro-batch with no state, and the
    * backpressure-free shape for a 100 TB scan when the downstream
    * consumer doesn't need the (doc, word) pre-aggregation. Encodes
    * every word OCCURRENCE (no dictionary pre-agg), so totals are
    * identical to [[tokenStats]] by commutativity of the sums —
    * A/B-spec-asserted, and the streaming twin shares the batch
    * oracle.
    */
  def tokenStatsMapOnly(docs: DataFrame, idCol: String, textCol: String,
      v: Vocab): DataFrame = {
    // coalesce BEFORE the split: a null text must report zeros like
    // the dictionary-encoded form (where the explode simply drops the
    // row and the left join fills 0) — without it every downstream
    // expression propagates NULL and the A/B contract breaks
    val ws = filter(TextAnalysis.words(TextAnalysis.normalizeText(
      coalesce(col(textCol), lit("")))), w => w =!= "")
    val piecesArr = transform(ws,
      w => pieces(substring(w, 1, WordCap), v))
    val np = aggregate(piecesArr, lit(0L),
      (acc, p) => acc + size(p).cast("long"))
    val ph = aggregate(piecesArr, lit(0L),
      (acc, p) => acc +
        conv(substring(md5(concat(lit("|"), array_join(p, "|"))), 1, 6),
          16, 10).cast("long"))
    docs.select(col(idCol).as("doc_id"),
      size(ws).cast("long").as("n_words"),
      np.as("n_pieces"),
      ph.as("piece_hash"))
  }

  /** Persist a frozen vocabulary as a reloadable artifact (role,
    * piece) — train once, tokenize any later corpus under the loaded
    * vocab. One file: the table is vocabulary-sized by construction.
    */
  def saveVocab(spark: SparkSession, v: Vocab, path: String): Unit = {
    import spark.implicits._
    (v.initial.map(("i", _)) ++ v.cont.map(("c", _)))
      .toDF("role", "piece").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadVocab(spark: SparkSession, path: String): Vocab = {
    val rows = spark.read.parquet(path).collect()
    def of(role: String) = rows.filter(_.getString(0) == role)
      .map(_.getString(1)).distinct.sorted.toSeq
    Vocab(of("i"), of("c"))
  }
}
