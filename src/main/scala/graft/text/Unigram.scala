package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018, the SentencePiece "unigram" model)
  * with a FROZEN, deterministically-derived scored vocabulary — the
  * third classic subword family beside [[Bpe]] (merge rules) and
  * [[WordPiece]] (greedy longest-match): segmentation is the EXACT
  * Viterbi optimum under per-piece log-probability scores.
  *
  * Two deliberate departures from the reference training recipe, both
  * for engine-replayability (the [[WordPiece.trainFrozen]] precedent):
  *
  *  - NO iterative EM/pruning: piece probabilities come straight from
  *    corpus substring frequencies (one M-step from raw counts). The
  *    vocabulary is the topK multi-character substrings by
  *    (weight desc, piece asc) — a total order — plus every observed
  *    single character (coverage guarantee), so the vocab replays
  *    bit-identically in SQL. An EM-refined float trajectory would be
  *    rows-only forever.
  *  - INTEGER scores: `score_fp = floor(ln(w/W)·10⁶)` fixed-points the
  *    log-probs once at train time, so the Viterbi DP compares exact
  *    longs and the chosen segmentation is engine-exact (the
  *    [[graft.pipeline.LinkAnalysis.pageRankFixed]] discipline applied
  *    to tokenization; the `ln` itself is the one scalar double op,
  *    the q153 BM25 idf precedent).
  *
  * Scale shape: training aggregates the WORD-FREQUENCY relation (the
  * BPE trick — corpus-size-independent), candidate explode is
  * O(distinct words × wordLen × maxPieceLen); the vocabulary is an
  * artifact (topK + alphabet rows). Tokenization pre-aggregates to
  * (doc, word, occurrences) and runs the codegen Viterbi kernel once
  * per distinct word ([[graft.functions.UnigramEncode]]).
  */
object Unigram {

  /** Same word cap as [[WordPiece.WordCap]] — bounds the unrolled
    * oracle replay and the per-word DP cost.
    */
  val WordCap: Int = WordPiece.WordCap
  val MaxPieceLen = 6

  /** Frozen scored vocabulary: (piece, score_fp), score_fp =
    * floor(ln(w/W)·10⁶) < 0. Sorted by piece for structural equality
    * under Catalyst canonicalization.
    */
  final case class Vocab(pieces: Seq[(String, Long)]) {
    require(pieces.nonEmpty, "vocab must be non-empty")
    private def cpLen(s: String) = s.codePointCount(0, s.length)
    require(pieces.forall { case (p, _) => p.nonEmpty && cpLen(p) <= MaxPieceLen },
      s"pieces must be 1..$MaxPieceLen codepoints")
    // ln(w/W) ≤ 0 with equality only for a single-piece vocabulary
    require(pieces.forall(_._2 <= 0L), "scores must be non-positive log-probs")
  }

  private def wordOcc(docs: DataFrame, keyCol: String, textCol: String,
      keyAs: String): DataFrame =
    docs.select(col(keyCol).as(keyAs),
      explode(TextAnalysis.words(TextAnalysis.normalizeText(col(textCol)))).as("w0"))
      .filter(col("w0") =!= "")
      .select(col(keyAs), expr(s"substr(w0, 1, $WordCap)").as("word"))

  /** Derive the frozen scored vocabulary from `docs`: all substrings
    * of length 1..[[MaxPieceLen]] of the capped word-frequency
    * relation, weighted by word frequency; selection = every single
    * character ∪ topK multi-char pieces by (weight desc, piece asc);
    * scores from the selected pieces' weight share. The collect is
    * artifact-sized (topK + alphabet).
    */
  def trainFrozen(docs: DataFrame, textCol: String,
      topK: Int = 1024): Vocab = {
    require(topK > 0, s"topK must be positive, got $topK")
    val wf = docs
      .select(explode(TextAnalysis.words(TextAnalysis.normalizeText(col(textCol)))).as("w0"))
      .filter(col("w0") =!= "")
      .select(expr(s"substr(w0, 1, $WordCap)").as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val cand = wf
      .select(col("word"), col("freq"),
        explode(sequence(lit(1), length(col("word")))).as("p"))
      .select(col("word"), col("freq"), col("p"),
        explode(sequence(lit(1),
          least(lit(MaxPieceLen), length(col("word")) - col("p") + 1))).as("l"))
      .select(expr("substr(word, p, l)").as("piece"), col("freq"))
      .groupBy("piece").agg(sum(col("freq")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val singles = cand.filter(length(col("piece")) === 1)
        .select("piece", "w").collect()
      val multi = cand.filter(length(col("piece")) >= 2)
        .orderBy(desc("w"), asc("piece")).limit(topK)
        .select("piece", "w").collect()
      val sel = (singles ++ multi)
        .map(r => r.getString(0) -> r.getLong(1)).distinct
      val total = sel.map(_._2).sum
      require(total > 0, "training corpus has no tokens")
      // java.lang.Math.log — the same libm entry Catalyst's log() and
      // DuckDB's ln() resolved to in the q153 gate
      val scored = sel.map { case (p, w) =>
        p -> math.floor(math.log(w.toDouble / total.toDouble) * 1e6).toLong
      }
      Vocab(scored.sortBy(_._1).toSeq)
    } finally { cand.unpersist() }
  }

  /** Viterbi-optimal pieces of a word column under `v`. */
  def pieces(word: Column, v: Vocab): Column =
    graft.functions.UnigramEncode.pieces(word, v.pieces, MaxPieceLen)

  /** Per-document tokenization summary under a frozen vocabulary —
    * the [[WordPiece.tokenStats]] output shape (doc_id, n_words,
    * n_pieces, piece_hash), so the gate checks the WHOLE Viterbi
    * decomposition per word, occurrence-weighted. Docs with no words
    * report zeros.
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

  /** MAP-ONLY twin of [[tokenStats]]: the whole per-document summary
    * as pure column expressions (zero shuffle) — the stateless
    * per-micro-batch form for continuous ingest, and the
    * backpressure-free shape for a straight 100 TB scan. Encodes every
    * word OCCURRENCE (no dictionary pre-agg); totals equal
    * [[tokenStats]] by commutativity (A/B-spec-asserted), so the
    * streaming twin shares the batch oracle
    * (the [[WordPiece.tokenStatsMapOnly]] pattern verbatim).
    */
  def tokenStatsMapOnly(docs: DataFrame, idCol: String, textCol: String,
      v: Vocab): DataFrame = {
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

  /** CCNet-style LM perplexity bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting high quality monolingual datasets from web crawl
    * data"): score every document by its average per-piece negative
    * log-likelihood under the FROZEN unigram LM `v` (the in-repo
    * frozen-LM analog of CCNet's KenLM), then bucket head / middle /
    * tail by fixed thresholds — the classic quality split where
    * "head" (low perplexity = fluent under the LM) is kept, "tail"
    * dropped or down-weighted.
    *
    * All integer/deterministic, so it hash-gates (q197): each word's
    * Viterbi decomposition total equals the sum of its chosen pieces'
    * `score_fp` (by DP construction), `nll_fp` = −Σ over occurrences
    * (a positive long; [UNK] words charge `-unkScoreFp`, the OOV
    * penalty — a frozen constant, CCNet's OOV handling analog), and
    * `avg_nll_fp = floor(nll_fp / n_pieces)` in DOUBLE (exact-input:
    * both ≪ 2⁵³ — the knnDensity division rule). Docs with no words
    * report 0/0/NULL and bucket `unscored`.
    *
    * Map-only (the [[tokenStatsMapOnly]] shape): one scan, zero
    * shuffle at any corpus size; the vocabulary rides as a codegen
    * literal map (topK+alphabet-sized — artifact-class).
    *
    * @return (doc_id, n_pieces, nll_fp, avg_nll_fp, ppl_bucket)
    */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
      v: Vocab, unkScoreFp: Long = -20000000L,
      headBelowFp: Long, midBelowFp: Long): DataFrame = {
    require(unkScoreFp < 0, s"unkScoreFp must be negative, got $unkScoreFp")
    require(headBelowFp < midBelowFp,
      s"head threshold $headBelowFp must be below middle $midBelowFp")
    val scoreMap = typedLit(v.pieces.toMap)
    val ws = filter(TextAnalysis.words(TextAnalysis.normalizeText(
      coalesce(col(textCol), lit("")))), w => w =!= "")
    val piecesArr = transform(ws,
      w => pieces(substring(w, 1, WordCap), v))
    val np = aggregate(piecesArr, lit(0L),
      (acc, p) => acc + size(p).cast("long"))
    val nll = aggregate(piecesArr, lit(0L),
      (acc, p) => acc - aggregate(p, lit(0L),
        (a, piece) => a + coalesce(element_at(scoreMap, piece),
          lit(unkScoreFp))))
    val base = docs.select(col(idCol).as("doc_id"),
      np.as("n_pieces"), nll.as("nll_fp"))
    val avg = when(col("n_pieces") > 0,
      floor(col("nll_fp").cast("double") / col("n_pieces").cast("double"))
        .cast("long"))
    base.select(col("doc_id"), col("n_pieces"), col("nll_fp"),
      avg.as("avg_nll_fp"),
      when(col("n_pieces") === 0, lit("unscored"))
        .when(avg < headBelowFp, lit("head"))
        .when(avg < midBelowFp, lit("middle"))
        .otherwise(lit("tail")).as("ppl_bucket"))
  }

  /** Persist the frozen scored vocabulary as a reloadable artifact
    * (piece, score_fp) — train once, tokenize any later corpus.
    */
  def saveVocab(spark: SparkSession, v: Vocab, path: String): Unit = {
    import spark.implicits._
    v.pieces.toDF("piece", "score_fp").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadVocab(spark: SparkSession, path: String): Vocab =
    Vocab(spark.read.parquet(path).collect()
      .map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1).toSeq)
}
