package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated bigram word LM for perplexity filtering — one step
  * closer to CCNet's KenLM than the frozen unigram LM (Unigram
  * .perplexity / q197): p(w_i | w_{i−1}) = λ·p_bi + (1−λ)·p_uni with
  * Laplace-smoothed frozen counts, trained once on a held-out slice
  * and applied map-only to any corpus.
  *
  * Determinism design: the model is COUNTS, not probabilities —
  * integer word/bigram counts frozen at train time ride as codegen
  * literal maps (vocab- and top-B-sized artifacts). Scoring computes
  * each term's probability in double from those integers with a fixed
  * operation order (divide, scale by λ, add, ln, ·1e6, floor), the
  * exact chain DuckDB replays (the q153/q159 "ln is portable" rule);
  * per-term floors make the document sum an integer fold with no
  * float-ordering hazard.
  *
  * Scale posture: training is two count aggregations capped to
  * artifact size (top-V words, top-B bigrams — the BPE/WordPiece
  * vocab-artifact class, corpus-size-independent); scoring is one
  * map-only pass, zero shuffle.
  */
object BigramLm {

  /** Frozen model: mapped unigram counts (vocab ∪ "<unk>"), top-B
    * mapped bigram counts keyed "w1 w2", total word occurrences, and
    * the Laplace denominator add-on vSize = |vocab| + 1.
    */
  final case class Model(unigrams: Seq[(String, Long)],
      bigrams: Seq[(String, Long)], total: Long, vSize: Int)

  val Unk = "<unk>"

  private def wordsOf(textCol: Column): Column =
    filter(TextAnalysis.words(TextAnalysis.normalizeText(
      coalesce(textCol, lit("")))), w => w =!= "")

  /** Train frozen counts on `docs`: top-`vocabSize` words by
    * (count desc, word), every other occurrence folds into `<unk>`;
    * bigrams counted over the MAPPED consecutive pairs, capped to the
    * top-`maxBigrams` by (count desc, key).
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int = 1024,
      maxBigrams: Int = 4096): Model = {
    val ws = docs.select(wordsOf(col(textCol)).as("ws"))
    val raw = ws.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val vocab = raw.orderBy(col("c").desc, col("w"))
      .limit(vocabSize).collect().map(r => r.getString(0)).toSet
    // membership as a literal-map null-test: O(1) per token where the
    // previous array_contains scanned the whole vocab per occurrence
    val vocabMap = typedLit(vocab.iterator.map(_ -> 1).toMap)
    def mapped(c: Column) = when(element_at(vocabMap, c).isNotNull, c)
      .otherwise(lit(Unk))
    val mappedWords = ws.select(transform(col("ws"), w => mapped(w)).as("ms"))
    val uni = mappedWords.select(explode(col("ms")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy("w").collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val bi = mappedWords
      .select(explode(transform(sequence(lit(1), size(col("ms")) - 1),
        i => concat(element_at(col("ms"), i), lit(" "),
          element_at(col("ms"), i + 1)))).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("b")).limit(maxBigrams)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    Model(uni, bi, uni.map(_._2).sum, vocab.size + 1)
  }

  /** PMI collocation mining over the frozen counts (the Gensim
    * Phrases / NPMI shape): for every retained bigram with
    * c_ab ≥ `minCount`, pmi_fp = floor(ln(c_ab·N / (c_a·c_b))·1e6) —
    * the association score that surfaces multiword units for
    * tokenizer/vocab induction and templated-boilerplate detection.
    * Pure function of the model (no corpus pass): |bigrams| rows of
    * driver-side arithmetic parallelized as a local relation, ranked
    * (pmi desc, bigram asc). `<unk>`-containing bigrams are excluded
    * (their counts aggregate unrelated words).
    */
  def collocations(spark: org.apache.spark.sql.SparkSession, m: Model,
      minCount: Long = 5L): DataFrame = {
    import spark.implicits._
    val uni = m.unigrams.toMap
    val rows = m.bigrams.iterator.collect {
      case (key, cAb) if cAb >= minCount =>
        val Array(w1, w2) = key.split(" ", 2) match {
          case a if a.length == 2 => a
          case a => Array(a.head, "")
        }
        (w1, w2, cAb)
    }.filter(r => r._1 != Unk && r._2 != Unk && r._2.nonEmpty)
      .map { case (w1, w2, cAb) =>
        val pmi = math.floor(math.log(
          cAb.toDouble * m.total.toDouble /
            (uni(w1).toDouble * uni(w2).toDouble)) * 1e6).toLong
        (w1, w2, cAb, pmi)
      }.toSeq
    rows.toDF("w1", "w2", "n_pair", "pmi_fp")
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("pmi_fp").desc, col("w1"), col("w2"))).cast("long"))
  }

  /** Interpolated Kneser–Ney perplexity bucketing — the smoothing the
    * production LM filters actually ship (KenLM's default; Kneser &
    * Ney 1995, Chen & Goodman 1998): instead of q211's uniform-prior
    * interpolation, mass discounted from seen bigrams (fixed D = 0.75)
    * is redistributed by CONTINUATION probability — how many distinct
    * contexts a word completes — so "francisco" (frequent but only
    * after "san") stops outscoring genuinely versatile words.
    *
    * Everything derives from the SAME frozen [[Model]] counts:
    *   N1+(·w2) / N1+(w1·) = distinct-left/right fan-outs of the
    *   retained bigram table (driver-side, artifact-sized), B = its
    *   size. Guards: +1/+V Laplace add-ons on both the continuation
    *   and the λ numerator keep every term positive when w1 or w2
    *   never appeared in training (the `<unk>`-only-at-score case) —
    *   a documented frozen-artifact approximation, the gate is
    *   engine/oracle self-consistency.
    *
    *   p(w2|w1) = max(c12 − D, 0)/(c1 + V)
    *            + (D·(N1+(w1·) + 1)/(c1 + V)) · ((N1+(·w2) + 1)/(B + V))
    *
    * Per-position floors make the doc sum integer (the q211 chain);
    * scoring is map-only under literal-map artifacts, zero shuffle.
    * Returns the q211 shape: (doc_id, n_scored, nll_fp, avg_nll_fp,
    * ppl_bucket).
    */
  def kneserNeyPerplexity(docs: DataFrame, idCol: String, textCol: String,
      m: Model, headBelowFp: Long, midBelowFp: Long): DataFrame = {
    require(headBelowFp < midBelowFp,
      s"head threshold $headBelowFp must be below middle $midBelowFp")
    val uniMap = typedLit(m.unigrams.toMap)
    val biMap = typedLit(m.bigrams.toMap)
    val vocabMap = typedLit(
      m.unigrams.iterator.map(_._1).filter(_ != Unk).map(_ -> 1).toMap)
    // continuation / left fan-outs of the frozen bigram table —
    // artifact-sized driver folds, shipped as literal maps like counts
    val contMap = typedLit(m.bigrams.iterator
      .map(_._1.split(" ", 2)).collect { case Array(_, w2) => w2 }
      .foldLeft(Map.empty[String, Long]) { (acc, w) =>
        acc.updated(w, acc.getOrElse(w, 0L) + 1L) })
    val leftMap = typedLit(m.bigrams.iterator
      .map(_._1.split(" ", 2)(0))
      .foldLeft(Map.empty[String, Long]) { (acc, w) =>
        acc.updated(w, acc.getOrElse(w, 0L) + 1L) })
    val bDouble = lit(m.bigrams.size.toDouble)
    val vDouble = lit(m.vSize.toDouble)
    val dDisc = lit(0.75)
    def mapped(c: Column) = when(element_at(vocabMap, c).isNotNull, c)
      .otherwise(lit(Unk))
    val ms = transform(wordsOf(col(textCol)), w => mapped(w))
    def cnt(map: Column, key: Column) =
      coalesce(element_at(map, key), lit(0L)).cast("double")
    val terms = transform(sequence(lit(1), greatest(size(ms) - 1, lit(0))),
      i => {
        val w1 = element_at(ms, i)
        val w2 = element_at(ms, i + 1)
        val c12 = cnt(biMap, concat(w1, lit(" "), w2))
        val den = cnt(uniMap, w1) + vDouble
        val p = greatest(c12 - dDisc, lit(0.0)) / den +
          (dDisc * (cnt(leftMap, w1) + lit(1.0)) / den) *
            ((cnt(contMap, w2) + lit(1.0)) / (bDouble + vDouble))
        floor(-log(p) * lit(1000000.0)).cast("long")
      })
    val base = docs.select(col(idCol).as("doc_id"),
      greatest(size(ms) - 1, lit(0)).cast("long").as("n_scored"),
      when(size(ms) >= 2,
        aggregate(terms, lit(0L), (acc, t) => acc + t))
        .otherwise(lit(0L)).as("nll_fp"))
    val avg = when(col("n_scored") > 0,
      floor(col("nll_fp").cast("double") / col("n_scored").cast("double"))
        .cast("long"))
    base.select(col("doc_id"), col("n_scored"), col("nll_fp"),
      avg.as("avg_nll_fp"),
      when(col("n_scored") === 0, lit("unscored"))
        .when(avg < headBelowFp, lit("head"))
        .when(avg < midBelowFp, lit("middle"))
        .otherwise(lit("tail")).as("ppl_bucket"))
  }

  /** Score every document: positions 1..n−1 charge
    * floor(−ln(λ·p_bi + (1−λ)·p_uni)·1e6) under the frozen counts
    * (Laplace: p_uni = (c_w+1)/(N+V), p_bi = (c_{w1w2}+1)/(c_{w1}+V));
    * bucket head/middle/tail on the per-position average, `unscored`
    * for docs with < 2 words. λ is fixed at 0.5.
    *
    * Returns (doc_id, n_scored, nll_fp, avg_nll_fp, ppl_bucket).
    */
  def perplexity(docs: DataFrame, idCol: String, textCol: String,
      m: Model, headBelowFp: Long, midBelowFp: Long): DataFrame = {
    require(headBelowFp < midBelowFp,
      s"head threshold $headBelowFp must be below middle $midBelowFp")
    val uniMap = typedLit(m.unigrams.toMap)
    val biMap = typedLit(m.bigrams.toMap)
    // O(1) membership via literal-map null-test (same map family as
    // uniMap/biMap below) instead of an O(|vocab|) array scan per token
    val vocabMap = typedLit(
      m.unigrams.iterator.map(_._1).filter(_ != Unk).map(_ -> 1).toMap)
    val nDouble = lit(m.total.toDouble)
    val vDouble = lit(m.vSize.toDouble)
    def mapped(c: Column) = when(element_at(vocabMap, c).isNotNull, c)
      .otherwise(lit(Unk))
    val ms = transform(wordsOf(col(textCol)), w => mapped(w))
    def cnt(map: Column, key: Column) =
      coalesce(element_at(map, key), lit(0L)).cast("double")
    val terms = transform(sequence(lit(1), greatest(size(ms) - 1, lit(0))),
      i => {
        val w1 = element_at(ms, i)
        val w2 = element_at(ms, i + 1)
        val pU = (cnt(uniMap, w2) + lit(1.0)) / (nDouble + vDouble)
        val pB = (cnt(biMap, concat(w1, lit(" "), w2)) + lit(1.0)) /
          (cnt(uniMap, w1) + vDouble)
        floor(-log(lit(0.5) * pB + lit(0.5) * pU) * lit(1000000.0))
          .cast("long")
      })
    val base = docs.select(col(idCol).as("doc_id"),
      greatest(size(ms) - 1, lit(0)).cast("long").as("n_scored"),
      when(size(ms) >= 2,
        aggregate(terms, lit(0L), (acc, t) => acc + t))
        .otherwise(lit(0L)).as("nll_fp"))
    val avg = when(col("n_scored") > 0,
      floor(col("nll_fp").cast("double") / col("n_scored").cast("double"))
        .cast("long"))
    base.select(col("doc_id"), col("n_scored"), col("nll_fp"),
      avg.as("avg_nll_fp"),
      when(col("n_scored") === 0, lit("unscored"))
        .when(avg < headBelowFp, lit("head"))
        .when(avg < midBelowFp, lit("middle"))
        .otherwise(lit("tail")).as("ppl_bucket"))
  }
}
