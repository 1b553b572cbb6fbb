package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-n-gram language identification (Cavnar & Trenkle 1994,
  * "N-gram-based text categorization" — the construction behind
  * langid.py/fastText-class detectors, in its Naive-Bayes scoring
  * form): train per-language character-TRIGRAM profiles from a
  * labeled corpus, freeze them as an artifact, and classify any later
  * document by the argmax of per-language integer log-likelihood
  * sums. The production upgrade of [[TextAnalysis.langId]]'s
  * marker-word heuristic (whose own doc calls for exactly this).
  *
  * Determinism contract: profile derivation is exact counting (top-N
  * per language by count desc / gram asc) and scores are
  * `floor(ln(c/total)·10⁶)` — the [[Unigram]] frozen-LM discipline
  * (ln proven engine-portable by the q153/q159 gates); scoring sums
  * integers (commutative, order-free) with a frozen OOV penalty per
  * unmatched trigram, and ties break by language name ascending. The
  * whole train → classify chain hash-gates (q199).
  *
  * Scale shape: training is one (lang, gram) count + a per-language
  * WindowGroupLimit top-N — the gram stream is O(corpus chars) but
  * the aggregate is map-side combinable over a bounded key domain;
  * the artifact is ≤ |langs|·topN rows (driver/broadcast class).
  * Classification is MAP-ONLY: profiles ride as codegen literal maps
  * and each document folds its own trigrams — zero shuffle at any
  * corpus size, the [[Unigram.tokenStatsMapOnly]] posture.
  */
object LangId {

  /** Frozen per-language trigram scores, languages sorted ascending
    * (the tie-break order). Build with [[trainProfiles]] or reload
    * from any (lang, gram, score_fp) relation.
    */
  final case class Profiles(langs: Seq[(String, Map[String, Long])]) {
    require(langs.nonEmpty, "need at least one language profile")
    require(langs.map(_._1) == langs.map(_._1).sorted,
      "languages must be sorted ascending (the tie-break order)")
  }

  /** Train frozen profiles from a labeled corpus: per language the
    * top-`topN` trigrams by (count desc, gram asc), scored
    * `floor(ln(count / total_lang_grams)·10⁶)` where the total counts
    * EVERY trigram occurrence of the language (true LM mass, so rare
    * profile grams score properly low).
    */
  def trainProfiles(docs: DataFrame, textCol: String, langCol: String,
      topN: Int = 256): Profiles = {
    import org.apache.spark.sql.expressions.Window
    require(topN >= 1, s"topN must be >= 1, got $topN")
    val g = docs.select(col(langCol).as("lang"),
      explode(trigramsExact(col(textCol))).as("g"))
    val counts = g.groupBy("lang", "g").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = counts.groupBy("lang").agg(sum(col("c")).as("tc"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("c").desc, col("g").asc)
      val prof = counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= topN)
        .join(totals, Seq("lang"))
        .select(col("lang"), col("g"),
          floor(log(col("c").cast("double") / col("tc").cast("double"))
            * 1e6).cast("long").as("score_fp"))
        .collect()
      val byLang = prof.groupBy(_.getString(0)).map { case (l, rows) =>
        l -> rows.map(r => r.getString(1) -> r.getLong(2)).toMap
      }
      Profiles(byLang.toSeq.sortBy(_._1))
    } finally counts.unpersist()
  }

  /** The exact trigram extraction shared by train and classify — a
    * substring per position (codegen'd; positions are characters on
    * both engines, the q159 substr-parity precedent).
    */
  private[text] def trigramsExact(text: Column): Column = {
    val t = TextAnalysis.normalizeText(coalesce(text, lit("")))
    when(length(t) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(t) - 2),
        i => t.substr(i, lit(3))))
  }

  /** Per-document language verdicts under frozen `profiles` —
    * (doc_id, lang_pred, score_fp): argmax of per-language integer
    * sums (each trigram contributes its profile score or `oovFp`),
    * ties by language ascending; a document with no trigrams predicts
    * `und` with score 0. Map-only.
    */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      profiles: Profiles, oovFp: Long = -15000000L): DataFrame = {
    require(oovFp < 0, s"oovFp must be negative, got $oovFp")
    val gs = trigramsExact(col(textCol))
    // per-language integer sum via a literal-map fold; struct
    // (score, pref) with pref = |langs|−index makes array_max pick
    // the max score and, on ties, the SMALLEST language index
    val n = profiles.langs.size
    val scored = profiles.langs.zipWithIndex.map { case ((l, m), i) =>
      val lm = typedLit(m)
      struct(
        aggregate(gs, lit(0L),
          (acc, g) => acc + coalesce(element_at(lm, g), lit(oovFp)))
          .as("s"),
        lit(n - i).as("pref"))
    }
    val best = array_max(array(scored: _*))
    val langByPref = profiles.langs.zipWithIndex
      .map { case ((l, _), i) => (n - i) -> l }.toMap
    val prefToLang = typedLit(langByPref)
    docs.select(col(idCol).as("doc_id"),
      when(size(gs) === 0, lit("und"))
        .otherwise(element_at(prefToLang, best.getField("pref")))
        .as("lang_pred"),
      when(size(gs) === 0, lit(0L))
        .otherwise(best.getField("s")).as("score_fp"))
  }
}
