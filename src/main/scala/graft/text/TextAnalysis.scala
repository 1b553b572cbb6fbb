package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (BASELINE
  * north-star): token counting, quality scoring, language ID,
  * content fingerprinting. All pure column expressions — codegen'd,
  * no UDFs, scan-parallel at any scale.
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish token estimate: count of pre-tokenizer pieces (letter runs,
    * single digits, punctuation) — the GPT-2-style pre-split that upper
    * bounds BPE merges. Regex engine differences across engines are
    * avoided by keeping the pattern to portable character classes.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0)))

  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)) // ANSI divide-by-zero guard
      .otherwise(
        length(regexp_replace(text, "[^.!?,;:]", "")).cast("double") / length(text))

  val enStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  def stopwordRatio(text: Column, stopwords: Seq[String] = enStopwords): Column = {
    val sw = array(stopwords.map(lit): _*)
    size(filter(words(lower(text)), w => array_contains(sw, w))).cast("double") /
      tokenCount(text)
  }

  /** Heuristic quality score in (0, 1]: favors mid-length documents with
    * low punctuation density and natural stopword frequency — the
    * standard cheap pre-filter shape (Gopher/C4-style rules) expressed
    * as one codegen'd expression.
    */
  def qualityScore(text: Column): Column =
    least(lit(1.0), tokenCount(text).cast("double") / 100.0) *
      (lit(1.0) - punctRatio(text)) * (lit(0.5) + stopwordRatio(text))

  /** Marker-word profiles per language. Real deployments would use
    * character n-gram models; the *operator shape* (per-language score →
    * argmax with fixed precedence) is identical.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "y", "es", "que"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que"),
    "zh" -> Seq("的", "了", "是", "在", "我", "不"))

  def langScore(text: Column, markers: Seq[String]): Column = {
    val m = array(markers.map(lit): _*)
    size(filter(words(lower(text)), w => array_contains(m, w)))
  }

  /** argmax over profiles; ties resolve by profile declaration order
    * (first profile whose score equals the max wins).
    */
  def langId(text: Column): Column = {
    val scores = langProfiles.map { case (l, m) => l -> langScore(text, m) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.reverse.tail.foldLeft(lit(scores.last._1): Column) {
      case (acc, (l, s)) => when(s === best, lit(l)).otherwise(acc)
    }
  }

  /** Whitespace-normalized lowercase form — the canonical content key. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text. Engine-portable
    * (md5 is standardized), used as the exact-dedup key.
    */
  def fingerprint(text: Column): Column = md5(normalizeText(text))

  /** Rolling polynomial hash over words (Rabin-Karp-style document
    * fingerprint) — order-sensitive unlike the md5 of the bag of words.
    * State is masked to 57 bits so `acc*31 + h` stays inside a long
    * (Spark 4's ANSI mode throws on overflow instead of wrapping).
    */
  def rollingHash(text: Column): Column = {
    val mask = (1L << 57) - 1L
    aggregate(words(normalizeText(text)), lit(0L),
      (acc, w) => (acc * lit(31L) + xxhash64(w).bitwiseAND(mask)).bitwiseAND(mask))
  }

  /** Corpus vocabulary: token → (occurrences, doc frequency), top
    * `topK` by count (vocab/tokenizer-building step). One explode + one
    * partial+final aggregation; doc frequency via countDistinct on ids.
    */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String, topK: Int): DataFrame =
    docs.select(col(idCol).as("__id"),
      explode(words(normalizeText(col(textCol)))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("__id")).as("doc_freq"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(topK)

  /** One-stop profile of a documents table. */
  def profile(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_bpe_tokens", bpeTokenCount(col(textCol)))
      .withColumn("punct_ratio", round(punctRatio(col(textCol)), 6))
      .withColumn("stop_ratio", round(stopwordRatio(col(textCol)), 6))
      .withColumn("quality", round(qualityScore(col(textCol)), 6))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))
}
