package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document-quality filtering — the "quality classifier"
  * stage of GPT-3/LLaMA-style curation: a linear model over cheap
  * text statistics scores every document in one map-only pass, and the
  * keep decision is a threshold on the score. Two halves:
  *
  *  - [[scoreQuality]]: apply a FIXED weight vector — pure codegen'd
  *    column arithmetic on the scan, zero shuffle, oracle-portable
  *    (every feature and the dot product are IEEE-exact ops; no
  *    exp/log, so no libm divergence cross-engine).
  *  - [[trainWeights]]: fit the weights with MLlib logistic regression
  *    against a labeled sample (the real-world lifecycle: label a few
  *    thousand docs "reference-like vs crawl", train, then apply the
  *    frozen weights to the full corpus). Training touches only the
  *    labeled SAMPLE; the 100 TB corpus only ever sees the scorer.
  *
  * The sigmoid is deliberately NOT applied in [[scoreQuality]]: the
  * keep decision `σ(s) > σ(0) = 0.5` is equivalent to `s > 0`, and the
  * raw logit avoids `exp` (whose last-ulp behavior is libm-dependent —
  * the same reason the mixture sampler fixes α at 0.5).
  */
object Quality {

  /** Linear model over the four standard cheap features. `lenSat` is
    * the token count saturated at `lenCap` (a ramp, not log — IEEE
    * exact), `punct`/`stop` are the [[TextAnalysis]] ratios, `cpt`
    * is characters-per-token (verbosity/garbage signal).
    */
  final case class Weights(bias: Double, lenSat: Double, punct: Double,
      stop: Double, cpt: Double, lenCap: Double = 500.0)

  /** Hand-set default in the spirit of the C4/Gopher rules: favor
    * longer documents with natural stopword density, penalize
    * punctuation walls and very long pseudo-words.
    */
  val defaultWeights: Weights =
    Weights(bias = -1.0, lenSat = 2.0, punct = -4.0, stop = 3.0, cpt = -0.1)

  /** The four features as columns, shared by the scorer and the
    * trainer so trained weights mean exactly what the scorer applies.
    *
    * Blank-text contract: for any NON-NULL text — including empty and
    * whitespace-only — `tokenCount` is ≥ 1 in BOTH engines (Spark's
    * `split(trim(''), '\s+')` and DuckDB's `regexp_split_to_array`
    * each yield [''], verified empirically and pinned by spec), so
    * blank docs get a DEFINED score (bias + lenSat/lenCap +
    * cpt·rawLength from the one pseudo-token), not a null that a
    * downstream null-filter would silently drop — and the same value
    * in both engines. The cpt division is guarded anyway so the
    * contract survives any future tokenizer that returns 0; NULL text
    * still scores NULL (no document to judge — callers decide).
    */
  def features(text: Column, lenCap: Double): Seq[Column] = {
    val tc = TextAnalysis.tokenCount(text).cast("double")
    // NULL text is guarded EXPLICITLY on every feature: without it the
    // `when(tc > 0, …).otherwise(0.0)` arm maps a NULL token count to
    // 0.0 (a NULL condition falls through to otherwise) and `least`
    // skips NULL operands — the documented "NULL text scores NULL"
    // contract would then depend on OTHER features happening to
    // propagate NULL, not on this one's own definition.
    def onText(c: Column): Column = when(text.isNull, lit(null)).otherwise(c)
    Seq(
      onText(least(lit(1.0), tc / lit(lenCap))),
      TextAnalysis.punctRatio(text),
      TextAnalysis.stopwordRatio(text),
      onText(when(tc > 0, length(text).cast("double") / tc).otherwise(lit(0.0))))
  }

  /** Raw logit score under `w` — one codegen'd expression, map-only. */
  def scoreQuality(text: Column, w: Weights = defaultWeights): Column = {
    val Seq(l, p, s, c) = features(text, w.lenCap)
    lit(w.bias) + lit(w.lenSat) * l + lit(w.punct) * p +
      lit(w.stop) * s + lit(w.cpt) * c
  }

  /** (doc_id, score, keep) for every document — `keep = score > 0`,
    * score rounded to 6 dp (per-row scalar math: deterministic, safe
    * to round — see the fixed-point note in SparkEntry).
    */
  def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      w: Weights = defaultWeights): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      round(scoreQuality(col(textCol), w), 6).as("score"),
      (scoreQuality(col(textCol), w) > 0).as("keep"))

  /** Gopher-style heuristic quality gates (Rae et al. 2021, App. A —
    * the rule filters virtually every open corpus since reuses:
    * Gopher/MassiveText, RefinedWeb, Dolma): word-count bounds, mean
    * word length bounds, symbol-to-word ratio (# and ellipsis),
    * bullet-start / ellipsis-end line ratios, alphabetic-word
    * fraction, and required stop-word presence. The rule-based
    * complement of the model-based [[scoreQuality]] gate — real
    * pipelines run BOTH.
    *
    * Engine-portability: every rule is INTEGER arithmetic (the ratio
    * thresholds are cross-multiplied — `symbols/words ≤ 1/10` becomes
    * `10·symbols ≤ words`), so the whole report hash-gates with no
    * float anywhere. One map-only pass, zero shuffle; word stats ride
    * the normalized token array, line stats the RAW text (normalize
    * collapses newlines). NULL text yields NULL rules (no document to
    * judge — callers decide, the [[features]] contract).
    *
    * Returns (doc_id, n_words, ok_words, ok_word_len, ok_symbols,
    * ok_bullets, ok_ellipsis, ok_alpha, ok_stop, keep) —
    * [[gopherGates]]; [[gopherKeep]] is the combined predicate for
    * scan-side composition; [[GopherConfig]] carries the thresholds
    * (defaults are the published values; `stopWords` defaults to the
    * paper's required-word list).
    */
  final case class GopherConfig(
      minWords: Int = 50, maxWords: Int = 100000,
      minWordLen: Int = 3, maxWordLen: Int = 10,
      stopWords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minStopWords: Int = 2) {
    require(minWords >= 0 && maxWords >= minWords, "bad word bounds")
    require(minWordLen >= 0 && maxWordLen >= minWordLen, "bad word-len bounds")
    require(stopWords.nonEmpty && minStopWords >= 0, "bad stop-word rule")
  }

  /** The combined keep predicate of [[gopherGates]] as ONE column —
    * for composition into a scan-side gate
    * ([[graft.pipeline.Pipelines.curateCorpus]]'s opt-in stage rides
    * the same map pass as the other heuristic gates). NULL text yields
    * NULL (a filter drops it).
    */
  def gopherKeep(text: Column, g: GopherConfig = GopherConfig()): Column = {
    val r = gopherRuleCols(text, g)
    r.map(_._2).reduce(_ && _)
  }

  def gopherGates(docs: DataFrame, idCol: String, textCol: String,
      g: GopherConfig): DataFrame = {
    val text = col(textCol)
    val rules = gopherRuleCols(text, g)
    docs.select(
      Seq(col(idCol).as("doc_id"), gopherWordCount(text).as("n_words")) ++
        rules.map { case (n, c) => c.as(n) }: _*)
      .withColumn("keep",
        rules.map { case (n, _) => col(n) }.reduce(_ && _))
  }

  def gopherGates(docs: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000,
      minWordLen: Int = 3, maxWordLen: Int = 10,
      stopWords: Seq[String] =
        Seq("the", "be", "to", "of", "and", "that", "have", "with"),
      minStopWords: Int = 2): DataFrame =
    gopherGates(docs, idCol, textCol, GopherConfig(minWords, maxWords,
      minWordLen, maxWordLen, stopWords, minStopWords))

  /** Gate funnel: the attrition report every rule stack needs — for
    * rules applied in the GIVEN priority order, how many documents
    * each rule fails outright, how many it is the FIRST to kill
    * (i.e. its marginal cost given everything before it), and how
    * many survive through it. Feed it any frame with boolean rule
    * columns ([[gopherGates]], entropy/langid verdicts joined in, …).
    * NULL verdicts count as fail (the conservative read).
    *
    * One aggregation pass: every metric is a conditional sum with
    * map-side combine — a single one-row agg unpivoted to |rules|
    * rows, regardless of corpus size. Returns (stage, rule,
    * n_fail_total, n_first_fail, survivors_after).
    */
  def gateFunnel(gates: DataFrame, ruleCols: Seq[String]): DataFrame = {
    require(ruleCols.nonEmpty, "need at least one rule column")
    def r(name: String) = coalesce(col(name), lit(false))
    val aggs = ruleCols.zipWithIndex.flatMap { case (rc, i) =>
      val prevPass = ruleCols.take(i).map(r)
        .foldLeft(lit(true))(_ && _)
      Seq(
        coalesce(sum(when(!r(rc), 1L).otherwise(0L)), lit(0L))
          .as(s"__ft_$i"),
        coalesce(sum(when(prevPass && !r(rc), 1L).otherwise(0L)), lit(0L))
          .as(s"__ff_$i"),
        coalesce(sum(when(prevPass && r(rc), 1L).otherwise(0L)), lit(0L))
          .as(s"__sv_$i"))
    }
    val row = gates.agg(aggs.head, aggs.tail: _*)
    // typed unpivot (explode of struct literals) rather than a spliced
    // stack() selectExpr, so rule names with quotes/spaces/backticks
    // can never break parsing or mis-label rows
    val unpivoted = explode(array(ruleCols.zipWithIndex.map { case (rc, i) =>
      struct(lit(i.toLong).as("stage"), lit(rc).as("rule"),
        col(s"__ft_$i").as("n_fail_total"),
        col(s"__ff_$i").as("n_first_fail"),
        col(s"__sv_$i").as("survivors_after"))
    }: _*))
    row.select(unpivoted.as("r")).select(
      col("r.stage"), col("r.rule"), col("r.n_fail_total"),
      col("r.n_first_fail"), col("r.survivors_after"))
  }

  private def gopherWordCount(text: Column): Column =
    size(filter(
      TextAnalysis.words(TextAnalysis.normalizeText(text)),
      w => length(w) > 0)).cast("long")

  /** The eight named rule columns, shared by the report and the
    * composed keep predicate.
    */
  private def gopherRuleCols(text: Column,
      g: GopherConfig): Seq[(String, Column)] = {
    import g._
    val ws = filter(
      TextAnalysis.words(TextAnalysis.normalizeText(text)),
      w => length(w) > 0)
    val nWords = size(ws).cast("long")
    val nChars = aggregate(ws, lit(0L), (acc, w) => acc + length(w))
    val nAlpha = size(filter(ws, w => w.rlike("[a-z]"))).cast("long")
    // symbol occurrences in the RAW text: '#', three-dot ellipsis
    // (non-overlapping, both engines' replace semantics), '…'
    val nHash = length(text) - length(regexp_replace(text, "#", ""))
    val nEll3 = ((length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / lit(3)).cast("long")
    val nEllC = length(text) - length(regexp_replace(text, "…", ""))
    val nSymbols = nHash.cast("long") + nEll3 + nEllC.cast("long")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines,
      l => l.rlike("^\\s*[-*•]"))).cast("long")
    val nEllLine = size(filter(lines,
      l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long")
    val stopHits = stopWords.map(sw =>
      array_contains(ws, sw).cast("int")).reduce(_ + _)
    Seq(
      "ok_words" -> (nWords >= minWords && nWords <= maxWords),
      // minWordLen ≤ nChars/nWords ≤ maxWordLen, cross-multiplied
      "ok_word_len" -> (lit(minWordLen) * nWords <= nChars &&
        nChars <= lit(maxWordLen) * nWords),
      "ok_symbols" -> (lit(10L) * nSymbols <= nWords),
      "ok_bullets" -> (lit(10L) * nBullet <= lit(9L) * nLines),
      "ok_ellipsis" -> (lit(10L) * nEllLine <= lit(3L) * nLines),
      "ok_alpha" -> (lit(5L) * nAlpha >= lit(4L) * nWords),
      "ok_stop" -> (stopHits >= minStopWords))
  }

  /** C4-style line-level filtering (Raffel et al. 2020, §2.2 — the
    * cleaning pass that built C4 from Common Crawl): keep only lines
    * that END IN A TERMINAL PUNCTUATION mark (`.`, `!`, `?`, `"`) and
    * carry at least `minWordsPerLine` words; then drop whole pages
    * that contain `lorem ipsum` or a curly bracket `{`, or retain
    * fewer than `minKeptLines` lines after the line pass. Returns one
    * row per input document:
    * `(id, text_kept, n_lines, n_kept, keep_doc)` — the filtered text
    * (kept lines rejoined with `\n`), line attrition counts, and the
    * page verdict — so callers can audit attrition (the q213 funnel
    * shape) rather than just see survivors.
    *
    * Scale: pure column algebra over `split(text, '\n')` — one
    * map-only pass, zero shuffle, whole-stage codegen; usable
    * unchanged on a streaming relation (stateless). Word counting and
    * the punctuation test replay exactly in DuckDB (`str_split` +
    * `regexp_matches('[.!?"]$')`), so the whole verdict frame
    * hash-gates. NULL text yields NULL counts and `keep_doc = false`
    * (no page to keep — the scoreQuality NULL contract).
    */
  def c4LineFilter(docs: DataFrame, idCol: String, textCol: String,
      minWordsPerLine: Int = 3, minKeptLines: Int = 3): DataFrame = {
    // two-stage select: the kept-lines array is DEFINED once and
    // consumed as an attribute — CollapseProject's cost guard keeps a
    // multi-referenced non-cheap projection un-inlined, so the line
    // scan runs once per row, not once per output column
    val text = col(textCol)
    docs.select(col(idCol), text.as("__t"),
        c4KeptLines(text, minWordsPerLine).as("__kept"))
      .select(
        col(idCol),
        when(col("__t").isNotNull, array_join(col("__kept"), "\n"))
          .as("text_kept"),
        when(col("__t").isNotNull,
          size(split(col("__t"), "\\r?\\n")).cast("long")).as("n_lines"),
        when(col("__t").isNotNull, size(col("__kept")).cast("long"))
          .as("n_kept"),
        c4PageKeep(col("__t"), col("__kept"), minKeptLines)
          .as("keep_doc"))
  }

  /** Blocklist gate — the remaining C4 page rule (Raffel et al. 2020
    * drop pages containing any word from a bad-word list): count
    * blocklisted TOKENS (whitespace tokens of the normalized
    * lowercase text — substring matches would kill "Scunthorpe") and
    * keep pages with zero hits. Membership is an O(1) literal-map
    * null-test per token (the BigramLm lesson: `array_contains` over
    * a literal list is an O(|list|) scan on the hot inner loop).
    * Map-only, zero shuffle, streaming-safe; returns
    * `(id, n_blocked, keep)`.
    */
  def blocklistGate(docs: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String]): DataFrame = {
    require(blocklist.nonEmpty, "empty blocklist gates nothing")
    // dedupe AFTER lowercasing: case-variant duplicates ("Bad","bad")
    // would build duplicate map keys and throw DUPLICATED_MAP_KEY
    // under the default spark.sql.mapKeyDedupPolicy=EXCEPTION
    val m = map(blocklist.map(_.toLowerCase).distinct.flatMap(w =>
      Seq(lit(w), lit(1))): _*)
    val ws = TextAnalysis.words(
      TextAnalysis.normalizeText(col(textCol)))
    val nBlocked = size(filter(ws, w => element_at(m, w).isNotNull))
      .cast("long")
    docs.select(col(idCol),
      when(col(textCol).isNotNull, nBlocked).as("n_blocked"),
      coalesce(nBlocked === 0, lit(false)).as("keep"))
  }

  /** The C4 line rules as a column: the lines of `text` that end in a
    * terminal punctuation mark and carry at least `minWordsPerLine`
    * words — [[c4LineFilter]]'s kernel, composable into intake chains
    * ([[graft.pipeline.Pipelines.intakeClean]]).
    */
  def c4KeptLines(text: Column, minWordsPerLine: Int = 3): Column =
    // split on \r?\n (Spark's split IS regex): a CRLF-convention
    // document must not fail every line rule just because each line
    // carries a trailing \r that stripControlChars deliberately
    // preserves — the line-ending convention is not a quality signal.
    // \z, not $, for the terminal-punct anchor: Java regex $ also
    // matches BEFORE a final line terminator (CR, NEL u0085, LS/PS
    // u2028/9), so a lone-\r line ending ".\r" would be kept here but
    // dropped by the RE2/DuckDB oracle, whose $ is end-of-string.
    filter(split(text, "\\r?\\n"), l =>
      l.rlike("[.!?\"]\\z") &&
        size(filter(split(trim(l), " "), t => length(t) > 0)) >=
          minWordsPerLine)

  /** The C4 PAGE verdict as one column — shared by [[c4LineFilter]],
    * [[graft.pipeline.Pipelines.intakeClean]] and
    * [[graft.pipeline.Pipelines.intakeApply]] so the audit frame and
    * the in-place stage can never drift: no "lorem ipsum" placeholder
    * text (checked on the LOWERCASED page — the canonical placeholder
    * is capitalized "Lorem ipsum…", which a case-sensitive test
    * silently missed), no curly brace (code soup), and at least
    * `minKeptLines` surviving lines. NULL text gates false.
    */
  def c4PageKeep(clean: Column, kept: Column, minKeptLines: Int): Column =
    coalesce(
      !lower(clean).contains("lorem ipsum") &&
        !clean.contains("{") &&
        size(kept) >= minKeptLines,
      lit(false))

  /** Fit [[Weights]] by logistic regression on a LABELED sample
    * (`labelCol`: 1.0 = high-quality). Standard lifecycle: the sample
    * is small (it was labeled by hand or by membership in a reference
    * corpus), so the iterative fit never touches corpus-scale data;
    * the returned frozen weights drive [[scoreQuality]] over the full
    * corpus as a map-only pass.
    */
  def trainWeights(labeled: DataFrame, textCol: String, labelCol: String,
      lenCap: Double = 500.0, maxIter: Int = 50, regParam: Double = 0.0)
      : Weights = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.array_to_vector
    val fs = features(col(textCol), lenCap)
    val prepped = labeled.select(
      array_to_vector(array(fs: _*)).as("features"),
      col(labelCol).cast("double").as("label"))
    val m = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).fit(prepped)
    val c = m.coefficients.toArray
    Weights(bias = m.intercept, lenSat = c(0), punct = c(1), stop = c(2),
      cpt = c(3), lenCap = lenCap)
  }
}
