package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE/data-quality surface a lake pipeline
  * runs on every ingested partition: per-column row/null/distinct
  * counts and numeric ranges, computed for ALL columns in ONE
  * aggregation pass (one scan, one reduce — never a job per column).
  * The per-column results unpivot to rows driver-side from a single
  * collected aggregate row, so output size is |columns|, independent
  * of data size — safe at any scale.
  */
object Profiling {

  /** Per-source "data card" — the dataset-documentation summary every
    * released corpus ships (cf. Datasheets for Datasets / Dolma's
    * per-source tables): docs, token and char mass, language spread,
    * quality-gate pass count, fixed-point quality mass, and exact-dup
    * exposure, one row per source. Every output is an INTEGER (counts
    * and micro-unit sums), so the whole card hash-gates — derived
    * ratios/means are one exact division away and deliberately left
    * to the reader.
    *
    * Scale shape: the base stats are ONE groupBy(source) over
    * scan-side expressions (map-side combinable); the dup exposure
    * adds one fingerprint-keyed count agg and an equi-join back (the
    * exact-dedup shuffle, reused as a statistic); both result tables
    * are |sources| rows. Null-text docs: token/char/quality sums skip
    * them (SQL aggregate null semantics), and a null fingerprint
    * never joins, so they are never counted duplicated.
    */
  def dataCard(docs: DataFrame, sourceCol: String, idCol: String,
      textCol: String, langCol: String,
      w: graft.text.Quality.Weights = graft.text.Quality.defaultWeights)
      : DataFrame = {
    import graft.text.{Quality, TextAnalysis}
    val score = Quality.scoreQuality(col(textCol), w)
    val base = docs.groupBy(col(sourceCol).as("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("n_tokens"),
      sum(length(col(textCol)).cast("long")).as("n_chars"),
      countDistinct(col(langCol)).as("n_langs"),
      count(when(score > 0, lit(1))).as("n_keep"),
      // micro-unit fixed point, accumulated as DECIMAL(38,0) (the
      // profileNumeric overflow rule) then narrowed for the output
      sum(floor(score * 1e6)
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))
        .cast("long").as("sum_quality_fp"))
    val f = docs.select(col(sourceCol).as("source"),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val dups = f
      .join(f.groupBy("fp").agg(count(lit(1)).as("__cnt")), Seq("fp"))
      .groupBy("source")
      .agg(count(when(col("__cnt") > 1, lit(1))).as("n_dup_docs"))
    base.join(dups, Seq("source"), "left")
      .na.fill(0L, Seq("n_dup_docs"))
  }

  /** One row per profiled numeric column: (column, n, n_null,
    * n_distinct, min_v, max_v, mean_v). Exact counts — at 100 TB the
    * exact distinct is the expensive stat (one partial+final agg per
    * column inside the same pass); swap to approx_count_distinct when
    * 2% error is acceptable — kept exact here so the result is
    * oracle-checkable. The mean accumulates in FIXED POINT
    * (micro-units, floor before summing) so it is shuffle-order- and
    * engine-independent — a double `avg` of 2-decimal values is
    * neither (house float-aggregation rule).
    */
  /** Per-group PII-exposure report — the privacy audit a corpus runs
    * BEFORE and AFTER the q89 redaction pass (before: what leaks and
    * where; after: all-zero proves the scrub): per `groupCol`, doc
    * counts, docs containing ANY PII, and total instance counts per
    * type. Counts use [[graft.text.TextAnalysis.redactPii]]'s exact
    * cascade semantics (each pattern counted on the text AFTER the
    * preceding replacements — an IPv4 inside an email's domain counts
    * once as the email), so `sum(n_*) == placeholders the redaction
    * would emit`, making the report the redaction's audit ledger.
    * All-integer output, map-only scan + ONE |groups|-row aggregate.
    */
  def privacyReport(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    import graft.text.TextAnalysis._
    val t = col(textCol)
    val afterEmail = regexp_replace(t, emailPattern, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, ipv4Pattern, "<IP>")
    val perDoc = docs.select(col(groupCol),
      size(regexp_extract_all(t, lit(emailPattern), lit(0))).as("ne"),
      size(regexp_extract_all(afterEmail, lit(ipv4Pattern), lit(0))).as("ni"),
      size(regexp_extract_all(afterIp, lit(phonePattern), lit(0))).as("np"))
    perDoc.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_docs"),
      sum((col("ne") > 0 || col("ni") > 0 || col("np") > 0)
        .cast("long")).as("n_docs_with_pii"),
      sum(col("ne").cast("long")).as("n_emails"),
      sum(col("ni").cast("long")).as("n_ips"),
      sum(col("np").cast("long")).as("n_phones"))
  }

  /** Cross-source duplication overlap — "which sources mirror each
    * other": per unordered source pair, the number of DISTINCT
    * normalized-content fingerprints both carry. The audit that
    * decides which feed is the canonical one before priority dedup
    * ([[graft.dedup.Dedup.exactGroupsByPriority]]) and that catches a
    * vendor reselling another feed. Scale shape: distinct
    * (source, fingerprint) pairs (scan-side md5), ONE equi-self-join
    * on the fingerprint — join fan-out is bounded by per-fingerprint
    * source counts (≤ |sources|), never corpus×corpus.
    */
  def sourceOverlap(docs: DataFrame, sourceCol: String,
      textCol: String): DataFrame = {
    val fp = docs.select(col(sourceCol).as("source"),
      graft.text.TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .distinct()
    fp.as("a").join(fp.as("b"),
      col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Vocabulary drift between two corpora — the token-distribution
    * audit behind "did the crawl change" / "is the tokenizer stale"
    * monitoring (the distribution-level complement of q147's
    * tokenizer-UNK drift): for the `topK` tokens by combined count,
    * exact counts in each corpus plus two-sided drift verdicts —
    * `drift_up` iff the token's SHARE in A exceeds `factorNum/
    * factorDen` times its share in B, and symmetrically `drift_down`.
    * The share comparison is CROSS-MULTIPLIED into exact integer
    * arithmetic (`cnt_a·total_b·den > cnt_b·total_a·num`, DECIMAL(18)
    * products ≤ 10³⁷ — no division, no float, the gopherGates
    * threshold rule), so every verdict hash-gates. A token absent
    * from one side counts 0 there — absence IS the strongest drift.
    *
    * Scale shape: one tokenize+count agg per side (map-side
    * combinable, vocabulary-sized results), two 1-row total aggs
    * broadcast as literals via a cross join, one vocabulary-sized
    * full-outer join, and a global top-K (TakeOrderedAndProject —
    * never a full sort). The corpora are scanned once each; nothing
    * corpus-sized shuffles except the (doc, token) count shuffle both
    * sides already pay.
    *
    * Caller contract: `cnt·factor` must fit 18 digits (any real
    * corpus does); `topK` bounds the report, not the comparison —
    * drift on a rare token outside the top-K is invisible, so pick
    * topK ≥ the vocabulary slice you act on.
    */
  def vocabDrift(a: DataFrame, b: DataFrame, textCol: String,
      topK: Int, factorNum: Long = 2L, factorDen: Long = 1L): DataFrame =
    vocabDriftFromCounts(tokenCounts(a, textCol, "cnt_a"),
      tokenCounts(b, textCol, "cnt_b"), topK, factorNum, factorDen)

  /** (token, `out`) exact counts under the engine's tokenization rule
    * — [[vocabDrift]]'s per-corpus half, exposed for count-level
    * callers (the streaming fold keeps per-batch counts, not text).
    */
  private[graft] def tokenCounts(df: DataFrame, textCol: String,
      out: String): DataFrame = {
    import graft.text.TextAnalysis
    df.select(explode(TextAnalysis.words(
      TextAnalysis.normalizeText(col(textCol)))).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token")).agg(count(lit(1)).as(out))
  }

  /** Zipf power-law fit of the rank–frequency curve — the corpus-health
    * scalar behind "does this crawl look like natural language"
    * (natural text sits near α ≈ 1; boilerplate/template floods and
    * synthetic spam bend the curve): least-squares slope of ln(count)
    * on ln(rank) over the top-`topK` tokens, α = −slope.
    *
    * Determinism: ranks are total-ordered (count desc, token asc);
    * each regression moment is floored to 1e6 fixed point PER TERM and
    * summed as integers (the house float-sum rule), so the whole row —
    * moments included — hash-gates. The final α divides two exact
    * integer-valued doubles (one IEEE divide, engine-portable).
    *
    * Scale: one map-side-combinable token count, one top-K selection,
    * one K-row aggregate — the K-row global sort is bounded by `topK`
    * (the q19 global-top-k class), never corpus-sized. Returns ONE row
    * (k_used, n_tokens, vocab_size, sx, sy, sxy, sxx, alpha_fp).
    */
  def zipfFit(docs: DataFrame, textCol: String, topK: Int = 100): DataFrame = {
    require(topK >= 2, s"topK must be >= 2, got $topK")
    import org.apache.spark.sql.types.DecimalType
    val counts = tokenCounts(docs, textCol, "cnt")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val totals = counts.agg(
        coalesce(sum(col("cnt")), lit(0L)).as("n_tokens"),
        count(lit(1)).as("vocab_size"))
      val ranked = counts.orderBy(col("cnt").desc, col("token")).limit(topK)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("token"))).cast("long"))
      def fp(c: org.apache.spark.sql.Column) =
        floor(c * lit(1000000.0)).cast(DecimalType(38, 0))
      val lx = log(col("rank").cast("double"))
      val ly = log(col("cnt").cast("double"))
      val moments = ranked.agg(
        count(lit(1)).as("k_used"),
        sum(fp(lx)).cast("long").as("sx"),
        sum(fp(ly)).cast("long").as("sy"),
        sum(fp(lx * ly)).cast("long").as("sxy"),
        sum(fp(lx * lx)).cast("long").as("sxx"))
      // slope = (K·Σxy − Σx·Σy) / (K·Σxx − Σx²), computed over the
      // integer moments DESCALED first: each s/1e6 is an
      // exact-integer-over-1e6 IEEE divide, and the subsequent
      // multiply/subtract/divide chain is the identical IEEE sequence
      // in DuckDB (same parenthesization) — never a decimal→double
      // cast of a >2⁵³ value, which is where engines round differently
      val out = moments.crossJoin(totals).select(
        col("k_used"), col("n_tokens"), col("vocab_size"),
        col("sx"), col("sy"), col("sxy"), col("sxx"),
        {
          val k = col("k_used").cast("double")
          def ds(c: String) = col(c).cast("double") / lit(1000000.0)
          val num = k * ds("sxy") - ds("sx") * ds("sy")
          val den = k * ds("sxx") - ds("sx") * ds("sx")
          floor(-(num / den) * lit(1000000.0)).cast("long").as("alpha_fp")
        })
      out.localCheckpoint(true)
    } finally counts.unpersist()
  }

  /** [[vocabDrift]]'s comparison half over prepared count relations
    * `ca(token, cnt_a)` / `cb(token, cnt_b)` — counts are
    * sum-mergeable, so a streaming consumer folds per-batch counts
    * and compares at read time against a frozen reference (q192).
    */
  def vocabDriftFromCounts(ca: DataFrame, cb: DataFrame, topK: Int,
      factorNum: Long = 2L, factorDen: Long = 1L): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(factorNum > 0 && factorDen > 0,
      s"drift factor must be positive, got $factorNum/$factorDen")
    import org.apache.spark.sql.types.DecimalType
    val ta = ca.agg(coalesce(sum(col("cnt_a")), lit(0L)).as("total_a"))
    val tb = cb.agg(coalesce(sum(col("cnt_b")), lit(0L)).as("total_b"))
    def d18(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 0))
    ca.join(cb, Seq("token"), "full_outer")
      .na.fill(0L, Seq("cnt_a", "cnt_b"))
      .crossJoin(broadcast(ta)).crossJoin(broadcast(tb))
      .withColumn("drift_up",
        d18(col("cnt_a") * lit(factorDen)) * d18(col("total_b")) >
          d18(col("cnt_b") * lit(factorNum)) * d18(col("total_a")))
      .withColumn("drift_down",
        d18(col("cnt_b") * lit(factorDen)) * d18(col("total_a")) >
          d18(col("cnt_a") * lit(factorNum)) * d18(col("total_b")))
      .orderBy((col("cnt_a") + col("cnt_b")).desc, col("token").asc)
      .limit(topK)
      .select(col("token"), col("cnt_a"), col("cnt_b"),
        col("drift_up"), col("drift_down"))
  }

  /** Embedding-column health audit — the input validation every
    * embedding pipeline runs before ANN/dedup stages consume the
    * vectors (a single NaN poisons every dot product it touches;
    * a zero vector "unitizes" to itself and cosine-matches nothing
    * meaningfully; a wrong-width vector crashes position-indexed
    * kernels). ONE map-side-combinable aggregate over a cascade of
    * DISJOINT verdicts per row — null → wrong_dim → nonfinite →
    * zero → ok, each row counted exactly once, `n_rows` = the sum.
    * All-integer output (one row), so the audit hash-gates.
    */
  def embeddingHealth(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val v = col(vecCol)
    val isNull = v.isNull
    val wrongDim = size(v) =!= dim
    // element-count forms (not forall/exists) so the DuckDB replay is
    // the literally identical list_filter expression
    val nonfinite = size(filter(v, x => isnan(x) ||
      x === lit(Float.PositiveInfinity) ||
      x === lit(Float.NegativeInfinity))) > 0
    val allZero = size(filter(v, x => x =!= lit(0.0f))) === 0
    val cls = when(isNull, lit("null"))
      .when(wrongDim, lit("wrong_dim"))
      .when(nonfinite, lit("nonfinite"))
      .when(allZero, lit("zero"))
      .otherwise(lit("ok"))
    df.select(cls.as("__c")).agg(
      count(lit(1)).as("n_rows"),
      count(when(col("__c") === "null", lit(1))).as("n_null"),
      count(when(col("__c") === "wrong_dim", lit(1))).as("n_wrong_dim"),
      count(when(col("__c") === "nonfinite", lit(1))).as("n_nonfinite"),
      count(when(col("__c") === "zero", lit(1))).as("n_zero"),
      count(when(col("__c") === "ok", lit(1))).as("n_ok"))
  }

  def profileNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val spark = df.sparkSession
    val aggs = cols.flatMap { c =>
      // Fixed-point sum accumulates as DECIMAL(38,0), not LONG — the
      // micro-unit longs overflow int64 at ~9.2e12 summed units, which
      // a 100 TB table reaches long before the scan ends (same reason
      // SparkEntry.fsum is decimal). DuckDB's HUGEINT promotion covers
      // the oracle side.
      Seq(count(col(c)).as(s"${c}__n"),
        (count(lit(1)) - count(col(c))).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__mn"),
        max(col(c)).cast("double").as(s"${c}__mx"),
        sum(floor(col(c).cast("double") * 1e6).cast(DecimalType(38, 0))).as(s"${c}__s"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val out = cols.zipWithIndex.map { case (c, i) =>
      val b = i * 6
      val n = row.getLong(b)
      // min/max/sum are NULL for an empty table or all-null column —
      // propagate null (matching SQL MIN/MAX) instead of NPE'ing.
      def optD(j: Int): Any = if (row.isNullAt(j)) null else row.getDouble(j)
      Row(c, n, row.getLong(b + 1), row.getLong(b + 2), optD(b + 3), optD(b + 4),
        if (n == 0) 0.0 else row.getDecimal(b + 5).doubleValue() / n / 1e6)
    }
    val schema = StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("n_null", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("min_v", DoubleType, nullable = true),
      StructField("max_v", DoubleType, nullable = true),
      StructField("mean_v", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema)
  }
}
