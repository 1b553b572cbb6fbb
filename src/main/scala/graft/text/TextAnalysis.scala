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
    * For counts under a CORPUS-TRAINED merge table, use
    * [[graft.text.Bpe.train]] + [[graft.text.Bpe.tokenCount]].
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

  /** Marker-word profiles per language — the cheap zero-training
    * heuristic. The trained character-n-gram detector is
    * [[graft.text.LangId]] (q199); this form stays for corpora with
    * no labeled training slice.
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

  /** HTML → text extraction — the crawl-intake step every web-corpus
    * pipeline runs FIRST (the honest-regexp cousin of jusText/
    * trafilatura boilerplate strippers): drop script/style blocks and
    * comments, turn block-level closers into newlines (so paragraph
    * structure survives into [[graft.dedup.Dedup]]'s paragraph
    * dedup), strip remaining tags, decode the common entities
    * (`&amp;` LAST, so a double-escaped `&amp;lt;` correctly decodes
    * one level to `&lt;`, never to `<`), and collapse whitespace.
    * One map-only expression chain — zero shuffle, NULL in ⇒ NULL
    * out. Every pattern is shared Java-regex/RE2 syntax (lazy
    * quantifiers, inline `(?is)` flags, explicit classes instead of
    * `\s` — Java's includes `\x0B`, RE2's does not), so the exact
    * output replays in DuckDB and the q179 gate hashes it.
    */
  def htmlToText(html: Column): Column = {
    val noScript =
      regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle =
      regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = regexp_replace(noComment,
      "(?i)<(?:br\\s*/?|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol" +
        "|/blockquote|/title|/header|/section|/article)\\s*>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", " ")
    val e1 = regexp_replace(noTags, "&nbsp;", " ")
    val e2 = regexp_replace(e1, "&lt;", "<")
    val e3 = regexp_replace(e2, "&gt;", ">")
    val e4 = regexp_replace(e3, "&quot;", "\"")
    val e5 = regexp_replace(e4, "&#39;", "'")
    val e6 = regexp_replace(e5, "&amp;", "&")
    val sp = regexp_replace(e6, "[ \\t\\f\\r]+", " ")
    val nl = regexp_replace(sp, "[ ]*\\n[\\n ]*", "\n")
    // edge-trim spaces AND newlines (trim() drops only spaces, in
    // both engines)
    regexp_replace(nl, "^[\\n ]+|[\\n ]+$", "")
  }

  /** Whitespace-normalized lowercase form — the canonical content key. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint: md5 of the normalized text. Engine-portable
    * (md5 is standardized), used as the exact-dedup key.
    */
  def fingerprint(text: Column): Column = md5(normalizeText(text))

  /** Shannon character entropy (nats, 1e6 fixed point) of the
    * normalized text — the gibberish/noise quality signal the
    * Gopher-class rule stack lacks a portable form of: repetitive
    * boilerplate scores LOW (few characters dominate), keyboard-mash /
    * binary-in-text scores HIGH (near-uniform over a wide alphabet),
    * natural language sits in a stable band.
    *
    * Deterministic cross-engine: per-character counts are exact, each
    * term `cnt·(−ln(cnt/n))` is a fixed scalar double chain (ln is
    * engine-portable — the q153/q159 precedent), and the sum folds
    * LEFT-ASSOCIATIVELY over characters in sorted order — the ordered
    * fold that replays as DuckDB's `list_reduce` bit-for-bit (the
    * AnnOracles discipline; an unordered SUM of doubles would not
    * hash-gate). Map-only; per-doc cost O(distinct·len) — distinct is
    * alphabet-sized. Empty/null text scores NULL.
    */
  def charEntropyFp(text: Column): Column = {
    val t = normalizeText(coalesce(text, lit("")))
    val chars = split(t, "")
    val n = length(t).cast("double")
    val dc = array_sort(array_distinct(chars))
    val h = aggregate(dc, lit(0.0),
      (acc, c) => {
        val cnt = size(filter(chars, x => x === c)).cast("double")
        acc + cnt * -log(cnt / n)
      })
    when(length(t) === 0, lit(null).cast("long"))
      .otherwise(floor(h / n * 1e6).cast("long"))
  }

  /** Entropy band verdicts over a corpus — keep documents whose
    * character entropy sits inside [`loFp`, `hiFp`] (the natural-
    * language band; calibrate on a held-out sample). NULL entropy
    * (empty text) fails the gate. Returns
    * (doc_id, n_chars, entropy_fp, entropy_ok).
    */
  def entropyGate(docs: DataFrame, idCol: String, textCol: String,
      loFp: Long, hiFp: Long): DataFrame = {
    require(loFp <= hiFp, s"band is empty: [$loFp, $hiFp]")
    val e = charEntropyFp(col(textCol))
    docs.select(col(idCol).as("doc_id"),
      length(normalizeText(coalesce(col(textCol), lit(""))))
        .cast("long").as("n_chars"),
      e.as("entropy_fp"),
      coalesce(e >= loFp && e <= hiFp, lit(false)).as("entropy_ok"))
  }

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

  /** Overlapping token-window chunking — the embedding/RAG ingestion
    * shape: each document splits into windows of `chunkLen` tokens
    * starting every `chunkLen - overlap` tokens, so consecutive chunks
    * share `overlap` tokens of context. The final window may be
    * shorter; a document shorter than one window yields one chunk.
    * Chunk count = max(1, ⌈(n − overlap) / stride⌉) — a start is only
    * taken while it contributes ≥ stride new tokens.
    *
    * Pure expressions over a staged words array (HOF invariant:
    * [[graft.dedup.Dedup.shinglesFromWords]]) — scan-parallel, zero
    * shuffle; at 100 TB this is a map-only pass feeding the embedding
    * UDF / ANN index build downstream.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, overlap: Int): DataFrame = {
    require(chunkLen > 0 && overlap >= 0 && overlap < chunkLen,
      s"need 0 <= overlap < chunkLen, got chunkLen=$chunkLen overlap=$overlap")
    val stride = chunkLen - overlap
    docs
      .select(col(idCol).as("doc_id"),
        words(normalizeText(col(textCol))).as("__ws"))
      .withColumn("__n", size(col("__ws")))
      .filter(col("__n") > 0)
      .withColumn("__nchunks",
        greatest(lit(1),
          ceil((col("__n") - lit(overlap)).cast("double") / stride).cast("int")))
      .select(col("doc_id"), col("__ws"), col("__n"),
        posexplode(transform(sequence(lit(0), col("__nchunks") - 1),
          i => concat_ws(" ", slice(col("__ws"), i * stride + lit(1), lit(chunkLen)))))
          .as(Seq("chunk_no", "chunk_text")))
      .select(col("doc_id"), col("chunk_no"),
        (col("chunk_no") * stride).as("chunk_start"),
        least(lit(chunkLen), col("__n") - col("chunk_no") * stride).as("n_chunk_tokens"),
        col("chunk_text"))
  }

  /** Corpus-trained bigram fluency — a CCNet-style quality signal with
    * no external language model: P(w₂|w₁) = (c(w₁w₂)+1) / (c(w₁·)+V)
    * under add-one smoothing, counts and vocabulary from the corpus
    * itself. Per-document score = Σ ⌊10⁹·P⌋ over its bigrams (returned
    * with the bigram count so callers can normalize): each P is one
    * exactly-rounded IEEE division/multiplication of exact integers,
    * so the FIXED-POINT sum is order-independent — bit-reproducible at
    * any parallelism and across engines (the DuckDB oracle hash-matches
    * it), where a float log-likelihood sum would not be.
    *
    * Scale: two partial+final count aggregations over the exploded
    * bigrams, one scalar vocabulary aggregate (broadcast, 1 row), and
    * one shuffle join of the bigram stream against the count tables —
    * all linear in corpus token count. Low scores flag boilerplate /
    * noise / wrong-language text for the curation filter.
    */
  def bigramFluency(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = docs
      .select(col(idCol).as("doc_id"), words(normalizeText(col(textCol))).as("__ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the bigram stream feeds three consumers (c2, c1, the scoring
    // join) and ws feeds two — persist both so the regex/words
    // pipeline runs once, not once per consumer (branch-reexecution
    // invariant, see Dedup)
    val bigrams = ws
      .filter(size(col("__ws")) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("__ws")) - 2),
          i => struct(
            element_at(col("__ws"), i + 1).as("w1"),
            element_at(col("__ws"), i + 2).as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c2 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = bigrams.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = ws.select(explode(col("__ws")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val out = bigrams
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        // floor→long BEFORE the sum: the accumulation is integer, so
        // it cannot depend on shuffle order
        sum(floor(lit(1e9) * ((col("c2") + 1) / (col("c1") + col("v"))))
          .cast("long")).as("fluency_fp"))
      // eager persist (doc-count-sized result) so the working caches can
      // be dropped now; callers release with out.unpersist()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    bigrams.unpersist()
    ws.unpersist()
    out
  }

  /** CCNet-style fluency bucketing: rank every document by its
    * per-bigram [[bigramFluency]] score and split into `nBuckets`
    * equal tiers (bucket 1 = most fluent — CCNet's "head"; for
    * nBuckets = 3 the classic head/middle/tail). The per-doc score is
    * the integer-floored average smoothed-bigram probability in 1e-9
    * units, so ranking is exact-integer and engine-independent; ties
    * break on doc_id.
    *
    * Scale note: ntile is a GLOBAL sort of doc-count rows (score +
    * two longs per doc, not the corpus — the same accepted shape as
    * the q70 binning); kept exact here so the result is
    * oracle-checkable. At extreme doc counts use
    * [[fluencyBucketsAtScale]] (quantile thresholds, map-only
    * assignment, no global sort — proven ≥ 90%-agreeing in spec).
    *
    * Returns (doc_id, score_fp, bucket); docs with < 2 words carry no
    * score and are excluded, as in [[bigramFluency]].
    */
  def fluencyBuckets(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 3): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    import org.apache.spark.sql.expressions.Window
    val fl = bigramFluency(docs, idCol, textCol)
    val out = fl
      .withColumn("score_fp",
        floor(col("fluency_fp") / col("n_bigrams")).cast("long"))
      .withColumn("bucket", ntile(nBuckets).over(
        Window.orderBy(col("score_fp").desc, col("doc_id"))))
      .select("doc_id", "score_fp", "bucket")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    fl.unpersist()
    out
  }

  /** The 100 TB-doc-count form of [[fluencyBuckets]]: bucket thresholds
    * come from approximate score quantiles (one aggregate, driver
    * holds nBuckets-1 doubles) and assignment is a map-only comparison
    * chain — no global sort anywhere. Buckets agree with the exact
    * ntile away from quantile-estimation boundaries (spec asserts
    * ≥ 90% agreement on the real corpus); rows-only semantics (tie
    * regions may differ run-to-run with the estimation error).
    */
  def fluencyBucketsAtScale(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 3, relativeError: Double = 0.001): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val fl = bigramFluency(docs, idCol, textCol)
    val scored = fl.withColumn("score_fp",
      floor(col("fluency_fp") / col("n_bigrams")).cast("long"))
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val thresholds =
      if (probs.isEmpty) Array.empty[Double]
      else scored.stat.approxQuantile("score_fp", probs.toArray, relativeError)
    // bucket 1 = most fluent: 1 + number of ASCENDING quantile
    // thresholds the score fails to reach
    val bucket = thresholds.foldLeft(lit(1)) { (acc, t) =>
      acc + when(col("score_fp") < lit(t), 1).otherwise(0)
    }
    val out = scored.select(col("doc_id"), col("score_fp"),
      bucket.cast("int").as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    fl.unpersist()
    out
  }

  /** The ORACLE-GATEABLE scale form of [[fluencyBuckets]]: same
    * map-only threshold assignment as [[fluencyBucketsAtScale]], but
    * the thresholds come from the PORTABLE fixed-range histogram
    * sketch ([[graft.pipeline.PortableSketches.histRegisters]] /
    * `histQuantile`) instead of Spark's implementation-defined
    * Greenwald-Khanna quantiles — every step (integer score, integer
    * bucket counts, the exactly-representable bucket-edge thresholds)
    * replays bit-identically in any engine, so the production path
    * stops hiding behind rows-only. Score domain is [0, 1e9] by
    * construction (each per-bigram term is 1e9·P ≤ 1e9), so the
    * histogram range needs no data-dependent bounds; threshold error
    * ≤ one bucket width (1e9/histBuckets ≈ 61k fp units at the
    * default — ~0.7 % of the observed corpus spread).
    *
    * Scale shape: one map-combinable histogram agg (≤ histBuckets
    * rows), two artifact-sized driver collects for the thresholds,
    * then the same comparison-chain map pass — still no global sort.
    */
  def fluencyBucketsPortable(docs: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 3, histBuckets: Int = 16384): DataFrame = {
    require(nBuckets > 0, "nBuckets must be positive")
    val lo = 0.0
    val hi = 1.0e9
    val fl = bigramFluency(docs, idCol, textCol)
    val scored = fl.withColumn("score_fp",
      floor(col("fluency_fp") / col("n_bigrams")).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    scored.count()
    val regs = graft.pipeline.PortableSketches.histRegisters(
      scored, col("score_fp"), lo, hi, histBuckets)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thresholds = (1 until nBuckets).map(k =>
      graft.pipeline.PortableSketches.histQuantile(
        regs, k.toDouble / nBuckets, lo, hi, histBuckets))
    regs.unpersist()
    val bucket = thresholds.foldLeft(lit(1)) { (acc, t) =>
      acc + when(col("score_fp") < lit(t), 1).otherwise(0)
    }
    val out = scored.select(col("doc_id"), col("score_fp"),
      bucket.cast("int").as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    scored.unpersist()
    fl.unpersist()
    out
  }

  /** Gopher/C4-style repetition signals per document: share of the most
    * frequent word, duplicate-word mass, share of the most frequent
    * adjacent bigram — the standard "repetitious document" gates an LLM
    * corpus applies before any expensive processing.
    *
    * All counters come from ONE codegen'd scan-side kernel
    * ([[graft.functions.RepetitionCounts]]) — map-only, zero shuffle,
    * where the relational formulation (explode → two groupBys per
    * metric) would shuffle the corpus three times. Ratios are a single
    * exactly-rounded division of exact integer counters, so results are
    * bit-reproducible across engines (DuckDB oracle hash-matches).
    * Empty documents (no words) are dropped, mirroring the MinHash
    * empty-doc contract.
    */
  def repetitionProfile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // array_remove("") because split-of-empty yields [""], not [] — an
    // all-whitespace doc must drop via the kernel's empty→NULL contract
    val r = graft.functions.RepetitionExpressions
      .repetitionCounts(array_remove(words(normalizeText(col(textCol))), ""))
    docs
      .select(col(idCol).as("doc_id"), r.as("__r"))
      .filter(col("__r").isNotNull)
      .select(col("doc_id"),
        col("__r.n_words").as("n_words"),
        col("__r.n_distinct").as("n_distinct"),
        (col("__r.top_word").cast("double") / col("__r.n_words"))
          .as("top_word_ratio"),
        ((col("__r.n_words") - col("__r.n_distinct")).cast("double")
          / col("__r.n_words")).as("dup_word_frac"),
        when(col("__r.n_words") < 2, lit(0.0))
          .otherwise(col("__r.top_bigram").cast("double")
            / (col("__r.n_words") - 1)).as("top_bigram_ratio"))
  }

  /** PII patterns kept to constructs with identical semantics in Java
    * regex and RE2 (character classes, bounded repetition, `\b`): no
    * backreferences, no lookaround — so Spark and any RE2-based engine
    * (DuckDB, Go, C++) redact identically.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phonePattern = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** PII scrubbing — the redaction pass an LLM corpus runs before
    * training (emails, IPv4 addresses, US-phone-shaped numbers →
    * typed placeholder tokens, plus per-doc match counts for the
    * curation audit trail). Pure `regexp_replace`/`regexp_extract_all`
    * column expressions: map-only, codegen'd, zero shuffle — at 100 TB
    * this rides the ingest scan for free. Each audit count is taken on
    * the text AFTER the preceding replacements (the same cascade the
    * redaction applies), so the counts sum to exactly the number of
    * placeholders in `redacted` — an IPv4 inside an email's domain is
    * counted once as part of the <EMAIL>, never double-counted as an
    * <IP> it didn't become.
    */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, emailPattern, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, ipv4Pattern, "<IP>")
    docs.select(col(idCol).as("doc_id"),
      regexp_replace(afterIp, phonePattern, "<PHONE>").as("redacted"),
      size(regexp_extract_all(t, lit(emailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(afterEmail, lit(ipv4Pattern), lit(0))).as("n_ips"),
      size(regexp_extract_all(afterIp, lit(phonePattern), lit(0))).as("n_phones"))
  }

  /** THE winnow geometry defaults, shared by every winnow-family
    * entry point ([[winnowFingerprints]], `Dedup.winnowMatches`/
    * `winnowDecontaminate`, `WinnowIndex`) so two corpora
    * fingerprinted "with the defaults" can never silently mismatch.
    * k=20 ≈ 3–4 words: accidental gram collisions are rare enough
    * that shared fingerprints localize REAL shared regions; w=8 makes
    * the detection guarantee spans ≥ k+w−1 = 27 chars (one clause).
    * Smaller k (e.g. 5) raises sensitivity for short-match forensics
    * at the cost of stop-gram noise — pass it explicitly.
    */
  val WinnowDefaultK = 20
  val WinnowDefaultW = 8

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS local fingerprinting scheme): hash every
    * character k-gram of the normalized text, slide a w-hash window,
    * and select each window's minimum hash with RIGHTMOST tie-break;
    * the distinct (position, hash) selections are the fingerprints.
    * Guarantee (the paper's): any shared substring of length ≥ k+w−1
    * between two documents yields at least one shared fingerprint —
    * the local-dedup property whole-doc fingerprints and MinHash both
    * lack (they answer "similar?", winnowing answers "which region").
    *
    * The selection runs as a native codegen kernel
    * ([[graft.functions.WinnowExpressions.winnowSelect]]): one O(n)
    * monotonic-deque pass per document — the HOF formulation re-folded
    * every window from scratch (O(n·w) interpreted lambda steps, ~20×
    * slower at corpus scale, and it needed a `PlanBarrier` to stop
    * CollapseProject making it O(n²·w); that lesson stands —
    * SCALE.md §PlanBarrier — the kernel simply no longer has a staged
    * array to protect). Map-only, zero shuffle; docs shorter than k
    * emit nothing; a doc with k ≤ len < k+w−1 forms one clamped
    * window. Selected hashes are SIGNED xxhash64 values of
    * `'wfp:' || gram` (seed 42), replayable cross-engine.
    *
    * Returns (doc_id, pos, fp) — pos is the 1-based gram position.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = WinnowDefaultK, w: Int = WinnowDefaultW): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    val t = normalizeText(coalesce(col(textCol), lit("")))
    docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.WinnowExpressions.winnowSelect(t, k, w))
          .as("__s"))
      .select(col("doc_id"), col("__s.p").as("pos"), col("__s.h").as("fp"))
  }

  /** [[winnowFingerprints]] with RAW-coordinate gram spans: identical
    * hashes and normalized positions (the selection runs over the same
    * normalized form — fingerprints from the two variants always
    * join), plus `raw_lo`/`raw_hi`, the 1-based inclusive code-point
    * span each selected k-gram occupies in the ORIGINAL text
    * ([[graft.functions.WinnowSelectRaw]]'s inline normalization map).
    * This is the corpus-side primitive of raw-coordinate span removal
    * (`Dedup.winnowDecontaminateRaw`): evidence is matched in the
    * normalized space, surgery happens in the raw one. Map-only, zero
    * shuffle, same O(n) kernel cost class.
    *
    * Returns (doc_id, pos, fp, raw_lo, raw_hi).
    */
  def winnowFingerprintsRaw(docs: DataFrame, idCol: String, textCol: String,
      k: Int = WinnowDefaultK, w: Int = WinnowDefaultW): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(w >= 1, s"w must be >= 1, got $w")
    docs.select(col(idCol).as("doc_id"),
        explode(graft.functions.WinnowExpressions.winnowSelectRaw(
          coalesce(col(textCol), lit("")), k, w)).as("__s"))
      .select(col("doc_id"), col("__s.p").as("pos"), col("__s.h").as("fp"),
        col("__s.rs").as("raw_lo"), col("__s.re").as("raw_hi"))
  }

  /** Payment-card candidate pattern: 13–19 digits with optional
    * single space/dash separators (the common PAN formats). Same
    * Java-regex/RE2 dual-semantics constraint as the patterns above.
    */
  val cardCandidatePattern = "\\b(?:[0-9][ -]?){12,18}[0-9]\\b"

  /** Luhn checksum validity of a pure-digit string (ISO/IEC 7812 —
    * the mod-10 double-every-second-digit check every real PAN
    * satisfies): one fold over the reversed digits, pure integer
    * arithmetic, so the verdict replays exactly in any engine. Also
    * enforces the 13–19 PAN length band. Codegen'd HOF expressions —
    * no UDF.
    */
  def luhnValid(digits: Column): Column = {
    val rev = reverse(digits)
    val n = length(digits)
    val total = aggregate(sequence(lit(1), greatest(n, lit(1))),
      lit(0),
      (acc, i) => {
        val d = rev.substr(i, lit(1)).cast("int")
        acc + when(i % 2 === 1, d)
          .otherwise(when(d * 2 > 9, d * 2 - 9).otherwise(d * 2))
      })
    n >= 13 && n <= 19 && pmod(total, lit(10)) === 0
  }

  /** Credit-card exposure audit — the PAN member of the PII family
    * ([[redactPii]] covers email/IP/phone): per document, how many
    * card-SHAPED candidates appear and how many actually pass the
    * Luhn check (the false-positive split that decides whether a doc
    * needs redaction or just contains long numbers). Map-only column
    * expressions riding the scan, zero shuffle at any corpus size.
    * Returns (doc_id, n_candidates, n_luhn_valid).
    */
  def creditCardExposure(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val cands = regexp_extract_all(coalesce(col(textCol), lit("")),
      lit(cardCandidatePattern), lit(0))
    val digits = transform(cands,
      c => regexp_replace(c, "[ -]", ""))
    docs.select(col(idCol).as("doc_id"),
      size(cands).cast("long").as("n_candidates"),
      size(filter(digits, d => luhnValid(d))).cast("long")
        .as("n_luhn_valid"))
  }

  /** Per-document character-class composition + the CCNet/FineWeb-class
    * non-ASCII gate: exact counts of printable-ASCII, ASCII letters,
    * digits, spaces, and everything else, plus the cross-multiplied
    * keep verdict `n_nonascii · maxNonAsciiDen ≤ n_chars ·
    * maxNonAsciiNum` (default ≤ 5 %). The signal a language-targeted
    * crawl pipeline gates on before any tokenizer sees the bytes:
    * mojibake, binary-in-text, and wrong-script pages all light up
    * `n_nonascii`. `n_nonascii` (the gate numerator) is chars outside
    * `[ -~\t\n\r]` — tab/LF/CR carry document STRUCTURE and are not
    * charged against the budget (the intakeClean class), so a
    * 100-line clean ASCII doc is not billed 99 "non-ASCII" chars;
    * `n_ascii` remains strictly printable ASCII, so on multi-line
    * docs `n_ascii + n_nonascii < n_chars` by the structure-char
    * count. NULL text keeps NULL counts but gates `keep = false`
    * (coalesced — the c4LineFilter NULL contract).
    *
    * Counting idiom: `length(text) − length(regexp_replace(text,
    * class, ''))` with LITERAL character ranges (`[ -~]`, `[A-Za-z]`,
    * `[0-9]`) — portable between Java regex and RE2, unlike named
    * classes (`\p{Alpha}`, `\s`). Length semantics agree across
    * engines for all BMP text (Spark counts UTF-16 units, DuckDB
    * codepoints — equal until astral-plane chars; documents carrying
    * emoji/astral CJK would need a codepoint-exact kernel). Map-only,
    * zero shuffle, whole-stage codegen; stateless, so the streaming
    * twin runs it unchanged.
    */
  def charsetProfile(docs: DataFrame, idCol: String, textCol: String,
      maxNonAsciiNum: Long = 1L, maxNonAsciiDen: Long = 20L): DataFrame = {
    // two-stage select: each class strip is DEFINED once (the ASCII
    // strip feeds two outputs) and consumed as a length attribute —
    // the CollapseProject guard keeps the regex passes single-eval
    val text = col(textCol)
    def removedLen(cls: String): Column =
      (length(text) - length(regexp_replace(text, cls, ""))).cast("long")
    docs.select(
        col(idCol),
        length(text).cast("long").as("n_chars"),
        length(regexp_replace(text, "[^ -~]", "")).cast("long")
          .as("n_ascii"),
        removedLen("[A-Za-z]").as("n_letter"),
        removedLen("[0-9]").as("n_digit"),
        removedLen(" ").as("n_space"),
        // gate numerator: chars outside printable ASCII AND outside
        // the structure chars tab/LF/CR — the intakeClean class. The
        // plain n_chars − n_ascii difference would charge every line
        // break of a multi-line doc against the ≤5 % budget.
        length(regexp_replace(text, "[ -~\\t\\n\\r]", "")).cast("long")
          .as("n_nonascii"))
      .select(col(idCol), col("n_chars"), col("n_ascii"),
        col("n_letter"), col("n_digit"), col("n_space"),
        col("n_nonascii"),
        // coalesce: NULL text must gate to false, not NULL — the
        // c4LineFilter/blocklistGate NULL contract for this family
        coalesce(
          col("n_nonascii") * lit(maxNonAsciiDen) <=
            col("n_chars") * lit(maxNonAsciiNum),
          lit(false)).as("keep"))
  }

  /** Control-character sanitation — the byte-hygiene pass next to NFC
    * in any crawl intake: strip C0 controls and DEL (`\x00–\x08`,
    * `\x0B`, `\x0C`, `\x0E–\x1F`, `\x7F` — everything except tab,
    * newline, and carriage return, which carry document structure) and
    * report how many were removed. Terminal escape sequences, NUL
    * bytes and binary spill inside "text" all die here before they
    * poison tokenizers and content keys. The class is spelled with
    * two-digit `\xNN` escapes — the hex-escape syntax Java regex and
    * RE2 share (named classes like `\p{Cntrl}` differ cross-engine).
    * Map-only, zero shuffle, streaming-safe.
    */
  def sanitizeControlChars(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val text = col(textCol)
    val cleaned = stripControlChars(text)
    docs.select(col(idCol), cleaned.as("text_clean"),
      (length(text) - length(cleaned)).cast("long").as("n_removed"))
  }

  /** The C0/DEL strip as a column — [[sanitizeControlChars]]'s kernel,
    * composable into intake chains ([[graft.pipeline.Pipelines.intakeClean]]).
    */
  def stripControlChars(text: Column): Column =
    regexp_replace(text, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", "")

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
