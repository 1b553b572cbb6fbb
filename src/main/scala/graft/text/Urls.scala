package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL operators for web-crawl curation (the RefinedWeb/CCNet intake
  * steps the reference's recommender pipeline never needed but any
  * 100 TB crawl corpus does): canonicalization, registrable-domain
  * extraction, URL-level keep-first dedup, and per-domain stats for
  * blocklist/allowlist construction.
  *
  * Everything here is pure `Column` expression work — canonicalization
  * is a map-only pass over the scan (zero shuffle), and the two
  * DataFrame ops shuffle only map-side-combinable aggregates (never
  * document bodies). All regex syntax is the Java∩RE2 portable subset
  * (no backreferences, no lookaround) so the DuckDB oracle replays the
  * identical semantics.
  */
object Urls {

  /** Canonical form of a raw crawl URL. Rules (each standard in crawl
    * dedup — see e.g. the RefinedWeb paper's URL dedup stage):
    *
    *  1. fragment stripped (`#...` never reaches the server);
    *  2. scheme stripped (http/https duplicates collapse);
    *  3. host lowercased, leading `www.` and default ports `:80`/`:443`
    *     stripped;
    *  4. path: trailing slashes stripped (path case is PRESERVED —
    *     paths are case-sensitive per RFC 3986);
    *  5. query: tracking parameters dropped (`utm_*`, `fbclid`,
    *     `gclid`, `msclkid`, `ref`), the rest sorted byte-wise so
    *     param order never splits a URL group, empty query dropped.
    *
    * Output has no scheme: `host[/path][?k=v&...]`. Idempotent
    * (canonicalize∘canonicalize = canonicalize) — property-tested.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(trim(url), "#.*$", "")
    val noScheme = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val rawHost = regexp_extract(noScheme, "^[^/?]*", 0)
    val rest = noScheme.substr(length(rawHost) + 1, length(noScheme))
    val host = regexp_replace(
      regexp_replace(lower(rawHost), "^www\\.", ""), ":(80|443)$", "")
    val path = regexp_replace(regexp_extract(rest, "^[^?]*", 0), "/+$", "")
    val query = when(instr(rest, "?") > 0,
      rest.substr(instr(rest, "?") + 1, length(rest))).otherwise(lit(""))
    val kept = array_sort(filter(split(query, "&"), p =>
      !(p === "" ||
        p.rlike("^(utm_[^=]*|fbclid|gclid|msclkid|ref)(=|$)"))))
    val sortedQ = array_join(kept, "&")
    concat(host, path,
      when(length(sortedQ) > 0, concat(lit("?"), sortedQ)).otherwise(lit("")))
  }

  /** Host part of a [[canonicalizeUrl]] output (everything before the
    * first `/` or `?`).
    */
  def hostOf(canonical: Column): Column =
    regexp_extract(canonical, "^[^/?]*", 0)

  /** Registrable domain of a host — public-suffix-LITE heuristic: the
    * last two labels, or the last three when the second-level label is
    * a common country-code SLD (`co|com|net|org|gov|ac|edu`, as in
    * `bbc.co.uk`). A production system would broadcast the full Public
    * Suffix List as a lookup table (same plan shape: map-only); the
    * heuristic keeps the operator self-contained and oracle-portable.
    * Hosts with no dot (or empty) pass through unchanged.
    */
  def registrableDomain(host: Column): Column = {
    val d = regexp_extract(host,
      "[^.]+\\.(co|com|net|org|gov|ac|edu)\\.[^.]+$|[^.]+\\.[^.]+$", 0)
    when(d === "", host).otherwise(d)
  }

  /** PSL-backed registrable domain — the production-grade form of
    * [[registrableDomain]]: real Public Suffix List semantics
    * (longest rule, wildcards, exceptions) over a checked-in snapshot,
    * so `user.github.io`-class private-suffix sites keep their own
    * domain groups instead of merging into the hoster's. Same plan
    * shape (map-only codegen'd expression); see [[PublicSuffix]].
    */
  def registrableDomainPsl(host: Column): Column =
    PublicSuffix.registrableDomain(host)

  /** URL-level keep-first dedup: one row per canonical URL with the
    * minimum-id owner and the recrawl count. The canonical key is
    * computed scan-side; the only shuffle moves (url_canon, id) pairs
    * through a map-side-combinable min/count aggregate — document
    * bodies never shuffle, so the op is O(corpus) scan + O(distinct
    * URLs) shuffle at any scale. Join the result back on `owner_id`
    * (or semi-join) to materialize the surviving documents.
    *
    * Caller contract: rows whose URL is null (or canonicalizes to "")
    * all share one group here — if URL-less docs must survive
    * individually, key them with a per-row sentinel first (see the
    * `curateCorpus` intake stage for the pattern).
    */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("__id"),
        canonicalizeUrl(col(urlCol)).as("url_canon"))
      .groupBy(col("url_canon"))
      .agg(min(col("__id")).as("owner_id"), count(lit(1)).as("n_crawls"))

  /** Per-domain document cap (the RefinedWeb/C4 domain-balancing
    * stage): keep at most `cap` documents per registrable domain,
    * selection DETERMINISTIC and uniform — the kept docs are the `cap`
    * smallest by md5(seed | id) (ties by id), so any engine reproduces
    * the exact survivor set from (seed, cap) and re-running never
    * churns it (unlike a rand() sample).
    *
    * Scale shape: the selection is `row_number() <= cap` over a
    * domain-partitioned window — which Spark 3.5+'s
    * `InferWindowGroupLimit` rewrites into a WindowGroupLimit pair
    * (Partial BEFORE the exchange, Final after), so every map task
    * forwards at most `cap` rows per domain: a hot domain
    * (10⁹ docs of blogspot.com) ships cap × map-tasks rows through
    * the shuffle, never its corpus mass. The spec asserts the
    * rewrite fires (a plain window here would be the q100-ntile trap
    * per domain). Docs with null URLs canonicalize to "" and form
    * their own capped group — pre-filter or sentinel-key them if they
    * must all survive.
    */
  def domainCap(docs: DataFrame, idCol: String, urlCol: String, cap: Int,
      seed: Long = 42L,
      domainOf: Column => Column = registrableDomain): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val domain = domainOf(hostOf(canonicalizeUrl(col(urlCol))))
    val ord = md5(concat(lit(seed.toString), lit("|"),
      col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(domain).orderBy(ord.asc, col(idCol).asc)
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }

  /** Per-domain BEST-k selection — [[domainCap]]'s policy sibling:
    * instead of a uniform random cap, keep each registrable domain's
    * `k` HIGHEST-scoring documents (quality model, centrality, any
    * deterministic score) — the "best pages per site" selection a
    * curated crawl actually wants. Ties break on the id, so for a
    * deterministic score column the survivor set is engine-exact.
    *
    * Same scale shape as [[domainCap]]: `row_number() <= k` over the
    * domain-partitioned window takes Spark's InferWindowGroupLimit
    * rewrite (partial group-limit BEFORE the exchange), so a hot
    * domain ships k × map-tasks rows through the shuffle, never its
    * corpus mass. Output adds the derived `domain` column.
    */
  def domainTopK(docs: DataFrame, idCol: String, urlCol: String, k: Int,
      score: Column,
      domainOf: Column => Column = registrableDomain): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val d = docs.withColumn("domain",
      domainOf(hostOf(canonicalizeUrl(col(urlCol)))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain")).orderBy(score.desc, col(idCol).asc)
    d.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Per-registrable-domain corpus stats — the primitive behind
    * domain blocklists/allowlists and per-domain caps (C4 and
    * RefinedWeb both gate on them). Two-level aggregation: URLs
    * dedup first (map-side combinable on url_canon), then roll up to
    * the domain — the second shuffle moves one row per DISTINCT URL,
    * never per document.
    */
  def domainStats(docs: DataFrame, urlCol: String,
      domainOf: Column => Column = registrableDomain): DataFrame =
    docs
      .select(canonicalizeUrl(col(urlCol)).as("url_canon"))
      .withColumn("domain", domainOf(hostOf(col("url_canon"))))
      .groupBy(col("domain"), col("url_canon"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("domain"))
      .agg(sum(col("__n")).as("n_docs"), count(lit(1)).as("n_urls"))
}
