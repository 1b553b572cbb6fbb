package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over a document corpus — the classic
  * sparse ranking function (Robertson et al., TREC-3 Okapi; the
  * `idf` variant is Lucene's non-negative form). In a training-data
  * pipeline this is the retrieval half of retrieval-based
  * decontamination and of "find the corpus documents most similar to
  * this eval prompt" audits — the lexical complement of the
  * embedding-space ANN operators in [[graft.similarity.Ann]].
  *
  * Determinism contract (what makes the result hash-gateable across
  * engines): per-(doc, term) weights are scalar double chains —
  * deterministic by IEEE — and the per-(query, doc) SUM over matched
  * terms is fixed-pointed BEFORE aggregation (`floor(w·10⁶)` summed
  * as longs), because a double sum is association-order-dependent
  * and shuffle order is not stable. The returned `score_fp` is that
  * integer, `score_fp / 10⁶ ≈` the usual BM25 score.
  *
  * Scale shape: the corpus pays ONE tokenize + one (doc, token)
  * shuffle for term frequencies (and a doc-length agg folded from
  * it); the query side is assumed benchmark-sized and BROADCAST both
  * into the document-frequency prune and into the scoring join, so
  * no corpus-sized relation ever shuffles on anything but (doc,
  * token). Document frequencies are computed only for terms that
  * appear in some query (semi-join prune). Final selection is
  * `row_number ≤ k` under a (query)-partitioned window —
  * InferWindowGroupLimit applies, so a hot query ships k×map-tasks
  * candidate rows, never its full match set.
  */
object Retrieval {

  /** (`idAlias`, token) rows under the engine's tokenization rule —
    * normalize + whitespace split, empty tokens dropped (empty or
    * whitespace-only text contributes NO tokens; split of a trimmed
    * empty string yields [""], which would otherwise inflate dl/avgdl
    * and let an empty query match every empty doc).
    */
  private[text] def tokens(df: DataFrame, idCol: String, textCol: String,
      idAlias: String): DataFrame =
    df.select(col(idCol).as(idAlias),
      explode(TextAnalysis.words(TextAnalysis.normalizeText(col(textCol))))
        .as("token"))
      .filter(length(col("token")) > 0)

  /** (doc_id, token, tf) term frequencies — the posting rows. */
  private[text] def termFreqs(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    tokens(df, idCol, textCol, "doc_id")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Lucene-form non-negative idf of the `df` column under a frozen
    * document count.
    */
  private[text] def idfCol(nDocs: Double): Column =
    log(lit(1.0) + (lit(nDocs) - col("df") + lit(0.5))
      / (col("df") + lit(0.5)))

  /** The fixed-point per-(doc, term) BM25 weight over columns
    * tf/idf/dl — a scalar double chain (deterministic by IEEE), then
    * `floor(w·10⁶)` so the per-(query, doc) sum is an exact long.
    */
  private[text] def weightFp(k1: Double, b: Double,
      avgdl: Double): Column =
    floor(col("idf")
      * ((col("tf") * lit(k1 + 1.0))
        / (col("tf") + lit(k1) * (lit(1.0 - b)
          + lit(b) * (col("dl") / lit(avgdl)))))
      * lit(1e6)).cast("long")

  /** Sum the per-term weights and keep rank ≤ k per query —
    * `row_number` under a (query)-partitioned window, so
    * InferWindowGroupLimit applies.
    */
  private[text] def rankTopK(contrib: DataFrame, k: Int): DataFrame = {
    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("w_fp")).as("score_fp"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_fp").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"), col("score_fp"))
  }

  /** Top-`k` corpus documents per query under BM25.
    *
    * @param docs    corpus; `idCol` must be unique
    * @param queries query table; `qIdCol` unique, `qTextCol` the
    *                query text (tokenized with the same rule as the
    *                corpus). Assumed small (benchmark-sized) — it is
    *                broadcast.
    * @return (query_id, doc_id, rank, score_fp) — `rank` 1-based by
    *         (score_fp DESC, doc_id ASC); self-matches (same id on
    *         both sides) are excluded so a query document drawn FROM
    *         the corpus retrieves its neighbors, not itself. The
    *         exclusion applies only when the two id columns share a
    *         data type — on mismatched types the ids are different
    *         key spaces and the cross-type comparison would cast to
    *         null and silently drop every row.
    *
    *         EAGER, persisted: the result (|queries|·k rows) is
    *         materialized before the internal corpus-sized tf cache
    *         is released — otherwise that cache, which the lazy plan
    *         read three times, would leak for the session lifetime
    *         with no release path. Release the (shortlist-sized)
    *         result with `.unpersist()` once consumed — the
    *         lshTopKFixed/knnGraphFixed caller contract.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      maxDfFraction: Double = 1.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0, 1], got $maxDfFraction")
    // the self-match exclusion below compares corpus and query ids; on
    // mismatched types the cast-to-null comparison would silently
    // filter EVERY row — fail analysis-time instead
    val sameIdType =
      docs.schema(idCol).dataType == queries.schema(qIdCol).dataType
    // tf feeds FOUR consumers (nToks, dl, df, scoring) — cache it so
    // the tokenize + count shuffle runs once, not once per branch
    val tf = termFreqs(docs, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // corpus-global statistics: two exact integer counts → one double
    // division, identical cross-engine (the oracle recomputes them).
    // nDocs counts ALL docs (empty ones dilute avgdl — the standard
    // convention); nToks folds off the cached tf, no second scan.
    val nDocs = docs.count()
    require(nDocs > 0, "corpus must be non-empty")
    val nToks = tf.agg(coalesce(sum(col("tf")), lit(0L))).head().getLong(0)
    val avgdl = nToks.toDouble / nDocs.toDouble

    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))

    // distinct query terms — benchmark-sized, broadcast everywhere
    val qterms = tokens(queries, qIdCol, qTextCol, "query_id").distinct()

    // document frequency ONLY for terms some query mentions; an
    // optional df-fraction cutoff drops stopword-class terms whose
    // postings dominate the scoring join's row count while their idf
    // contributes least — the classic IR prune for Zipf-headed
    // vocabularies (the scoring join's size is Σ_t df(t)·|queries
    // mentioning t|, and "the" pairs every query with every doc).
    // Default 1.0 = exact BM25, no pruning.
    val dfTab0 = tf
      .join(broadcast(qterms.select(col("token")).distinct()), Seq("token"),
        "left_semi")
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .withColumn("idf", idfCol(nDocs.toDouble))
    val dfTab =
      if (maxDfFraction >= 1.0) dfTab0
      else dfTab0.filter(col("df") <= lit(maxDfFraction * nDocs))

    // per-(doc, term) BM25 weight — scalar double chain, then fixed
    // point; the EXACT same expression text is generated for DuckDB
    // idf join FIRST: it is the pruned term set, so under a df cutoff
    // the postings of dropped stopwords never reach the q×d pairing
    val contrib0 = tf
      .join(broadcast(dfTab.select(col("token"), col("idf"))), Seq("token"))
      .join(broadcast(qterms), Seq("token"))
    // self-match exclusion only holds meaning when ids share a key
    // space; with mismatched types it would cast-to-null and drop all
    // rows, so sameIdType gates it (checked above)
    val contrib = (if (sameIdType)
      contrib0.filter(col("doc_id") =!= col("query_id"))
    else contrib0)
      .join(dl, Seq("doc_id"))
      .withColumn("w_fp", weightFp(k1, b, avgdl))

    // materialize the shortlist, then drop the corpus-sized tf cache —
    // the result stays releasable via out.unpersist() (see scaladoc)
    val out = rankTopK(contrib, k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count()
    tf.unpersist()
    out
  }
}
