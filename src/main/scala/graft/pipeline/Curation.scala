package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.prep.Prep
import graft.text.TextAnalysis

/** Corpus-curation operators a production training-data pipeline runs
  * between raw ingest and tokenization: incremental refresh (upsert),
  * benchmark decontamination, and sequence packing. The reference has
  * no corpus layer (its ETL is `json-to-csv.py:4-12`); these extend the
  * same relational machinery (window dedup, broadcast anti-join,
  * running windows) to the LLM-pipeline surface the BASELINE
  * north-star names.
  */
object Curation {

  /** Incremental corpus refresh: merge an updates batch into a base
    * snapshot, keeping the highest-`version` row per key (ties break
    * toward the later sort order of `versionCol` — callers should make
    * versions unique per key). This is union + keep-last window dedup
    * (`Prep.dedupKeepLast`), i.e. one shuffle on the key — no driver
    * state, no per-row comparisons outside the window, so it scales to
    * any snapshot size. Updates with unseen keys insert; matching keys
    * replace.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String],
      versionCol: Column): DataFrame =
    Prep.dedupKeepLast(base.unionByName(updates), keys, Seq(versionCol))

  /** Benchmark decontamination: drop corpus rows whose normalized
    * content fingerprint (`TextAnalysis.fingerprint` — lowercase,
    * whitespace-collapsed md5) appears in the benchmark/eval set, so
    * held-out data never leaks into training. The benchmark side is
    * eval-suite-sized (thousands of documents vs billions in the
    * corpus), so it broadcasts and the anti-join runs map-side against
    * the corpus scan — zero shuffle of corpus rows.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      textCol: String): DataFrame = {
    val bmFp = benchmark
      .select(TextAnalysis.fingerprint(col(textCol)).as("__fp"))
      .distinct()
    corpus
      .withColumn("__fp", TextAnalysis.fingerprint(col(textCol)))
      .join(broadcast(bmFp), Seq("__fp"), "left_anti")
      .drop("__fp")
  }

  /** N-gram-collision decontamination — the GPT-3/PaLM recipe: a corpus
    * document is contaminated if it shares ANY word `n`-gram with the
    * benchmark set. Catches PARTIAL inclusion (a benchmark question
    * quoted inside a larger page) that the exact-fingerprint anti-join
    * ([[decontaminate]]) cannot; run both in a real pipeline.
    *
    * Scale shape: benchmark n-grams md5-hash to 16 bytes each
    * (independent of n) and BROADCAST — eval sets are small by
    * construction. The corpus side is a map-only explode to
    * (id, gram-hash) probing the broadcast; only the hit ids (rare)
    * reach the distinct aggregation, and the final anti join removes
    * them. Corpus documents themselves never shuffle.
    */
  def ngramDecontaminate(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 13): DataFrame = {
    import graft.dedup.Dedup
    def grams(df: DataFrame, cols: Column*): DataFrame = df
      .select(cols :+
        TextAnalysis.words(TextAnalysis.normalizeText(col(textCol))).as("__ws"): _*)
      .withColumn("__sh", Dedup.shinglesFromWords(col("__ws"), n))
      .select(cols :+ explode(col("__sh")).as("__gram"): _*)
      .select(cols :+ md5(col("__gram")).as("__gh"): _*)
    val bmGrams = grams(benchmark).distinct()
    val hits = grams(corpus, col(idCol))
      .join(broadcast(bmGrams), Seq("__gh"))
      .select(idCol).distinct()
    corpus.join(hits, Seq(idCol), "left_anti")
  }

  /** Surgical (span-level) decontamination: remove from each corpus
    * document every `n`-token span that appears VERBATIM in the
    * benchmark — all occurrences, no keep-first — and reassemble the
    * document from its surviving tokens. Where [[ngramDecontaminate]]
    * drops whole colliding documents (GPT-3-style), this keeps the
    * document and excises only the quoted benchmark passage — the
    * right tool when a long page merely quotes an eval question.
    *
    * Scale shape: the benchmark's distinct rolling-gram hashes
    * broadcast (eval sets are small by definition); the corpus side is
    * a map-only gram probe — corpus text never shuffles for the match.
    * Coverage moves one span row per (rare) hit, interval-coalesced
    * per doc before exploding ([[graft.dedup.Dedup.coveredPositions]]),
    * then one anti-join + one doc reassembly shuffle, both
    * corpus-row-sized.
    *
    * Returns (doc_id, text, n_tokens_kept, n_tokens_removed) for every
    * corpus doc; a doc that IS benchmark text reduces to "".
    * Reassembly is single-space normalized, as in
    * [[graft.dedup.Dedup.substringDedup]].
    */
  def spanDecontaminate(corpus: DataFrame, benchmark: DataFrame,
      textCol: String, idCol: String, n: Int = 50): DataFrame = {
    import graft.dedup.Dedup
    require(n >= 2, "n must be >= 2")
    val bmGrams = Dedup.rollingGrams(
      benchmark.withColumn("__bid", lit(0L)), "__bid", textCol, n)
      .select("h").distinct()
    val covered = Dedup.coveredPositions(
      Dedup.rollingGrams(corpus, idCol, textCol, n)
        .join(broadcast(bmGrams), Seq("h"))
        .select(col("doc_id"), col("pos").as("start"),
          (col("pos") + (n - 1)).as("end")))
    Dedup.reassembleTokens(corpus, idCol, textCol, covered)
  }

  /** Sequence packing: assign each document a `seq_id`/`seq_offset`
    * placing it in a stream of fixed-capacity `seqLen`-token training
    * sequences, packed in `orderCol` order within each `shardCol`
    * shard (a document starts in the sequence its running token count
    * falls into). One running-sum window per shard — the shard column
    * bounds the sort (per-shard, not global), which is what keeps this
    * viable at corpus scale: shards (language, source bucket, date)
    * partition the sort the same way a tokenizer job would be sharded
    * anyway.
    */
  def packSequences(docs: DataFrame, shardCol: String, orderCol: String,
      tokenCountCol: Column, seqLen: Int): DataFrame = {
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
    docs
      .withColumn("__tok", tokenCountCol.cast("long"))
      .withColumn("__cum", sum(col("__tok")).over(w))
      // start-of-doc position: exact integer math (values < 2^53 so the
      // double division below is exact after floor; DuckDB's `//`
      // floor-div matches for the non-negative token counts here)
      .withColumn("seq_id",
        floor((col("__cum") - col("__tok")) / lit(seqLen.toLong)).cast("long"))
      .withColumn("seq_offset", (col("__cum") - col("__tok")) % lit(seqLen.toLong))
      .drop("__tok", "__cum")
  }

  /** Temperature-based mixture sampling — the standard LLM data-mixing
    * step (multilingual / multi-source rebalancing, temperature τ = 2,
    * i.e. α = 1/τ = 0.5): group g's share of the `budget` is
    * `sqrt(n_g) / Σ sqrt(n_g')` (up-weighting low-resource groups,
    * flattening the head), realized as a per-group Bernoulli rate
    * `min(1, budget·share / n_g)` decided by a hash of the row key —
    * deterministic at any parallelism, cluster size, and engine.
    *
    * α is fixed at 0.5 because `sqrt` is IEEE-exactly-rounded in every
    * engine while `pow(x, α)` is libm-dependent — this keeps the rate
    * table bit-identical cross-engine (the DuckDB oracle hash-matches).
    * The inclusion hash is the first 24 bits of md5(key) compared to
    * rate·2^24 — same md5-prefix trick as the decontamination
    * fingerprints, portable everywhere.
    *
    * Scale shape: one tiny groupBy (|groups| rows) + one scalar agg,
    * broadcast back; the corpus itself sees ONE map-only pass — no
    * shuffle of data rows. At 100 TB the rate table is bytes.
    */
  def mixtureSample(docs: DataFrame, groupCol: String, keyCol: Column,
      budget: Long): DataFrame =
    applyMixtureRates(docs, groupCol, keyCol,
      mixtureRates(docs, groupCol, budget))

  /** The rate table of [[mixtureSample]], exposed so rates trained on a
    * corpus snapshot can be applied elsewhere — most usefully to the
    * continuous-ingest STREAM of the same corpus (stream-static
    * broadcast join; the inclusion decision is a pure row hash, so
    * batch and stream admit identical doc sets).
    */
  def mixtureRates(docs: DataFrame, groupCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val sumW = counts.agg(sum(sqrt(col("__n"))).as("__sw"))
    counts.crossJoin(broadcast(sumW))
      .select(col(groupCol),
        least(lit(1.0),
          lit(budget.toDouble) * sqrt(col("__n")) / col("__sw") / col("__n"))
          .as("__rate"))
  }

  /** Apply a [[mixtureRates]] table to a batch OR stream: broadcast
    * join on the group column, keep rows whose 24-bit md5 prefix of
    * the key clears the group's rate. Map-only on the data side.
    */
  def applyMixtureRates(df: DataFrame, groupCol: String, keyCol: Column,
      rates: DataFrame): DataFrame = {
    val h = conv(substring(md5(keyCol.cast("string")), 1, 6), 16, 10).cast("long")
    df.join(broadcast(rates), Seq(groupCol))
      .filter(h < col("__rate") * lit(16777216.0))
      .drop("__rate")
  }

  /** Deterministic seeded corpus shuffle → fixed training shards, the
    * step between curation and the training data loader: every row
    * gets a `shard` in [0, numShards) and a `sort_key` whose
    * within-shard order IS the shuffled read order. Both derive from
    * md5(seed | key) — the corpus-order correlation a crawl has
    * (domain runs, time runs) is destroyed, any engine reproduces the
    * assignment bit-for-bit from (seed, key), and adding shards later
    * never requires a global pass.
    *
    * Deliberately NO global sort and NO per-shard window: a position
    * column via `row_number() over (partition by shard)` would funnel
    * corpus/numShards rows through one task each — at 100 TB that is
    * the q100-ntile trap. Position is instead IMPLICIT in sort order:
    * [[writeShuffledShards]] clusters by shard and sorts files by
    * `sort_key`, so the loader reads each shard's files in order and
    * gets the shuffled sequence with zero windows. The shard id is the
    * top 24 bits of the md5 mod numShards (bias ≤ numShards/2²⁴ —
    * negligible for any sane shard count).
    */
  def shuffleShards(df: DataFrame, keyCol: Column, numShards: Int,
      seed: Long): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val sortKey = md5(concat(lit(seed.toString), lit("|"), keyCol.cast("string")))
    df.withColumn("sort_key", sortKey)
      .withColumn("shard",
        conv(substring(col("sort_key"), 1, 6), 16, 10).cast("long")
          % numShards)
  }

  /** Materialize a [[shuffleShards]] corpus for the data loader: one
    * directory per shard (`shard=K/`), rows within each file in
    * `sort_key` order. One clustering shuffle total;
    * `maxRecordsPerFile` bounds file size at scale while preserving
    * the in-file order (Spark splits a sorted task output into
    * consecutive sorted files).
    */
  def writeShuffledShards(df: DataFrame, keyCol: Column, numShards: Int,
      seed: Long, path: String, maxRecordsPerFile: Long = 0L): Unit =
    shuffleShards(df, keyCol, numShards, seed)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("sort_key"))
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("shard")
      .mode("overwrite")
      .parquet(path)
}
