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
}
