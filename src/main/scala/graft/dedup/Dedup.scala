package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Document deduplication at training-data scale (BASELINE north-star):
  * exact (content-hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard,
  * and embedding-cosine near-dup.
  *
  * Scale posture: exact dedup is one hash shuffle on the 16-byte content
  * key (never the document body — project the key first, join survivors
  * back if bodies are needed). The near-dup family never goes O(n²):
  * candidate pairs come from banding (LSH buckets), so the only shuffle
  * keys are short band hashes, and the quadratic blow-up is confined to
  * within-bucket joins (bucket size is controlled by band width). Only
  * the final verify (exact Jaccard / hamming / cosine) touches pairs,
  * and only candidate pairs.
  */
object Dedup {

  // ------------------------------------------------------------- exact

  /** Exact dedup by normalized content: one survivor (min id) per
    * fingerprint. Returns (fingerprint, n_copies, keep_id).
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(TextAnalysis.fingerprint(col(textCol)).as("fingerprint"), col(idCol))
      .groupBy("fingerprint")
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keep_id"))

  /** The surviving rows themselves (window formulation — single shuffle
    * on the content key, no join back).
    */
  def exactSurvivors(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(TextAnalysis.fingerprint(col(textCol)))
      .orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  // ----------------------------------------------------------- shingles

  /** Word k-shingles of the normalized text (distinct). */
  def wordShingles(text: Column, k: Int): Column = {
    val ws = TextAnalysis.words(TextAnalysis.normalizeText(text))
    array_distinct(
      transform(sequence(lit(0), size(ws) - k),
        i => concat_ws(" ", slice(ws, i + lit(1), lit(k)))))
  }

  /** Exact Jaccard of two shingle arrays (arrays already distinct). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  // ------------------------------------------------------------ MinHash

  /** MinHash signature: numPerm independent permutations approximated by
    * seeded xxhash64; element j = min over shingles of h_j(shingle).
    * Pure expression — no UDF, deterministic across cluster sizes.
    */
  def minHashSignature(shingles: Column, numPerm: Int): Column =
    transform(sequence(lit(0), lit(numPerm - 1)),
      j => array_min(transform(shingles, s => xxhash64(s, j))))

  /** MinHash+LSH near-duplicate pairs.
    *
    * shingle → signature → band (bands × rowsPerBand = numPerm) →
    * explode one row per (band, bandHash) → self-join within band →
    * distinct candidate pairs → exact-Jaccard verify ≥ threshold.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b.
    */
  def minHashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 5, bands: Int = 16, rowsPerBand: Int = 4,
      threshold: Double = 0.7): DataFrame = {
    val numPerm = bands * rowsPerBand
    val withSig = docs
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleK).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig", minHashSignature(col("shingles"), numPerm))
    val banded = withSig.select(
      col("id"), col("shingles"),
      posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(to_json(struct(b, slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand)))))))
        .as(Seq("band", "band_hash")))
    val candidates = banded.as("l")
      .join(banded.as("r"),
        col("l.band") === col("r.band") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.shingles").as("sh_a"), col("r.shingles").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    candidates
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------------------------------ SimHash

  /** 64-bit SimHash over word unigrams: bit b of the signature is the
    * sign of Σ_w (±1 per bit b of xxhash64(w)). Pure expression.
    */
  def simHash64(text: Column): Column = {
    val ws = TextAnalysis.words(TextAnalysis.normalizeText(text))
    val bitSums = transform(sequence(lit(0), lit(63)),
      b => aggregate(ws, lit(0L),
        (acc, w) => acc + when(call_function("shiftright", xxhash64(w), b).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L)))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)),
        (s, b) => when(s > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming, using
    * chunk banding (pigeonhole: distance ≤ 3 ⇒ at least one of 4
    * 16-bit chunks equal) — candidates only, then exact popcount verify.
    */
  def simHashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val sigs = docs.select(col(idCol).as("id"), simHash64(col(textCol)).as("sig"))
    val banded = sigs.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(chunks - 1)),
        c => call_function("shiftright", col("sig"), c * lit(bitsPer))
          .bitwiseAND((1L << bitsPer) - 1L))).as(Seq("chunk", "chunk_val")))
    banded.as("l")
      .join(banded.as("r"),
        col("l.chunk") === col("r.chunk") &&
          col("l.chunk_val") === col("r.chunk_val") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.sig").as("sig_a"), col("r.sig").as("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  // ------------------------------------------------- n-gram Jaccard

  /** Exact n-gram-Jaccard near-dup within blocking groups (e.g. same
    * source): the all-pairs comparison is confined to each block.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int = 3, threshold: Double = 0.15): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), col(blockCol).as("block"),
      wordShingles(col(textCol), n).as("sh"))
    sh.as("l").join(sh.as("r"),
      col("l.block") === col("r.block") && col("l.id") < col("r.id"))
      .withColumn("jaccard", jaccard(col("l.sh"), col("r.sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  // -------------------------------------------- embedding near-dup

  /** Cosine of two double arrays, computed as dot/sqrt(na·nb). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val na = aggregate(a, lit(0.0), (s, x) => s + x * x)
    val nb = aggregate(b, lit(0.0), (s, x) => s + x * x)
    dot / sqrt(na * nb)
  }

  /** Embedding-cosine near-duplicate pairs ≥ threshold. Brute-force
    * all-pairs — correct at verification scale; the 100 TB path buckets
    * candidates with [[graft.similarity.Ann.lshBuckets]] first and runs
    * this verify join per bucket.
    */
  def embeddingPairs(
      embs: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val e = embs.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    e.as("l").join(e.as("r"), col("l.id") < col("r.id"))
      .withColumn("cos", cosine(col("l.v"), col("r.v")))
      .filter(col("cos") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        round(col("cos"), 4).as("cos_sim"))
  }
}
