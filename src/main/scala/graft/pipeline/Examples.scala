package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Training-example generation: the step after curation that turns a
  * clean corpus into model-ready examples. First member: BERT-style
  * masked-language-model corruption (Devlin et al. 2018 §3.1 — the
  * 15% / 80-10-10 rule), made FULLY deterministic so the examples are
  * reproducible across runs, engines and partitionings.
  *
  * Determinism design: every per-position decision is a pure function
  * of (tag, doc_id, pos) through Spark's `xxhash64` over a STRING key
  * — no RNG state, no partition-order dependence. The three decision
  * streams (mask?, which corruption, which replacement token) use
  * distinct tag prefixes of one hash family rather than bit-slices of
  * one hash, so each is uniform and independently replayable; the
  * DuckDB oracle replays the exact same hashes (DuckDbXxHash), making
  * the whole example set hash-gateable.
  *
  * Scale posture: tokenize + hash decisions are map-only; the only
  * shuffles are the bounded vocabulary build (distinct tokens —
  * tokenizer-artifact-sized by definition, same class as the BPE/
  * WordPiece vocab artifacts) and none on the corpus itself. The
  * replacement-token lookup joins the ~1.5% random-corruption rows
  * against the broadcast vocab.
  */
object Examples {

  /** Masked positions of the corpus under the MLM corruption rule:
    * (doc_id, pos, orig_token, input_token, action) for every selected
    * position — `action` ∈ mask (→ `maskToken`), random (→ a hash-
    * chosen vocabulary token), keep (original survives but is still a
    * prediction target). Non-selected positions pass through the model
    * input unchanged and are omitted here.
    *
    * `maskRateFp` is the selection threshold in 1e-6 units (150000 =
    * the canonical 15%); the 80/10/10 split among selected positions is
    * fixed per the paper.
    */
  def mlmMask(docs: DataFrame, idCol: String, textCol: String,
      seedTag: String = "mlm", maskRateFp: Long = 150000L,
      maskToken: String = "[MASK]"): DataFrame = {
    require(maskRateFp >= 0 && maskRateFp <= 1000000L,
      s"maskRateFp is 1e-6 units in [0, 1000000], got $maskRateFp")
    val toks = docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.words(TextAnalysis.normalizeText(
          coalesce(col(textCol), lit(""))))).as(Seq("pos", "tok")))
      .filter(length(col("tok")) > 0)
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))

    def decision(tag: String) = xxhash64(
      concat(lit(s"${seedTag}_$tag:"), col("doc_id"), lit(":"), col("pos")))

    // bounded artifact: the corpus vocabulary with stable dense ids
    // (sorted order), built once; the count pins the modulus
    val vocab = toks.select(col("tok").as("vtok")).distinct()
      .withColumn("vidx",
        row_number().over(Window.orderBy(col("vtok"))).cast("long") - 1L)
    val vocabSize = vocab.count()

    val selected = toks
      .filter(pmod(decision("m"), lit(1000000L)) < maskRateFp)
      .withColumn("act", pmod(decision("a"), lit(10L)))
      .withColumn("ridx", pmod(decision("r"), lit(vocabSize)))
    selected
      .join(broadcast(vocab), selected("ridx") === vocab("vidx"), "left_outer")
      .select(col("doc_id"), col("pos"), col("tok").as("orig_token"),
        when(col("act") < 8, lit(maskToken))
          .when(col("act") === 8, col("vtok"))
          .otherwise(col("tok")).as("input_token"),
        when(col("act") < 8, lit("mask"))
          .when(col("act") === 8, lit("random"))
          .otherwise(lit("keep")).as("action"))
  }
}
