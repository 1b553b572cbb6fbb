package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.text.TextAnalysis

class RepetitionExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("RepetitionCounts matches the relational explode formulation exactly") {
    // random docs from a tiny vocab → plenty of repeated words/bigrams
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "dd", "ee")
    val docs = (1 to 60).map { i =>
      val n = 1 + rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")

    val kernel = TextAnalysis.repetitionProfile(docs, "doc_id", "text")
      .as[(Long, Int, Int, Double, Double, Double)].collect().sortBy(_._1).toSeq

    // relational reference: explode words / bigrams, two groupBys each
    val ws = docs.select($"doc_id",
      split(trim(lower($"text")), "\\s+").as("ws"))
    val wc = ws.select($"doc_id", explode($"ws").as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").cast("int").as("n_words"),
        count(lit(1)).cast("int").as("n_distinct"),
        max("c").cast("int").as("top_word"))
    val bc = ws.filter(size($"ws") >= 2)
      .select($"doc_id", explode(transform(sequence(lit(0), size($"ws") - 2),
        i => concat_ws(" ", element_at($"ws", i + 1), element_at($"ws", i + 2))))
        .as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").cast("int").as("top_bigram"))
    val ref = wc.join(bc, Seq("doc_id"), "left")
      .select($"doc_id", $"n_words", $"n_distinct",
        ($"top_word".cast("double") / $"n_words").as("twr"),
        (($"n_words" - $"n_distinct").cast("double") / $"n_words").as("dwf"),
        when($"n_words" < 2, lit(0.0))
          .otherwise(coalesce($"top_bigram", lit(0)).cast("double")
            / ($"n_words" - 1)).as("tbr"))
      .as[(Long, Int, Int, Double, Double, Double)].collect().sortBy(_._1).toSeq

    assert(kernel === ref)
  }

  test("graft_repetition / graft_minhash / graft_simhash register as SQL functions") {
    GraftFunctions.register(spark)
    Seq((1L, "a a b")).toDF("id", "text").createOrReplaceTempView("rep_docs")
    val r = spark.sql(
      """SELECT graft_repetition(split(text, ' ')) AS r,
        |       graft_minhash(split(text, ' '), 4) AS mh,
        |       graft_simhash(split(text, ' ')) AS sh
        |FROM rep_docs""".stripMargin).head()
    assert(r.getStruct(0).getInt(0) === 3) // n_words
    assert(r.getStruct(0).getInt(2) === 2) // top_word
    assert(r.getSeq[Long](1).length === 4)
    // SQL surface must agree with the library surface
    val lib = Seq("a a b").toDF("text")
      .select(graft.functions.MinHashExpressions
        .minhashSig(split($"text", " "), 4).as("mh")).head().getSeq[Long](0)
    assert(r.getSeq[Long](1) === lib)
  }

  test("RepetitionKernel interpreted path agrees with hand counts") {
    def arr(ws: String*) =
      new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any])
    val r = RepetitionKernel.compute(arr("a", "a", "b", "a", "b"))
    // words: a=3 b=2 → top 3; bigrams: aa, ab, ba, ab → top "ab"=2
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) === ((5, 2, 3, 2)))
    assert(RepetitionKernel.compute(new GenericArrayData(Array.empty[Any])) === null)
  }
}
