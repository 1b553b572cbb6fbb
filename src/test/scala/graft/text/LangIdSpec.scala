package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[LangId]] — char-trigram language identification (q199): planted
  * real-language accuracy, the frozen-profile determinism contract,
  * OOV behavior, tie-break, and the no-trigram `und` verdict.
  */
class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    ("en", "the quick brown fox jumps over the lazy dog and then " +
      "the dog sleeps while the fox runs through the green fields"),
    ("en", "this is another english sentence with the usual words " +
      "that english writers use all the time in their texts"),
    ("de", "der schnelle braune fuchs springt über den faulen hund " +
      "und dann schläft der hund während der fuchs weiter läuft"),
    ("de", "dies ist ein weiterer deutscher satz mit den üblichen " +
      "wörtern die deutsche schreiber ständig verwenden"),
    ("fr", "le renard brun rapide saute par dessus le chien " +
      "paresseux et puis le chien dort pendant que le renard court"),
    ("fr", "ceci est une autre phrase française avec les mots " +
      "habituels que les écrivains français utilisent"))
    .toDF("lang", "text")

  private def profiles = LangId.trainProfiles(train, "text", "lang",
    topN = 200)

  test("planted real-language texts classify correctly") {
    val docs = Seq(
      (1L, "the brown dog runs through the fields"),
      (2L, "der braune hund läuft durch die felder"),
      (3L, "le chien brun court dans les champs"))
      .toDF("doc_id", "text")
    val got = LangId.classify(docs, "doc_id", "text", profiles)
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "en", 2L -> "de", 3L -> "fr"))
  }

  test("frozen profiles are deterministic and language-sorted") {
    val p1 = profiles
    val p2 = profiles
    assert(p1.langs.map(_._1) === Seq("de", "en", "fr"))
    assert(p1.langs === p2.langs)
    // scores are negative log-likelihoods (ln of a proper fraction)
    p1.langs.foreach { case (_, m) =>
      assert(m.nonEmpty && m.values.forall(_ < 0))
    }
  }

  test("no-trigram docs verdict 'und'; all-OOV text scores pure penalty") {
    val docs = Seq((1L, ""), (2L, "ab"), (3L, null.asInstanceOf[String]),
      (4L, "zzzzz")).toDF("doc_id", "text")
    val got = LangId.classify(docs, "doc_id", "text", profiles,
      oovFp = -100L)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got(1L) === (("und", 0L)))
    assert(got(2L) === (("und", 0L))) // 2 chars: below trigram length
    assert(got(3L) === (("und", 0L)))
    // "zzzzz": 3 trigrams, none in any profile -> every language
    // scores 3·(-100); tie breaks to the ascending-first language
    assert(got(4L) === (("de", -300L)))
  }

  test("classify is map-only: no exchange in the plan") {
    val docs = Seq((1L, "the dog")).toDF("doc_id", "text")
    val plan = LangId.classify(docs, "doc_id", "text", profiles)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle in classify plan:\n$plan")
  }
}
