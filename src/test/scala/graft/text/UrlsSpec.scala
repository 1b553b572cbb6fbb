package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(Urls.canonicalizeUrl($"url")).as[String]
      .collect().toSeq

  test("canonicalizeUrl strips scheme, www, default ports, fragments") {
    assert(canon(
      "HTTPS://WWW.Example.COM/a",
      "http://example.com:80/a",
      "https://example.com:443/a#frag",
      "example.com/a") === Seq.fill(4)("example.com/a"))
  }

  test("canonicalizeUrl preserves path case, strips trailing slashes") {
    assert(canon("https://example.com/Docs/X/", "https://example.com/Docs/X")
      === Seq("example.com/Docs/X", "example.com/Docs/X"))
    // root path collapses to bare host
    assert(canon("https://example.com/", "https://example.com")
      === Seq("example.com", "example.com"))
  }

  test("canonicalizeUrl drops tracking params, sorts the rest, drops empty query") {
    assert(canon("https://e.com/p?utm_source=x&b=2&a=1&fbclid=z&gclid=1&msclkid=2&ref=rss")
      === Seq("e.com/p?a=1&b=2"))
    assert(canon("https://e.com/p?utm_only=1") === Seq("e.com/p"))
    // non-default port and a param named utm (no underscore-suffix rule
    // match must be exact-prefix): kept
    assert(canon("https://e.com:8080/p?utm_x=1&utmx=2")
      === Seq("e.com:8080/p?utmx=2"))
  }

  test("canonicalizeUrl is idempotent") {
    val raw = Seq(
      "HTTPS://WWW.Example.COM/docs/7/?utm_source=feed&id=7#top",
      "http://a.b.co:80/X/?z=1&a=2",
      "e.com/p?ref=x",
      "nodots")
    val once = canon(raw: _*)
    assert(canon(once: _*) === once)
  }

  test("registrableDomain handles ccSLDs, bare hosts, dotless hosts") {
    val d = Seq("a.b.example.com", "x.bbc.co.uk", "host.com", "localhost", "a.b.co")
      .toDF("h").select(Urls.registrableDomain($"h")).as[String].collect().toSeq
    assert(d === Seq("example.com", "bbc.co.uk", "host.com", "localhost", "b.co"))
  }

  test("urlDedup elects the min-id owner per canonical group") {
    val crawls = Seq(
      (10L, "https://www.e.com/p?utm_a=1"),
      (3L, "http://e.com/p/"),
      (7L, "E.COM/p"), // schemeless, host case — same canonical
      (5L, "https://other.com/q")).toDF("crawl_id", "url")
    val got = Urls.urlDedup(crawls, "crawl_id", "url")
      .as[(String, Long, Long)].collect().map { case (k, v, n) => k -> ((v, n)) }.toMap
    assert(got("e.com/p") === ((3L, 3L)))
    assert(got("other.com/q") === ((5L, 1L)))
  }

  test("domainCap keeps at most cap docs per domain, deterministically") {
    val docs = (1L to 20L).map { i =>
      val host = if (i <= 12) "hot.com" else s"cold$i.org"
      (i, s"https://$host/p/$i")
    }.toDF("doc_id", "url")
    val kept = Urls.domainCap(docs, "doc_id", "url", cap = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    // hot.com capped at 3; each coldN.org is its own domain, all survive
    assert(kept.length === 3 + 8)
    assert((13L to 20L).forall(kept.contains))
    // deterministic: same seed → same survivors; different seed → same
    // counts (selection changes, the cap does not)
    val again = Urls.domainCap(docs, "doc_id", "url", cap = 3)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again === kept)
    val other = Urls.domainCap(docs, "doc_id", "url", cap = 3, seed = 7L)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(other.length === kept.length)
  }

  test("domainCap plan gets the WindowGroupLimit map-side rewrite") {
    val docs = (1L to 100L).map(i => (i, s"https://hot.com/p/$i"))
      .toDF("doc_id", "url")
    val capped = Urls.domainCap(docs, "doc_id", "url", cap = 5)
    capped.collect()
    val plan = capped.queryExecution.executedPlan.toString
    // the hot-domain scale posture rests on this rewrite (partial
    // group-limit BEFORE the exchange) — fail loudly if a planner
    // change ever drops it
    assert(plan.contains("WindowGroupLimit"),
      s"expected InferWindowGroupLimit to fire, plan was:\n$plan")
  }

  test("domainTopK keeps the k best-scoring docs per domain, id breaks ties") {
    val docs = (1L to 20L).map { i =>
      val host = if (i <= 12) "hot.com" else s"cold$i.org"
      // score descends with id on hot.com, so the best 3 are ids 1..3
      (i, s"https://$host/p/$i", (100L - i).toDouble)
    }.toDF("doc_id", "url", "score")
    val kept = Urls.domainTopK(docs, "doc_id", "url", k = 3, col("score"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept === ((1L to 3L) ++ (13L to 20L)).sorted)
    // ties: equal scores fall back to ascending id
    val tied = (1L to 5L).map(i => (i, "https://t.com/p", 1.0))
      .toDF("doc_id", "url", "score")
    val tk = Urls.domainTopK(tied, "doc_id", "url", k = 2, col("score"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(tk === Seq(1L, 2L))
  }

  test("domainTopK keeps the WindowGroupLimit rewrite on a hot domain") {
    val docs = (1L to 200L).map(i => (i, s"https://hot.com/p/$i", i.toDouble))
      .toDF("doc_id", "url", "score")
    val kept = Urls.domainTopK(docs, "doc_id", "url", k = 5, col("score"))
    kept.collect()
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected InferWindowGroupLimit to fire, plan was:\n$plan")
  }

  test("domainStats rolls up docs and distinct URLs per registrable domain") {
    val docs = Seq(
      "https://a.e.com/1", "https://b.e.com/1", "https://a.e.com/1?utm_x=2",
      "https://x.co.uk/1").toDF("url")
    val got = Urls.domainStats(docs, "url")
      .as[(String, Long, Long)].collect().map { case (k, a, b) => k -> ((a, b)) }.toMap
    // a.e.com/1 appears twice (tracking param collapses) but is ONE url
    assert(got("e.com") === ((3L, 2L)))
    assert(got("x.co.uk") === ((1L, 1L)))
  }
}
