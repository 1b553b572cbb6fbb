package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PSL algorithm over the checked-in snapshot: every rule form (exact
  * 2/3-label, TLD and 2-label wildcards, both exception classes,
  * default rule), the pass-through edges, and the private-suffix class
  * the heuristic gets wrong.
  */
class PublicSuffixSpec extends SparkSpec {
  import spark.implicits._

  private def dom(hosts: String*): Seq[String] =
    hosts.toDF("h")
      .select(PublicSuffix.registrableDomain(col("h")))
      .as[String].collect().toSeq

  test("exact 2-label rules (ccSLDs)") {
    assert(dom("news.bbc.co.uk", "bbc.co.uk", "a.b.example.com.au") ==
      Seq("bbc.co.uk", "bbc.co.uk", "example.com.au"))
  }

  test("private hosted-platform suffixes keep per-site groups") {
    assert(dom("alice.github.io", "bob.github.io", "deep.alice.github.io",
      "myblog.blogspot.com") ==
      Seq("alice.github.io", "bob.github.io", "alice.github.io",
        "myblog.blogspot.com"))
    // the heuristic merges these — the exact failure PSL mode fixes
    assert(Seq("alice.github.io", "bob.github.io").toDF("h")
      .select(Urls.registrableDomain(col("h"))).as[String].collect().toSet ==
      Set("github.io"))
  }

  test("exact 3-label rule (s3.amazonaws.com)") {
    assert(dom("bucket.s3.amazonaws.com", "s3.amazonaws.com") ==
      Seq("bucket.s3.amazonaws.com", "s3.amazonaws.com"))
  }

  test("TLD wildcard *.ck with !www.ck exception") {
    assert(dom("x.shop.ck", "shop.ck", "www.ck", "a.www.ck") ==
      Seq("x.shop.ck", "shop.ck", "www.ck", "www.ck"))
  }

  test("2-label wildcard *.kawasaki.jp with !city.kawasaki.jp exception") {
    assert(dom("a.b.kawasaki.jp", "b.kawasaki.jp",
      "city.kawasaki.jp", "x.city.kawasaki.jp") ==
      Seq("a.b.kawasaki.jp", "b.kawasaki.jp",
        "city.kawasaki.jp", "city.kawasaki.jp"))
  }

  test("round-10 expanded snapshot: prefectures, US locality, .bg singles, dyn-DNS") {
    // Japanese prefecture exact-2 rules (all 47 checked in)
    assert(dom("shinjuku.tokyo.jp", "a.shinjuku.tokyo.jp", "tokyo.jp") ==
      Seq("shinjuku.tokyo.jp", "shinjuku.tokyo.jp", "tokyo.jp"))
    // US locality hierarchy: state 2-label + k12 3-label suffixes
    assert(dom("smith.ca.us", "school.k12.ca.us", "x.school.k12.ca.us") ==
      Seq("smith.ca.us", "school.k12.ca.us", "school.k12.ca.us"))
    // .bg single-character suffixes
    assert(dom("site.a.bg", "site.7.bg") == Seq("site.a.bg", "site.7.bg"))
    // dyn-DNS + storefront private suffixes: per-operator groups
    assert(dom("myhome.duckdns.org", "other.duckdns.org",
      "shop.myshopify.com") ==
      Seq("myhome.duckdns.org", "other.duckdns.org", "shop.myshopify.com"))
    // snapshot is materially larger than the pre-round-10 subset and
    // every rule class is populated
    assert(PublicSuffix.rules.size > 600)
  }

  test("default rule and pass-through edges") {
    assert(dom("deep.sub.example.com", "example.com", "localhost", "") ==
      Seq("example.com", "example.com", "localhost", ""))
  }

  test("parse: published file format — comments, blanks, case, rejects") {
    val parsed = PublicSuffix.parse(Seq(
      "// ===BEGIN ICANN DOMAINS===",
      "",
      "com", "CO.UK  trailing junk", "*.ck", "!www.ck",
      "// a comment"))
    assert(parsed === Seq("com", "co.uk", "*.ck", "!www.ck"))
    // 3-label wildcard bases are in scope; 4+ rejected
    assert(PublicSuffix.parse(Seq("*.compute.amazonaws.com")) ===
      Seq("*.compute.amazonaws.com"))
    intercept[IllegalArgumentException] {
      PublicSuffix.parse(Seq("*.a.b.c.d"))
    }
    intercept[IllegalArgumentException] {
      PublicSuffix.parse(Seq("!a.b.c.d"))
    }
  }

  test("3-label wildcard *.compute.amazonaws.com: per-region suffixes") {
    assert(dom(
      "vm1.eu-west-1.compute.amazonaws.com",
      "a.vm1.eu-west-1.compute.amazonaws.com",
      "eu-west-1.compute.amazonaws.com",   // IS a public suffix → pass-through
      "compute.amazonaws.com",             // no * label → only the default rule
      "bucket.s3.amazonaws.com") ==
      Seq("vm1.eu-west-1.compute.amazonaws.com",
        "vm1.eu-west-1.compute.amazonaws.com",
        "eu-west-1.compute.amazonaws.com",
        "amazonaws.com",
        "bucket.s3.amazonaws.com"))
  }

  test("DuckDB CASE generator uses the same rule sets") {
    val sql = PublicSuffix.duckDbCase("h", "hp", "hn")
    // every parsed set is represented
    assert(sql.contains("'co.uk'"))
    assert(sql.contains("'s3.amazonaws.com'"))
    assert(sql.contains("'kawasaki.jp'"))
    assert(sql.contains("'city.kawasaki.jp'"))
    assert(sql.contains("'www.ck'"))
    assert(sql.contains("'ck'"))
    assert(sql.contains("'github.io'"))
  }
}
