package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public-Suffix-List-backed registrable-domain extraction.
  *
  * [[Urls.registrableDomain]] is a last-two-labels heuristic (plus a
  * small ccSLD allowance) — adequate for TLD-ish hosts but wrong for
  * the *private* suffix class: every `user.github.io` site collapses
  * into one `github.io` group, so a domain cap or per-domain stats
  * would treat a million independent sites as one publisher. This
  * object implements the real PSL algorithm (publicsuffix.org/list —
  * longest matching rule wins; `*.x` wildcard rules; `!y.x` exception
  * rules; registrable domain = public suffix + one label) over a
  * CHECKED-IN snapshot of the list.
  *
  * The snapshot below is a curated SUBSET of the published list (the
  * full file is ~9k rules): all the high-traffic ICANN ccSLD families
  * plus the major private-suffix hosters. Swapping in the complete
  * list is a data change only — paste the rules into [[rules]] (same
  * syntax as the published file, or feed the file's lines to
  * [[parse]]) and every consumer picks it up; the matching algorithm
  * handles exact rules of 2–3 labels, wildcard bases of 1–3 labels
  * (`*.compute.amazonaws.com` included) and exceptions of 2–3 labels
  * — anything beyond is rejected loudly at parse time.
  *
  * Scale shape: the rule sets become codegen'd `InSet` hash lookups
  * inside ONE map-only expression — no join, no shuffle, no UDF; a
  * full-list swap (~9k strings) stays a broadcast-free plan because
  * literal InSet membership ships with the plan itself.
  *
  * Matching is longest-rule-first over the host's trailing labels:
  *   1. 3-label exception  → registrable = those 3 labels
  *   2. 2-label exception  → registrable = those 2 labels
  *   3. 3-label exact rule OR 2-label wildcard base → public suffix is
  *      3 labels; registrable = 4 trailing labels (host itself if it
  *      IS the suffix — pass-through, mirroring the heuristic)
  *   4. 2-label exact rule OR 1-label wildcard base → public suffix is
  *      2 labels; registrable = 3 trailing labels
  *   5. default rule `*` → public suffix is the TLD; registrable =
  *      last 2 labels
  * Hosts with no dot (or empty) pass through unchanged.
  */
object PublicSuffix {

  /** Snapshot rules, in the published list's own syntax. Sources: the
    * ICANN section's ccSLD families and the private section's hosted-
    * platform entries (publicsuffix.org/list/public_suffix_list.dat).
    *
    * This build runs with zero egress, so the snapshot is a curated
    * high-confidence subset rather than the verbatim ~9k-line file:
    * every high-traffic ccSLD family, all 47 Japanese prefecture
    * domains + the city wildcards, the US state / k12 / lib hierarchy,
    * the .bg single-character rules, and the major private-suffix
    * hosters (pages/apps/dyn-DNS). [[parse]] + the matcher accept the
    * complete published file unchanged — pasting it in is a data-only
    * swap (1-label exact rules like `com` are equivalent to the
    * default `*` rule and are harmlessly subsumed by it).
    */
  /** All 47 Japanese prefectures — each `<pref>.jp` is an exact
    * 2-label public suffix in the ICANN section.
    */
  private val jpPrefectures: Seq[String] = Seq(
    "hokkaido", "aomori", "iwate", "miyagi", "akita", "yamagata",
    "fukushima", "ibaraki", "tochigi", "gunma", "saitama", "chiba",
    "tokyo", "kanagawa", "niigata", "toyama", "ishikawa", "fukui",
    "yamanashi", "nagano", "gifu", "shizuoka", "aichi", "mie", "shiga",
    "kyoto", "osaka", "hyogo", "nara", "wakayama", "tottori", "shimane",
    "okayama", "hiroshima", "yamaguchi", "tokushima", "kagawa", "ehime",
    "kochi", "fukuoka", "saga", "nagasaki", "kumamoto", "oita",
    "miyazaki", "kagoshima", "okinawa").map(_ + ".jp")

  /** US locality hierarchy: every state code is a public suffix, and
    * the k12/cc/lib networks under the large states are their own
    * 3-label suffixes.
    */
  private val usStates: Seq[String] = Seq(
    "al", "ak", "az", "ar", "ca", "co", "ct", "de", "dc", "fl", "ga",
    "hi", "id", "il", "in", "ia", "ks", "ky", "la", "me", "md", "ma",
    "mi", "mn", "ms", "mo", "mt", "ne", "nv", "nh", "nj", "nm", "ny",
    "nc", "nd", "oh", "ok", "or", "pa", "ri", "sc", "sd", "tn", "tx",
    "ut", "vt", "va", "wa", "wv", "wi", "wy")
  private val usLocality: Seq[String] =
    usStates.map(_ + ".us") ++
      Seq("ca", "ny", "tx", "fl", "il", "pa", "oh", "ga", "nc", "mi",
        "wa", "ma", "va", "nj", "az").map(s => s"k12.$s.us") ++
      Seq("ca", "ny", "tx").flatMap(s => Seq(s"cc.$s.us", s"lib.$s.us"))

  /** .bg registers single ASCII letters/digits as public suffixes. */
  private val bgSingles: Seq[String] =
    (('a' to 'z') ++ ('0' to '9')).map(c => s"$c.bg")

  val rules: Seq[String] = jpPrefectures ++ usLocality ++ bgSingles ++ Seq(
    // ---- ICANN ccSLDs (exact 2-label) ----
    "co.uk", "org.uk", "me.uk", "ltd.uk", "plc.uk", "net.uk", "sch.uk",
    "ac.uk", "gov.uk", "nhs.uk", "police.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "gen.nz", "geek.nz", "maori.nz",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "blog.br", "eco.br",
    "co.in", "net.in", "org.in", "gov.in", "ac.in", "res.in", "edu.in",
    "firm.in", "gen.in", "ind.in",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar", "int.ar", "mil.ar",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "gen.tr",
    "web.tr", "bel.tr", "biz.tr", "info.tr",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    "co.il", "net.il", "org.il", "gov.il", "ac.il", "muni.il", "idf.il",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my", "name.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "int.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn", "ac.vn",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg", "eun.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa",
    "pub.sa", "sch.sa",
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk", "biz.pk",
    "web.pk", "fam.pk",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng", "sch.ng",
    "name.ng", "mobi.ng",
    "co.id", "or.id", "go.id", "ac.id", "sch.id", "web.id", "my.id",
    "biz.id", "net.id", "mil.id", "desa.id", "ponpes.id",
    "com.co", "net.co", "org.co", "gov.co", "edu.co", "mil.co",
    "nom.co", "info.co", "web.co",
    "com.pe", "net.pe", "org.pe", "gob.pe", "edu.pe", "mil.pe", "nom.pe",
    "com.ve", "net.ve", "org.ve", "gob.ve", "edu.ve", "mil.ve",
    "web.ve", "info.ve", "co.ve",
    "co.th", "in.th", "or.th", "go.th", "ac.th", "net.th", "mi.th",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "biz.pl",
    "co.at", "or.at", "ac.at", "gv.at", "priv.at",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "org.pt", "net.pt", "publ.pt",
    "int.pt", "nome.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "co.ke", "ne.ke", "or.ke", "go.ke", "ac.ke", "sc.ke", "info.ke",
    "me.ke", "mobi.ke",
    "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca", "gc.ca",
    "gov.ie",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro",
    "rec.ro", "arts.ro", "firm.ro", "store.ro", "www.ro",
    "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru", "test.ru",
    "priv.no", "mil.no", "stat.no", "dep.no", "kommune.no", "herad.no",
    "idrett.no", "museum.no", "vgs.no", "fhs.no", "folkebibl.no",
    "fylkesbibl.no",
    "co.hu", "org.hu", "info.hu", "priv.hu", "sport.hu", "tm.hu",
    "film.hu", "news.hu", "shop.hu", "suli.hu", "city.hu", "hotel.hu",
    "media.hu", "forum.hu", "games.hu",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "gov.it", "edu.it",
    "ac.be",
    "co.cl", "gob.cl", "gov.cl", "mil.cl",
    "com.ec", "net.ec", "org.ec", "edu.ec", "gob.ec", "mil.ec",
    "fin.ec", "med.ec", "pro.ec", "info.ec",
    "com.uy", "edu.uy", "gub.uy", "net.uy", "mil.uy", "org.uy",
    "com.py", "edu.py", "gov.py", "org.py", "net.py", "mil.py", "coop.py",
    "com.bo", "net.bo", "org.bo", "gob.bo", "edu.bo", "mil.bo", "int.bo",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt", "org.gt",
    "ac.cr", "co.cr", "ed.cr", "fi.cr", "go.cr", "or.cr", "sa.cr",
    "com.do", "edu.do", "gob.do", "gov.do", "net.do", "org.do",
    "mil.do", "sld.do", "art.do", "web.do",
    "com.lk", "org.lk", "edu.lk", "ngo.lk", "soc.lk", "web.lk",
    "ltd.lk", "gov.lk", "sch.lk", "net.lk", "int.lk", "grp.lk",
    "co.tz", "ac.tz", "go.tz", "or.tz", "ne.tz", "sc.tz",
    "co.ug", "ac.ug", "sc.ug", "go.ug", "ne.ug", "or.ug",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "co.zw", "ac.zw", "gov.zw", "mil.zw", "org.zw",
    "co.ma", "net.ma", "gov.ma", "org.ma", "ac.ma", "press.ma",
    "com.tn", "gov.tn", "net.tn", "org.tn",
    "com.dz", "gov.dz", "org.dz", "net.dz", "edu.dz", "asso.dz", "art.dz",
    "com.et", "gov.et", "org.et", "edu.et", "net.et", "biz.et",
    "name.et", "info.et",
    "co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae", "mil.ae",
    "com.qa", "edu.qa", "gov.qa", "mil.qa", "name.qa", "net.qa",
    "org.qa", "sch.qa",
    "com.kw", "edu.kw", "emb.kw", "gov.kw", "ind.kw", "net.kw", "org.kw",
    "co.om", "com.om", "edu.om", "gov.om", "med.om", "museum.om",
    "net.om", "org.om", "pro.om",
    "com.jo", "org.jo", "net.jo", "edu.jo", "sch.jo", "gov.jo",
    "mil.jo", "name.jo",
    "com.lb", "edu.lb", "gov.lb", "net.lb", "org.lb",
    "ac.ir", "co.ir", "gov.ir", "id.ir", "net.ir", "org.ir", "sch.ir",
    "gov.iq", "edu.iq", "mil.iq", "com.iq", "org.iq", "net.iq",
    "org.kz", "edu.kz", "net.kz", "gov.kz", "mil.kz", "com.kz",
    "co.uz", "com.uz", "net.uz", "org.uz",
    "com.az", "net.az", "int.az", "gov.az", "org.az", "edu.az",
    "info.az", "pp.az", "mil.az", "name.az", "pro.az", "biz.az",
    "com.ge", "edu.ge", "gov.ge", "org.ge", "mil.ge", "net.ge", "pvt.ge",
    "com.am", "net.am", "org.am",
    "com.by", "gov.by", "mil.by", "of.by",
    "com.ee", "org.ee", "edu.ee", "gov.ee", "pri.ee",
    "com.lv", "edu.lv", "gov.lv", "org.lv", "mil.lv", "id.lv",
    "net.lv", "asn.lv", "conf.lv",
    "gov.lt",
    "com.hr", "iz.hr", "from.hr", "name.hr",
    "co.rs", "org.rs", "edu.rs", "ac.rs", "gov.rs", "in.rs",
    "ac.cy", "com.cy", "gov.cy", "net.cy", "org.cy", "ltd.cy",
    "com.mt", "edu.mt", "net.mt", "org.mt",
    "net.is", "com.is", "edu.is", "gov.is", "org.is", "int.is",
    "com.ua", "kiev.ua", "lviv.ua", "kharkov.ua", "odessa.ua",
    "poltava.ua", "vinnica.ua",
    "wroclaw.pl", "krakow.pl", "katowice.pl", "lublin.pl", "lodz.pl",
    "poznan.pl", "gda.pl", "gdansk.pl", "slupsk.pl", "szczecin.pl",
    "torun.pl", "warszawa.pl", "mazowsze.pl",
    // ---- ICANN wildcard TLDs ----
    "*.bd", "*.ck", "*.er", "*.fk", "*.jm", "*.kh", "*.mm", "*.np", "*.pg",
    "!www.ck",
    // ---- ICANN 2-label wildcards (Japanese city domains) ----
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    // ---- private section (hosted platforms — the class the heuristic
    //      merges into one group) ----
    "github.io", "githubusercontent.com", "gitlab.io", "bitbucket.io",
    "blogspot.com", "appspot.com", "herokuapp.com", "netlify.app",
    "vercel.app", "web.app", "firebaseapp.com", "wordpress.com",
    "pages.dev", "workers.dev", "fly.dev", "onrender.com",
    "readthedocs.io", "neocities.org", "azurewebsites.net",
    "cloudfront.net", "glitch.me", "repl.co", "surge.sh",
    "pythonanywhere.com", "sourceforge.io", "wixsite.com",
    "ngrok.io", "shinyapps.io", "hf.space", "deno.dev", "supabase.co",
    "streamlit.app",
    "myshopify.com", "webflow.io", "carrd.co", "notion.site", "now.sh",
    "csb.app", "jimdosite.com", "elasticbeanstalk.com", "amplifyapp.com",
    "trycloudflare.com", "r2.dev", "000webhostapp.com", "mybluemix.net",
    "run.app", "cloudfunctions.net", "onmicrosoft.com",
    // dynamic-DNS families (each hostname is an independent operator)
    "duckdns.org", "ddns.net", "hopto.org", "zapto.org", "sytes.net",
    "no-ip.biz", "no-ip.info", "no-ip.org", "dynu.net",
    "s3.amazonaws.com",
    // 3-label wildcard bases (each EC2-region host is its own public
    // suffix: customer VMs under one region must not share a domain
    // group)
    "*.compute.amazonaws.com", "*.compute-1.amazonaws.com")

  private def labelCount(r: String): Int = r.count(_ == '.') + 1

  /** Parse rules from the published file format
    * (publicsuffix.org/list/public_suffix_list.dat): one rule per
    * line; `//` comment lines and blank lines ignored; everything
    * after the first whitespace on a rule line dropped (the published
    * file has none, but the spec allows it); rules lowercased. Rules
    * beyond this implementation's matcher — wildcard bases of 4+
    * labels or exceptions of 4+ labels — are REJECTED loudly rather
    * than silently mis-matched;
    * extend the matcher's branch chain before ingesting a list that
    * carries them. This is what makes the full-file swap a data
    * change: paste the file into a resource and feed its lines here.
    */
  def parse(lines: IterableOnce[String]): Seq[String] = {
    val rules = lines.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(l => l.split("\\s+")(0).toLowerCase(java.util.Locale.ROOT))
      .toSeq
    val badWild = rules.filter(r => r.startsWith("*.") && labelCount(r.drop(2)) > 3)
    val badExc = rules.filter(r => r.startsWith("!") && labelCount(r.drop(1)) > 3)
    require(badWild.isEmpty && badExc.isEmpty,
      s"unsupported PSL rules (extend the matcher first): " +
        s"wildcards ${badWild.take(5)} exceptions ${badExc.take(5)}")
    rules
  }

  /** Build a matcher for an arbitrary rule set — THE production
    * swap-in hook for the full published list (this build runs with
    * zero egress, so the checked-in [[rules]] are a curated subset):
    *
    * {{{
    * val full = PublicSuffix.matcher(
    *   scala.io.Source.fromFile("public_suffix_list.dat").getLines())
    * Urls.domainStats(docs, "url", domainOf = full.registrableDomain)
    * }}}
    *
    * Every `Urls` operator takes the `domainOf` hook; oracle
    * generation stays in lockstep through [[Matcher.duckDbCase]].
    */
  def matcher(lines: IterableOnce[String]): Matcher =
    new Matcher(parse(lines))

  /** The snapshot-backed default matcher. */
  val snapshot: Matcher = new Matcher(rules)

  /** Registrable domain under the CHECKED-IN SNAPSHOT rules — a
    * curated subset of the published ~9k-rule file (zero-egress
    * build). Hosts whose public suffix is missing from the snapshot
    * fall through to the default `*` rule (last two labels) — for
    * production crawls, load the full file via [[matcher]] and pass
    * its `registrableDomain` as the `domainOf` hook instead.
    */
  def registrableDomain(host: Column): Column =
    snapshot.registrableDomain(host)

  /** DuckDB replay of the snapshot matcher; see
    * [[Matcher.duckDbCase]]. */
  def duckDbCase(host: String, parts: String, n: String): String =
    snapshot.duckDbCase(host, parts, n)
}

/** PSL matcher over one concrete rule set: the derived per-class rule
  * sets plus the Spark expression and its DuckDB replay, guaranteed
  * generated from the SAME rules so engine and oracle can never
  * drift. Construct via [[PublicSuffix.matcher]] (published-file
  * lines) or use [[PublicSuffix.snapshot]].
  */
final class Matcher(val ruleList: Seq[String]) {
  private def labelCount(r: String): Int = r.count(_ == '.') + 1

  /** exact rules by label count */
  private val exact2: Seq[String] =
    ruleList.filter(r => !r.startsWith("*") && !r.startsWith("!") && labelCount(r) == 2)
  private val exact3: Seq[String] =
    ruleList.filter(r => !r.startsWith("*") && !r.startsWith("!") && labelCount(r) == 3)
  /** wildcard bases: `*.bd` → "bd" (1 label), `*.kawasaki.jp` →
    * "kawasaki.jp" (2 labels) */
  private val wild1: Seq[String] =
    ruleList.filter(_.startsWith("*.")).map(_.drop(2)).filter(labelCount(_) == 1)
  private val wild2: Seq[String] =
    ruleList.filter(_.startsWith("*.")).map(_.drop(2)).filter(labelCount(_) == 2)
  private val wild3: Seq[String] =
    ruleList.filter(_.startsWith("*.")).map(_.drop(2)).filter(labelCount(_) == 3)
  /** exception rules: `!www.ck` → "www.ck" */
  private val exc2: Seq[String] =
    ruleList.filter(_.startsWith("!")).map(_.drop(1)).filter(labelCount(_) == 2)
  private val exc3: Seq[String] =
    ruleList.filter(_.startsWith("!")).map(_.drop(1)).filter(labelCount(_) == 3)

  require(ruleList.filter(_.startsWith("*.")).forall(r => labelCount(r.drop(2)) <= 3),
    "snapshot parser handles wildcard bases of at most 3 labels")
  require(ruleList.filter(_.startsWith("!")).forall(r => labelCount(r.drop(1)) <= 3),
    "snapshot parser handles exceptions of at most 3 labels")

  /** PSL registrable domain of a lowercased host, as one map-only
    * codegen'd expression. See the object doc for the branch order.
    */
  def registrableDomain(host: Column): Column = {
    val n = size(split(host, "\\."))
    // substring_index(host, ".", -k): the last k labels; when the host
    // has FEWER than k labels it returns the whole host — harmless in
    // the membership tests below because a rule set of m labels can
    // never contain a string of fewer labels
    def lastK(k: Int): Column = substring_index(host, ".", -k)
    def in(set: Seq[String], c: Column): Column =
      if (set.isEmpty) lit(false) else c.isin(set: _*)
    val l1 = lastK(1); val l2 = lastK(2); val l3 = lastK(3)
    val l4 = lastK(4); val l5 = lastK(5)
    when(host.isNull, lit(null))
      .when(n <= 1, host)
      .when(in(exc3, l3), l3)
      .when(in(exc2, l2), l2)
      .when(n >= 4 && in(wild3, l3), when(n >= 5, l5).otherwise(host))
      .when(in(exact3, l3) || (n >= 3 && in(wild2, l2)),
        when(n >= 4, l4).otherwise(host))
      .when(in(exact2, l2) || in(wild1, l1),
        when(n >= 3, l3).otherwise(host))
      .otherwise(l2)
  }

  private def sqlList(set: Seq[String]): String =
    set.map(s => s"'$s'").mkString("(", ", ", ")")

  /** `expr IN (…)`, or literal `FALSE` for an empty rule class —
    * mirrors the Spark side's `lit(false)` guard; `IN ()` is invalid
    * SQL, and a swapped-in snapshot may legitimately leave a class
    * (e.g. exc3/wild3) empty.
    */
  private def sqlIn(expr: String, set: Seq[String]): String =
    if (set.isEmpty) "FALSE" else s"$expr IN ${sqlList(set)}"

  /** DuckDB replay of [[registrableDomain]] — generated from the SAME
    * rule sets so the oracle can never drift from the engine. The
    * caller provides expressions for the host, its label array, and
    * the label count (precompute the array in a CTE so DuckDB
    * evaluates `string_split` once).
    */
  def duckDbCase(host: String, parts: String, n: String): String = {
    // last k labels: slice the list from index len-k+1 (1-based,
    // clamped) to the end
    def lastK(k: Int): String =
      s"array_to_string(list_slice($parts, greatest($n - ${k - 1}, 1), $n), '.')"
    val l1 = lastK(1); val l2 = lastK(2); val l3 = lastK(3)
    val l4 = lastK(4); val l5 = lastK(5)
    s"""CASE
       |  WHEN $n <= 1 THEN $host
       |  WHEN ${sqlIn(l3, exc3)} THEN $l3
       |  WHEN ${sqlIn(l2, exc2)} THEN $l2
       |  WHEN $n >= 4 AND ${sqlIn(l3, wild3)}
       |    THEN CASE WHEN $n >= 5 THEN $l5 ELSE $host END
       |  WHEN ${sqlIn(l3, exact3)}
       |       OR ($n >= 3 AND ${sqlIn(l2, wild2)})
       |    THEN CASE WHEN $n >= 4 THEN $l4 ELSE $host END
       |  WHEN ${sqlIn(l2, exact2)} OR ${sqlIn(l1, wild1)}
       |    THEN CASE WHEN $n >= 3 THEN $l3 ELSE $host END
       |  ELSE $l2
       |END""".stripMargin
  }
}
