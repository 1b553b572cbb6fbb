package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dedup.winnowRoute]] — the keep / surgical-cut / drop disposition
  * over the contamination fraction: band routing semantics, byte
  * identity of kept documents, surgical removal of exactly the quoted
  * region in the mid band, and fresh-index parity of
  * [[WinnowIndex.route]].
  */
class WinnowRouteSpec extends SparkSpec {
  import spark.implicits._

  private val benchText =
    "the quick brown fox jumps over the lazy dog while the band " +
      "plays on and the crowd cheers loudly forever into the night " +
      "under a pale and watchful moon"

  // keep-doc with casing/whitespace the normalized kernel folds away —
  // routing must return the ORIGINAL bytes untouched
  private val keepText =
    "MiXeD CaSe\t\twhitespace   preserved exactly as written plus " +
      "some genuinely original prose about gardening and carpentry " +
      "that quotes no benchmark item whatsoever in any fragment"

  private val tail =
    (1 to 6).map(i => s"wholly original trailing segment number $i " +
      "about navigation astronomy pottery weaving and the patient " +
      "art of keeping bees in a walled orchard garden").mkString(" ")

  private def fixture = Seq(
    (1L, benchText),                          // full copy → drop
    (2L, s"intro passage first $benchText $tail"), // quoter → cut
    (3L, keepText),                           // clean → keep
    (4L, "tiny")                              // sub-k → no fps → keep
  ).toDF("doc_id", "text")

  private def bench = Seq((900L, benchText)).toDF("bench_id", "text")

  private def routed() = Dedup.winnowRoute(fixture, "doc_id", "text",
    bench, "bench_id", "text", cutFloor = 0.05, dropFloor = 0.4,
    k = 20, w = 8, minSharedFps = 2, maxBenchFpFreq = 64L)

  test("bands route to drop / cut / keep; kept docs are byte-identical") {
    val byId = routed().collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getString(2), r.getString(3))).toMap
    val (fracA, vA, tA) = byId(1L)
    assert(vA === "drop" && tA == null, s"full copy must drop: $fracA")
    assert(fracA >= 0.4)
    val (fracB, vB, tB) = byId(2L)
    assert(vB === "cut", s"quoter must cut, frac was $fracB")
    assert(fracB >= 0.05 && fracB < 0.4,
      s"fixture drifted out of the mid band: $fracB")
    // surgery removed the quoted region (its interior phrase is gone)
    // and kept the original surroundings
    assert(!tB.contains("band plays on"), s"quote interior survived: $tB")
    assert(tB.startsWith("intro passage first"))
    assert(tB.contains("keeping bees in a walled orchard garden"))
    assert(tB.length < s"intro passage first $benchText $tail".length)
    val (fracC, vC, tC) = byId(3L)
    assert(vC === "keep" && fracC === 0.0)
    assert(tC === keepText, "kept doc must round-trip byte-identical")
    val (fracD, vD, tD) = byId(4L)
    assert(vD === "keep" && fracD === 0.0 && tD === "tiny",
      "sub-k doc must keep unchanged")
  }

  test("route executes ONE corpus kernel scan and ONE bench kernel pass") {
    // the r18 single-kernel reshape: the fraction and the surgery both
    // read one matched relation behind a shared doc_id exchange, so
    // the EXECUTED plan must carry exactly one raw-kernel selection
    // over the corpus (the pre-r18 shape ran the normalized + raw
    // corpus kernels plus three bench-side fingerprint passes). A
    // regression shows up as a second winnowselectraw/winnowselect
    // generator instead of a reused exchange. Inputs go through
    // parquet — a local relation would be constant-folded and hide
    // the kernel from the plan; collect() executes the dataset's OWN
    // queryExecution, so executedPlan afterwards is the AQE-final
    // plan where a reused exchange prints once.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_route_plan").toString
    fixture.write.parquet(s"$dir/corpus")
    bench.write.parquet(s"$dir/bench")
    val df = Dedup.winnowRoute(
      spark.read.parquet(s"$dir/corpus"), "doc_id", "text",
      spark.read.parquet(s"$dir/bench"), "bench_id", "text",
      cutFloor = 0.05, dropFloor = 0.4,
      k = 20, w = 8, minSharedFps = 2, maxBenchFpFreq = 64L)
    df.collect()
    // count in the FINAL (executed) section only — the string also
    // embeds the pre-AQE "Initial Plan" rendering of the same tree
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val raws = "winnowselectraw\\(".r.findAllIn(plan).length
    // "winnowselect(" cannot match inside "winnowselectraw(" — the
    // paren anchors the non-raw (bench-side) kernel exactly
    val benchK = "winnowselect\\(".r.findAllIn(plan).length
    assert(raws === 1, s"expected 1 corpus kernel scan, got $raws:\n$plan")
    assert(benchK === 1,
      s"expected 1 bench kernel pass, got $benchK:\n$plan")
    // the PlanBarrier guarantee: the inferred generate filter must not
    // carry the kernel's definition (a pushed-down copy evaluates the
    // kernel a second time per corpus row)
    assert(!plan.contains("size(winnowselect"),
      s"kernel definition pushed into a filter:\n$plan")
  }

  test("proportional bench cap executes ONE bench kernel pass") {
    // r19: the maxBenchFpDocFrac branch used to run the bench kernel
    // THREE times (the eager denominator count + the freq agg + the
    // semi-join probe side — per-branch pruning defeats exchange
    // reuse); the distinct-carrier cap now rides two stacked windows
    // over one fp exchange. The eager denominator job runs OUTSIDE
    // the returned plan, so the EXECUTED plan must carry exactly TWO
    // winnowselect generators: one corpus-side, one bench-side — a
    // regression to the join shape shows up as a third. Parquet
    // inputs for the same constant-folding reason as the route test.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_prop_plan").toString
    fixture.write.parquet(s"$dir/corpus")
    bench.write.parquet(s"$dir/bench")
    val df = Dedup.winnowMatches(
      spark.read.parquet(s"$dir/corpus"), "doc_id", "text",
      spark.read.parquet(s"$dir/bench"), "bench_id", "text",
      k = 20, w = 8, minSharedFps = 2, maxBenchFpFreq = 64L,
      maxBenchFpDocFrac = Some(0.9))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val kernels = "winnowselect\\(".r.findAllIn(plan).length
    assert(kernels === 2,
      s"expected 2 kernel passes (corpus + bench), got $kernels:\n$plan")
  }

  test("WinnowIndex.route on a fresh index == the one-shot operator") {
    val name = "graft_route_spec_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val viaIndex =
      try {
        WinnowIndex.build(bench, "bench_id", "text", name, k = 20, w = 8)
        WinnowIndex.route(spark, name, fixture, "doc_id", "text",
          cutFloor = 0.05, dropFloor = 0.4, minSharedFps = 2,
          maxBenchFpFreq = 64L).localCheckpoint(true)
      } finally WinnowIndex.drop(spark, name)
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getDouble(1), r.getString(2),
        Option(r.getString(3)))
    assert(viaIndex.collect().map(key).sortBy(_._1).toSeq ===
      routed().collect().map(key).sortBy(_._1).toSeq)
  }
}
