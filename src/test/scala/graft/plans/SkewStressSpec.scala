package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hot-key stress tests for the three operators whose skew guards were
  * previously exercised only on small planted fixtures. Each test
  * synthesizes a fixture where ONE key owns a large share of the rows
  * (the shape that melts an unguarded plan at 100 TB), asserts the
  * guard is actually in the plan / semantics, and bounds wall-clock
  * loosely — the unguarded forms are 100-1000x these sizes' quadratic
  * blow-ups, so a generous bound still separates guarded from not.
  */
class SkewStressSpec extends SparkSpec {
  import spark.implicits._

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  test("domainCap: one domain owning 25% of 200k URLs caps via pre-shuffle group limit") {
    // 50k URLs on hotdomain.com + 150k spread over 15k long-tail domains
    val docs = spark.range(200000L).select(
      col("id").as("doc_id"),
      when(col("id") < 50000L,
        concat(lit("https://hotdomain.com/page/"), col("id")))
        .otherwise(concat(lit("https://www.site"), col("id") % 15000L,
          lit(".org/p/"), col("id"))).as("url"))
    val cappedDf = graft.text.Urls.domainCap(docs, "doc_id", "url", cap = 100)
    // the guard: InferWindowGroupLimit turns the rank filter into a
    // per-partition top-(cap) BEFORE the exchange, so the hot domain
    // ships at most cap rows per map partition instead of 50k to one
    // reducer
    val plan = cappedDf.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"group limit not pushed:\n$plan")
    val (byDomain, sec) = timed {
      cappedDf
        .withColumn("__d", graft.text.Urls.registrableDomain(
          graft.text.Urls.hostOf(graft.text.Urls.canonicalizeUrl(col("url")))))
        .groupBy("__d").count()
        .as[(String, Long)].collect().toMap
    }
    assert(byDomain("hotdomain.com") === 100L)
    assert(byDomain.size === 15001)
    assert(byDomain.filterNot(_._1 == "hotdomain.com").values.forall(_ <= 100L))
    assert(sec < 120.0, s"domainCap skew run took $sec s")
  }

  test("itemItemTopK: a power user with 20k ratings is capped, not squared") {
    // hot user: 20k items (2*10^8 pairs uncapped); 2k normal users with
    // 20 ratings each over a 20k-item catalog
    val hot = spark.range(20000L).select(
      lit("power_user").as("user"),
      concat(lit("i"), col("id")).as("item"),
      (col("id") % 5 + 1).cast("double").as("rating"),
      col("id").as("time"))
    // tail users rate only EVEN item ids, so odd items exist solely in
    // the hot user's history
    val tail = spark.range(40000L).select(
      concat(lit("u"), col("id") % 2000L).as("user"),
      concat(lit("i"), ((col("id") * 7919L) % 10000L) * 2L).as("item"),
      (col("id") % 5 + 1).cast("double").as("rating"),
      col("id").as("time"))
    val ratings = hot.unionByName(tail)
    val (rows, sec) = timed {
      graft.similarity.Ann.itemItemTopK(ratings, k = 5).count()
    }
    assert(rows > 0)
    // capped at the default 1000-most-recent: ~5*10^5 pairs from the hot
    // user instead of 2*10^8 — an uncapped run is ~400x this work
    assert(sec < 120.0, s"itemItemTopK skew run took $sec s")
    // cap semantics: only the hot user's 1000 most RECENT ratings pair
    // up. i1 is odd (absent from every tail user's history) and old
    // (time 1, far below the kept 19000..19999 tail), so after capping
    // it must have no pairs at all.
    val i1 = graft.similarity.Ann.itemItemTopK(ratings, k = 5)
      .filter(col("item_a") === "i1" || col("item_b") === "i1").count()
    assert(i1 === 0L, "cap failed: dropped history still produced pairs")
  }

  test("paragraphDedup: one boilerplate line in 30% of 60k docs") {
    // 18k docs share a hot footer line; every doc also has a unique line
    val docs = spark.range(60000L).select(
      col("id").as("doc_id"),
      when(col("id") < 18000L,
        concat(lit("unique line "), col("id"),
          lit("\nsubscribe to our newsletter today")))
        .otherwise(concat(lit("unique line "), col("id"))).as("text"))
    val (agg, sec) = timed {
      val out = graft.dedup.Dedup.paragraphDedup(docs, "doc_id", "text")
      out.agg(sum("n_kept").as("k"), sum("n_dropped").as("d"))
        .as[(Long, Long)].collect().head
    }
    // every unique line survives; the hot footer survives exactly once
    assert(agg === ((60000L + 1L, 18000L - 1L)))
    assert(sec < 120.0, s"paragraphDedup skew run took $sec s")
  }

  test("winnowSelfMatches: a boilerplate fingerprint in 10k docs is capped BEFORE aggregation") {
    // every doc carries the same license-header boilerplate (its
    // fingerprints land in 10^4 carrier docs — the shape that built
    // one unbounded collect_list buffer in the round-16 form); two
    // planted docs additionally share a long distinctive run that the
    // report must localize
    val boiler = "this corpus ships one boilerplate license header " +
      "carried by every single document in the fixture"
    val planted = "the two planted documents additionally share this " +
      "very long and quite distinctive run of text that winnowing " +
      "must localize and report as a shared span between exactly " +
      "those two documents and nobody else in the whole corpus"
    // the per-doc tail starts with the ZERO-PADDED doc id, so a gram
    // spanning the boiler→tail junction is either carried by ≥10 docs
    // (a shared id prefix — capped away) or by exactly one (the full
    // id is unique); a raw random/hash tail here lets two docs
    // sharing a few leading hex chars form a coincidental pair
    val docs = spark.range(10000L).select(
      col("id").as("doc_id"),
      concat(lit(boiler + " "),
        when(col("id").isin(3L, 7L), lit(planted + " "))
          .otherwise(lit("")),
        lit("tail "), lpad(col("id").cast("string"), 10, "0"),
        lit(" "), md5(col("id").cast("string"))).as("text"))
    val report = graft.dedup.Dedup.winnowSelfMatches(docs, "doc_id",
      "text", k = 20, w = 8, minSharedFps = 2, maxFpDocs = 4L)
    val (rows, sec) = timed(report.collect())
    // the boilerplate fps (10^4 carriers) die at the cap, so NO pair
    // among the 9,998 boilerplate-only docs survives; the planted fps
    // (2 carriers) survive and localize the one real pair
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((3L, 7L)), s"expected exactly the planted pair, got ${rows.toSeq}")
    assert(rows.head.getLong(2) >= 2L, "planted run under evidence floor")
    assert(sec < 120.0, s"self-matches skew run took $sec s")
    // plan shape: the doc-frequency cap (a Filter on the window count)
    // must sit BELOW the collect_list aggregate — i.e. print AFTER it
    // in the plan tree — so no aggregation buffer ever holds an
    // uncapped carrier list; and the pairing stays join-free
    val p = report.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"self-matches must not join:\n$p")
    val aggAt = p.indexOf("collect_list")
    val capAt = p.indexOf("__nd")
    val winAt = p.indexOf("Window")
    assert(aggAt >= 0 && capAt >= 0 && winAt >= 0,
      s"expected collect_list above a windowed __nd cap:\n$p")
    assert(aggAt < capAt && aggAt < winAt,
      s"cap must run BEFORE the collect_list aggregate:\n$p")
  }

  test("winnowFamilyCap rank: a 300k-member mega-family never sorts in one task") {
    import spark.implicits._
    // one boilerplate family carrying 300k docs + 1k unlabeled docs:
    // the old row_number().over(partitionBy(cluster_id)) serialized
    // the full roster through ONE window task (the r17 verdict's
    // straggler note); the r18 shape range-partitions the sort and
    // rolls per-partition offsets, so every window partition is
    // bounded by the range-partition size, not the family size
    val n = 300000L
    val base = spark.range(n + 1000L).select(col("id").as("doc_id"))
    val labels = spark.range(n)
      .select(col("id").as("doc_id"), lit(7L).as("cluster_id"))
    val capped = graft.dedup.Dedup.winnowFamilyCapFromLabels(
      base, labels, capPerFamily = 2)
    // plan shape: the member-level rank window must be partitioned by
    // (cluster_id, __pid) — never by the family alone — and the only
    // cluster_id-alone window is the per-partition offset roll, whose
    // input is the (cluster_id, __pid) COUNT aggregate (≤ one row per
    // range partition per family, bounded regardless of family size)
    val wins = capped.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        (w.partitionSpec.map(_.toString), w.child.toString)
    }
    assert(wins.nonEmpty, "expected window operators in the rank plan")
    wins.foreach { case (spec, child) =>
      val famAlone = spec.size == 1 && spec.head.contains("cluster_id")
      assert(!famAlone || child.contains("HashAggregate") ||
        child.contains("Aggregate"),
        s"family-alone window over member rows: $spec\n$child")
    }
    assert(wins.exists(_._1.exists(_.contains("__pid"))),
      s"member rank window must include the range-partition id: $wins")
    // exact semantics on the mega family: rank = doc_id + 1 (doc_ids
    // are dense from 0), exactly capPerFamily kept among members,
    // unlabeled docs pass with rank 1
    val (rows, sec) = timed {
      capped.select(col("doc_id"), col("cluster_id"),
        col("rank_in_family"), col("kept")).collect()
    }
    assert(rows.length === (n + 1000L).toInt)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getInt(2) === 1 && byId(0L).getBoolean(3))
    assert(byId(1L).getInt(2) === 2 && byId(1L).getBoolean(3))
    assert(byId(2L).getInt(2) === 3 && !byId(2L).getBoolean(3))
    assert(byId(n - 1L).getInt(2) === n.toInt && !byId(n - 1L).getBoolean(3))
    assert(byId(n + 5L).isNullAt(1) && byId(n + 5L).getInt(2) === 1 &&
      byId(n + 5L).getBoolean(3), "unlabeled doc must pass with rank 1")
    assert(rows.count(r => !r.isNullAt(1) && r.getBoolean(3)) === 2)
    assert(sec < 120.0, s"mega-family rank run took $sec s")
  }
}
