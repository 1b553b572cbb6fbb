package graft.prep

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Rating

class PrepSpec extends SparkSpec {
  import spark.implicits._

  // FIXTURES.md F2: duplicates, re-reviews, ties
  private def fixture = Seq(
    Rating("u1", "i1", 5.0, 100L),
    Rating("u1", "i1", 5.0, 100L), // exact duplicate
    Rating("u1", "i1", 2.0, 200L), // re-review, later
    Rating("u2", "i1", 3.0, 50L),
    Rating("u3", "i2", 1.0, 300L),
    Rating("u3", "i2", 4.0, 300L) // tie on (key, time)
  ).toDF

  test("dedupExact drops exact duplicates only") {
    assert(Prep.dedupExact(fixture).count() === 5)
  }

  test("dedupExact is idempotent") {
    val once = Prep.dedupExact(fixture)
    assert(once.count() === Prep.dedupExact(once).count())
  }

  test("dedupKeepLast keeps one row per key, the latest by time") {
    val out = Prep.dedupKeepLast(fixture, Seq("user", "item"),
      Seq(col("time"), col("rating")))
    assert(out.count() === 3)
    val u1 = out.filter($"user" === "u1").as[Rating].head()
    assert(u1.rating === 2.0 && u1.time === 200L)
    // tie on time → exactly one survivor, deterministic by tiebreak col
    val u3 = out.filter($"user" === "u3").as[Rating].head()
    assert(u3.rating === 4.0)
  }

  test("dedupKeepFirst keeps one row per key, the earliest") {
    val out = Prep.dedupKeepFirst(fixture, Seq("user", "item"),
      Seq(col("time"), col("rating")))
    assert(out.count() === 3)
    val u1 = out.filter($"user" === "u1").as[Rating].head()
    assert(u1.time === 100L)
    // keep-first and keep-last partition the same key set
    val lastKeys = Prep.dedupKeepLast(fixture, Seq("user", "item"),
      Seq(col("time"), col("rating"))).select("user", "item")
    assert(out.select("user", "item").exceptAll(lastKeys).count() === 0)
  }

  test("randomSplit is an exact disjoint cover") {
    val df = (1 to 1000).map(i => Rating(s"u$i", s"i$i", 1.0, i.toLong)).toDF
    val (train, test) = Prep.randomSplit(df, 0.7, seed = 7L)
    assert(train.count() + test.count() === 1000)
    assert(train.intersect(test).count() === 0)
    val frac = train.count() / 1000.0
    assert(frac > 0.6 && frac < 0.8)
  }

  test("randomSplit is reproducible for a fixed seed") {
    val df = (1 to 500).map(i => Rating(s"u$i", s"i$i", 1.0, i.toLong)).toDF
    val a = Prep.randomSplit(df, 0.7, 7L)._1
    val b = Prep.randomSplit(df, 0.7, 7L)._1
    assert(a.except(b).count() === 0 && b.except(a).count() === 0)
  }

  test("modSplit is deterministic and partitions exactly") {
    val df = (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val (train, test) = Prep.modSplit(df, col("id"), 10, 7)
    assert(train.count() === 70 && test.count() === 30)
  }

  test("saltedJoin equals the plain join result") {
    val left = (1 to 500).map(i => (s"k${i % 3}", i)).toDF("k", "v")
    val right = Seq(("k0", "a"), ("k1", "b"), ("k2", "c"), ("k3", "d")).toDF("k", "w")
    val plain = left.join(right, "k")
    val salted = Prep.saltedJoin(left, right, "k", saltFactor = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("projectRename keeps and renames") {
    val out = Prep.projectRename(fixture, Seq("user", "rating"), Seq("u", "r"))
    assert(out.columns.toSeq === Seq("u", "r"))
  }

  test("stratifiedSplit partitions exactly, reproducibly, at ~per-stratum rates") {
    import spark.implicits._
    val docs = (1 to 3000).map(i =>
      (i.toLong, if (i % 3 == 0) "zh" else "en")).toDF("id", "lang")
    val fractions = Map("en" -> 0.1, "zh" -> 0.5)
    val (held, rest) = Prep.stratifiedSplit(docs, "lang", col("id"), fractions)
    // exact partition of the input
    assert(held.count() + rest.count() === 3000)
    assert(held.intersect(rest).isEmpty)
    // reproducible at different parallelism
    val (held2, _) = Prep.stratifiedSplit(docs.repartition(7), "lang", col("id"), fractions)
    assert(held.exceptAll(held2).count() === 0 && held2.exceptAll(held).count() === 0)
    // per-stratum rates within sampling noise
    val rates = held.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(rates("en") / 2000.0 - 0.1) < 0.04, s"en rate ${rates("en") / 2000.0}")
    assert(math.abs(rates("zh") / 1000.0 - 0.5) < 0.07, s"zh rate ${rates("zh") / 1000.0}")
  }

  test("stratifiedSplitPortable: same invariants, md5-prefix decision") {
    import spark.implicits._
    val docs = (1 to 3000).map(i =>
      (i.toLong, if (i % 3 == 0) "zh" else "en")).toDF("id", "lang")
    val fractions = Map("en" -> 0.1, "zh" -> 0.5)
    val (held, rest) =
      Prep.stratifiedSplitPortable(docs, "lang", col("id"), fractions)
    assert(held.count() + rest.count() === 3000)
    assert(held.intersect(rest).isEmpty)
    val (held2, _) = Prep.stratifiedSplitPortable(
      docs.repartition(7), "lang", col("id"), fractions)
    assert(held.exceptAll(held2).count() === 0 && held2.exceptAll(held).count() === 0)
    val rates = held.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(math.abs(rates("en") / 2000.0 - 0.1) < 0.04, s"en rate ${rates("en") / 2000.0}")
    assert(math.abs(rates("zh") / 1000.0 - 0.5) < 0.07, s"zh rate ${rates("zh") / 1000.0}")
    // the decision matches the documented md5-prefix rule exactly
    val manual = docs.filter(
      conv(substring(md5(concat(col("id").cast("string"), lit("|"),
        col("lang"))), 1, 6), 16, 10).cast("long")
        < when(col("lang") === "en", 0.1).otherwise(0.5) * lit(16777216.0))
    assert(held.exceptAll(manual).count() === 0 &&
      manual.exceptAll(held).count() === 0)
  }

  test("negativeSample: unseen items only, k-capped, dense neg_no, deterministic") {
    val items = (1 to 8).map(i => f"i$i")
    val ratings = (
      // u1 rated 2 of 8 items; u2 rated ALL items (no negatives
      // possible); u3 rated one
      Seq("i1", "i2").map(("u1", _)) ++
      items.map(("u2", _)) ++
      Seq(("u3", "i5"))).toDF("user", "item")
    val got = graft.prep.Prep.negativeSample(ratings, "user", "item",
      k = 3, oversample = 8)
    val rows = got.as[(String, String, Int)].collect()
    val byUser = rows.groupBy(_._1)
    // never a seen (user, item) pair
    val seen = Set(("u1", "i1"), ("u1", "i2"), ("u3", "i5")) ++
      items.map(("u2", _)).toSet
    assert(rows.forall(r => !seen.contains((r._1, r._2))), rows.mkString(","))
    // k-capped, dense neg_no from 0
    for ((u, rs) <- byUser) {
      assert(rs.length <= 3, s"$u got ${rs.length}")
      assert(rs.map(_._3).sorted.toSeq === (0 until rs.length), u)
    }
    // u2 has no unseen item at any oversample
    assert(!byUser.contains("u2"))
    // high oversample finds the full k for sparse users
    assert(byUser("u1").length === 3)
    // deterministic
    val again = graft.prep.Prep.negativeSample(ratings, "user", "item",
      k = 3, oversample = 8).as[(String, String, Int)].collect()
    assert(again.sortBy(r => (r._1, r._3)).toSeq ===
      rows.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("splitByKey: rows sharing the key never straddle the split; exact cover") {
    val df = (1L to 400L).map(i => (i, s"group${i % 50}")).toDF("id", "grp")
    val (train, test) = graft.prep.Prep.splitByKey(df, col("grp"), 0.3)
    assert(train.count() + test.count() === 400L)
    assert(train.intersect(test).count() === 0L)
    // the leakage invariant: no group appears on both sides
    val both = train.select("grp").distinct()
      .intersect(test.select("grp").distinct())
    assert(both.count() === 0L, "a key group straddles the split")
    // rate is approximately respected at the group level
    val testGroups = test.select("grp").distinct().count()
    assert(testGroups >= 5 && testGroups <= 25, s"testGroups=$testGroups")
    // deterministic: same seed, same assignment
    val (_, test2) = graft.prep.Prep.splitByKey(df, col("grp"), 0.3)
    assert(test2.orderBy("id").collect().toSeq ===
      test.orderBy("id").collect().toSeq)
  }

  test("splitByKeyN: weighted sides partition exactly, keys never straddle, 2-way agrees") {
    val df = (1L to 600L).map(i => (i, s"group${i % 60}")).toDF("id", "grp")
    val got = graft.prep.Prep.splitByKeyN(df, col("grp"),
      weights = Seq(0.7, 0.2, 0.1))
    // exact cover: every row gets exactly one side in range
    assert(got.count() === 600L)
    assert(got.filter(col("side") < 0 || col("side") > 2).count() === 0L)
    // leakage invariant: one side per key
    val sidesPerKey = got.groupBy("grp")
      .agg(countDistinct(col("side")).as("n"))
      .filter(col("n") > 1).count()
    assert(sidesPerKey === 0L, "a key group straddles sides")
    // side 0 of a (r, 1-r) 2-way N-split is EXACTLY splitByKey's test
    // half (same hash, same truncated threshold)
    val n2 = graft.prep.Prep.splitByKeyN(df, col("grp"), Seq(0.3, 0.7))
      .filter(col("side") === 0).select("id")
    val (_, test2) = graft.prep.Prep.splitByKey(df, col("grp"), 0.3)
    assert(n2.exceptAll(test2.select("id")).count() === 0L)
    assert(test2.select("id").exceptAll(n2).count() === 0L)
    // every side is populated at these weights on 60 groups
    assert(got.select("side").distinct().count() === 3L)
    // loud degenerate configs
    intercept[IllegalArgumentException] {
      graft.prep.Prep.splitByKeyN(df, col("grp"), Seq(1.0))
    }
    intercept[IllegalArgumentException] {
      graft.prep.Prep.splitByKeyN(df, col("grp"), Seq(0.5, 0.0))
    }
  }

  test("resampleLocf: gaps fill forward, last-per-bucket election, observed flag") {
    // user a: buckets 0 (two events — later one wins), 1 missing
    // (filled from 0), 2 observed; user b: single bucket, no gaps
    val df = Seq(
      ("a", 10L, 1L, 1.5), ("a", 90L, 2L, 2.5), // bucket 0: t=90 wins
      ("a", 250L, 3L, 9.0),                     // bucket 2
      ("b", 130L, 4L, 7.0))                     // bucket 1 only
      .toDF("k", "t", "id", "v")
    val got = graft.prep.Prep.resampleLocf(df, "k", col("t"), "v", "id",
      intervalUs = 100L)
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got.size === 4)
    assert(got(("a", 0L)) === ((2.5, true)))   // later event elected
    assert(got(("a", 100L)) === ((2.5, false))) // gap carried forward
    assert(got(("a", 200L)) === ((9.0, true)))
    assert(got(("b", 100L)) === ((7.0, true)))
  }

  test("sampleExactPerGroup: exact k per group, deterministic, salt varies the draw") {
    val df = (1 to 100).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "grp")
    val s1 = graft.prep.Prep.sampleExactPerGroup(df, "grp", col("id"), 10)
      .as[(Long, String)].collect().toSet
    // exact k from each group big enough; schema unchanged
    assert(s1.count(_._2 == "a") === 10)
    assert(s1.count(_._2 == "b") === 10)
    // deterministic: the SAME rows every run
    val s2 = graft.prep.Prep.sampleExactPerGroup(df, "grp", col("id"), 10)
      .as[(Long, String)].collect().toSet
    assert(s1 === s2)
    // a different salt draws a different sample (overwhelmingly)
    val s3 = graft.prep.Prep.sampleExactPerGroup(df, "grp", col("id"), 10,
      salt = "2").as[(Long, String)].collect().toSet
    assert(s1 !== s3)
    // a group smaller than k keeps everything
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "grp")
    assert(graft.prep.Prep.sampleExactPerGroup(tiny, "grp", col("id"), 10)
      .count() === 2L)
  }

  test("resampleLocf: negative (pre-1970) timestamps bucket by FLOOR division") {
    // t = -50 belongs to bucket -1 = [-100, 0), NOT bucket 0 — a
    // truncating `div` would collapse (-100, 0) and [0, 100) into one
    // bucket and diverge from the DuckDB oracle's flooring `//`
    val df = Seq(("a", -50L, 1L, 1.0), ("a", 50L, 2L, 2.0))
      .toDF("k", "t", "id", "v")
    val got = graft.prep.Prep.resampleLocf(df, "k", col("t"), "v", "id", 100L)
      .as[(String, Long, Double, Boolean)].collect()
      .map(r => r._2 -> ((r._3, r._4))).toMap
    assert(got.size === 2)
    assert(got(-100L) === ((1.0, true)))
    assert(got(0L) === ((2.0, true)))
    // exact-boundary negative: t = -100 is bucket -1's START, still -1
    val b = graft.prep.Prep.resampleLocf(
      Seq(("a", -100L, 1L, 3.0)).toDF("k", "t", "id", "v"),
      "k", col("t"), "v", "id", 100L)
      .as[(String, Long, Double, Boolean)].collect()
    assert(b.toSeq === Seq(("a", -100L, 3.0, true)))
  }

  test("resampleLocf: same-timestamp ties break by the tie column") {
    val df = Seq(("a", 50L, 1L, 1.0), ("a", 50L, 2L, 4.0))
      .toDF("k", "t", "id", "v")
    val got = graft.prep.Prep.resampleLocf(df, "k", col("t"), "v", "id", 100L)
      .as[(String, Long, Double, Boolean)].collect()
    assert(got.toSeq === Seq(("a", 0L, 4.0, true))) // id 2 wins
  }

  test("negativeSample: item-dimension broadcast is size-gated (plan flips)") {
    val items = (1 to 20).map(i => f"i$i")
    val ratings = items.take(5).map(("u1", _)).toDF("user", "item")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable Catalyst's own auto-broadcast so the ONLY broadcast in
    // the plan is the one negativeSample's size gate asks for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def broadcasts(thresh: Long): Int = {
        val p = graft.prep.Prep.negativeSample(ratings, "user", "item",
          k = 2, oversample = 4, autoBroadcastDimBytes = thresh)
          .queryExecution.executedPlan.toString
        "BroadcastHashJoin".r.findAllIn(p).size
      }
      assert(broadcasts(64L << 20) >= 1, "dim under threshold must broadcast")
      assert(broadcasts(0L) === 0,
        "dim over threshold must degrade to a shuffle join, not a broadcast")
      // the gate changes the JOIN STRATEGY only, never the result
      val viaShuffle = graft.prep.Prep.negativeSample(ratings, "user", "item",
        k = 2, oversample = 4, autoBroadcastDimBytes = 0L)
        .as[(String, String, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
      val viaBcast = graft.prep.Prep.negativeSample(ratings, "user", "item",
        k = 2, oversample = 4)
        .as[(String, String, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
      assert(viaShuffle === viaBcast)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bprTriplets pairs every positive round-robin with a sampled negative") {
    val items = (1 to 8).map(i => f"i$i")
    val ratings = (Seq("i1", "i2", "i3", "i4").map(("u1", _)) ++
      items.map(("u2", _)) ++
      // u3 rated 7 of 8 — at most ONE negative exists, fewer than k:
      // the wrap must still pair all 7 positives with it
      items.take(7).map(("u3", _))).toDF("user", "item")
    val k = 2
    val neg = graft.prep.Prep.negativeSample(ratings, "user", "item",
      k, oversample = 8).as[(String, String, Int)].collect()
      .map(r => (r._1, r._3) -> r._2).toMap
    val got = graft.prep.Prep.bprTriplets(ratings, "user", "item",
      k, oversample = 8).as[(String, String, String)].collect().toSet
    // u1's positives i1..i4 pair with its negatives in slots 0,1,0,1
    val expected = Seq("i1", "i2", "i3", "i4").zipWithIndex.flatMap {
      case (p, i) => neg.get(("u1", i % k)).map(n => ("u1", p, n))
    }.toSet
    assert(got.filter(_._1 == "u1") === expected, s"neg=$neg")
    // u2 rated everything -> no negatives -> no triplets
    assert(!got.exists(_._1 == "u2"))
    // a triplet's negative is never one of the user's positives
    assert(got.forall(t => !Seq("i1", "i2", "i3", "i4").contains(t._3)))
    // u3: one available negative (i8), fewer than k — the round-robin
    // wraps over the ACTUAL count, so all 7 positives still pair
    val u3 = got.filter(_._1 == "u3")
    assert(u3.map(_._2) === items.take(7).toSet)
    assert(u3.forall(_._3 == "i8"), u3.toString)
  }
}
