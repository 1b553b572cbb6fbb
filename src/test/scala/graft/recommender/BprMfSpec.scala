package graft.recommender

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.prep.Prep

/** BPR trainer parity + convergence (the GdMfSpec discipline): the
  * distributed full-batch BPR step must match a naive driver-side
  * implementation of Rendle et al.'s pairwise gradient to 1e-9, and
  * ranking quality (training AUC) must improve on a structured
  * fixture. The triplet INPUT is deterministic by construction
  * (q148/q149 hash-gates); these specs cover the float trajectory on
  * top of it.
  */
class BprMfSpec extends SparkSpec {
  import spark.implicits._

  // two taste clusters: users 0-3 like items 0-4, users 4-7 like 5-9 —
  // separable, so pairwise ranking must become better than chance
  private val ratingsSeq: Seq[(String, String)] = {
    val rnd = new scala.util.Random(7)
    for {
      u <- 0 until 8
      i <- 0 until 10
      if (if (u < 4) i < 5 else i >= 5) && rnd.nextDouble() < 0.8
    } yield (s"u$u", s"i$i")
  }

  private def factors(df: org.apache.spark.sql.DataFrame, idCol: String,
      fCol: String): Map[String, Array[Double]] =
    df.select(idCol, fCol).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap

  /** Naive driver-side full-batch BPR over an explicit triplet list. */
  private def naive(
      triplets: Seq[(String, String, String)],
      u0: Map[String, Array[Double]],
      i0: Map[String, Array[Double]],
      lr: Double, reg: Double, epochs: Int)
    : (Map[String, Array[Double]], Map[String, Array[Double]]) = {
    var uS = u0.map { case (k, f) => k -> f.clone() }
    var iS = i0.map { case (k, f) => k -> f.clone() }
    val k = u0.head._2.length
    for (_ <- 0 until epochs) {
      val uGrad = collection.mutable.Map.empty[String, Array[Double]]
      val iGrad = collection.mutable.Map.empty[String, Array[Double]]
      triplets.foreach { case (u, p, n) =>
        val w = uS(u); val hp = iS(p); val hn = iS(n)
        val x = (0 until k).map(f => w(f) * hp(f)).sum -
          (0 until k).map(f => w(f) * hn(f)).sum
        val s = 1.0 / (1.0 + math.exp(x))
        val ug = uGrad.getOrElseUpdate(u, Array.fill(k)(0.0))
        val pg = iGrad.getOrElseUpdate(p, Array.fill(k)(0.0))
        val ng = iGrad.getOrElseUpdate(n, Array.fill(k)(0.0))
        (0 until k).foreach { f =>
          ug(f) += s * (hp(f) - hn(f))
          pg(f) += s * w(f)
          ng(f) -= s * w(f)
        }
      }
      uS = uS.map { case (id, f) =>
        val g = uGrad.getOrElse(id, Array.fill(k)(0.0))
        id -> f.indices.map(j => f(j) + lr * (g(j) - reg * f(j))).toArray
      }
      iS = iS.map { case (id, f) =>
        val g = iGrad.getOrElse(id, Array.fill(k)(0.0))
        id -> f.indices.map(j => f(j) + lr * (g(j) - reg * f(j))).toArray
      }
    }
    (uS, iS)
  }

  private def assertClose(got: Map[String, Array[Double]],
      want: Map[String, Array[Double]]): Unit = {
    assert(got.keySet === want.keySet)
    got.foreach { case (id, f) =>
      val wf = want(id)
      f.indices.foreach { i =>
        assert(math.abs(f(i) - wf(i)) < 1e-9,
          s"factor($i) mismatch for $id: ${f(i)} vs ${wf(i)}")
      }
    }
  }

  test("BPR batch gradient matches the naive pairwise formulas over 3 epochs") {
    val df = ratingsSeq.toDF("user", "item")
    val cfg0 = BprMf.Config(nFactors = 3, epochs = 0, lr = 0.05, reg = 0.01,
      negativesPerUser = 3, oversample = 6)
    val init = BprMf.fit(df, cfg0)
    val m = BprMf.fit(df, cfg0.copy(epochs = 3))
    val triplets = Prep.bprTriplets(df, "user", "item", 3, 6)
      .as[(String, String, String)].collect().toSeq
    val (wu, wi) = naive(triplets,
      factors(init.userState, "user", "u_factors"),
      factors(init.itemState, "item", "i_factors"),
      lr = 0.05, reg = 0.01, epochs = 3)
    assertClose(factors(m.userState, "user", "u_factors"), wu)
    assertClose(factors(m.itemState, "item", "i_factors"), wi)
    init.release(); m.release()
  }

  test("training AUC improves and loss falls on the separable fixture") {
    val df = ratingsSeq.toDF("user", "item")
    val m = BprMf.fit(df, BprMf.Config(nFactors = 4, epochs = 12, lr = 0.2,
      reg = 0.001, negativesPerUser = 4, oversample = 6,
      collectMetrics = true))
    val aucs = m.history.map(_._2.auc)
    val losses = m.history.map(_._2.loss)
    assert(m.history.size === 12)
    assert(aucs.last > aucs.head,
      s"AUC did not improve: ${aucs.head} -> ${aucs.last}")
    assert(aucs.last > 0.75, s"final AUC ${aucs.last} not clearly above chance")
    assert(losses.last < losses.head,
      s"loss did not fall: ${losses.head} -> ${losses.last}")
    m.release()
  }

  test("score ranks a user's positives above sampled negatives after training") {
    val df = ratingsSeq.toDF("user", "item")
    val m = BprMf.fit(df, BprMf.Config(nFactors = 4, epochs = 12, lr = 0.2,
      reg = 0.001, negativesPerUser = 4, oversample = 6))
    // u0's cluster items should outscore the other cluster's on average
    val pairs = (0 until 10).map(i => ("u0", s"i$i")).toDF("user", "item")
    val scores = m.score(pairs).select("item", "score")
      .as[(String, Double)].collect().toMap
    val own = (0 until 5).map(i => scores(s"i$i")).sum / 5
    val other = (5 until 10).map(i => scores(s"i$i")).sum / 5
    assert(own > other, s"own-cluster mean $own !> other-cluster mean $other")
    m.release()
  }

  test("topNExact ranks by the pure dot with (score desc, item) tie-break") {
    val users = Seq(
      ("u1", Seq(1.0, 0.0)), ("u2", Seq(0.0, 1.0)))
      .toDF("user", "u_factors")
    val items = Seq(
      ("a", Seq(2.0, 0.0)), ("b", Seq(0.0, 3.0)), ("c", Seq(1.0, 1.0)),
      ("d", Seq(1.0, 1.0))) // ties c on both users → item asc breaks it
      .toDF("item", "i_factors")
    val got = BprMf.topNExact(users, items, 3)
      .as[(String, String, Int)].collect().toSet
    // u1: a=2, c=d=1 (c before d), b=0; u2: b=3, c=d=1, a=0
    assert(got === Set(
      ("u1", "a", 1), ("u1", "c", 2), ("u1", "d", 3),
      ("u2", "b", 1), ("u2", "c", 2), ("u2", "d", 3)))
  }

  test("ANN top-N achieves high recall against the exact cross join") {
    val df = ratingsSeq.toDF("user", "item")
    val m = BprMf.fit(df, BprMf.Config(nFactors = 4, epochs = 8, lr = 0.2,
      reg = 0.001, negativesPerUser = 4, oversample = 6))
    val exact = m.recommendForAllUsersExact(3)
      .as[(String, String, Int)].collect().map(t => (t._1, t._2)).toSet
    // tiny catalog: small nlist, probe most of it, heavy overfetch —
    // the production knobs scaled down to a 10-item fixture
    val ann = m.recommendForAllUsersAnn(3, nlist = 4, nprobe = 3,
      overfetch = 4)
      .as[(String, String, Int)].collect().map(t => (t._1, t._2)).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.9, s"BPR ANN recall too low: $recall")
    m.release()
  }

  test("Model.recommendForAllUsersExact returns n decoded recs per trained user") {
    val df = ratingsSeq.toDF("user", "item")
    val m = BprMf.fit(df, BprMf.Config(nFactors = 2, epochs = 2, lr = 0.1,
      reg = 0.001, negativesPerUser = 2, oversample = 4))
    val recs = m.recommendForAllUsersExact(3)
    val perUser = recs.groupBy("user").count()
      .as[(String, Long)].collect().toMap
    assert(perUser.values.forall(_ === 3L))
    assert(perUser.keySet === df.select("user").distinct()
      .as[String].collect().toSet)
    m.release()
  }
}
