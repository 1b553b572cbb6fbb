package graft.recommender

import graft.SparkSpec
import graft.model.Rating

/** Parity tests (FIXTURES.md F3 / SURVEY §7.4.1): the distributed
  * trainer must match a naive driver-side implementation of the
  * reference's formulas bit-for-bit-ish (1e-9), including the two
  * semantics traps (reg-term dimension scaling; update ordering).
  */
class GdMfSpec extends SparkSpec {
  import spark.implicits._

  private val ratingsSeq: Seq[Rating] = {
    // rank-2-ish sparse matrix, 6 users × 5 items, 17 observed cells
    val rnd = new scala.util.Random(13)
    for {
      u <- 0 until 6
      i <- 0 until 5
      if rnd.nextDouble() < 0.6
    } yield Rating(s"u$u", s"i$i", (u % 3) + (i % 2) + 1.0, (u * 5 + i).toLong)
  }

  private def state(df: org.apache.spark.sql.DataFrame, idCol: String,
      fCol: String, bCol: String): Map[String, (Array[Double], Double)] =
    df.select(idCol, fCol, bCol).collect()
      .map(r => r.getString(0) -> (r.getSeq[Double](1).toArray, r.getDouble(2)))
      .toMap

  /** Naive dense implementation of reference models/funk_svd.py:157-170
    * and models/als.py:158-174, over observed cells.
    */
  private def naive(
      obs: Seq[(String, String, Double)],
      u0: Map[String, (Array[Double], Double)],
      i0: Map[String, (Array[Double], Double)],
      mean: Double, lr: Double, reg: Double, epochs: Int,
      alternating: Boolean): (Map[String, (Array[Double], Double)], Map[String, (Array[Double], Double)]) = {
    var uS = u0.map { case (k, (f, b)) => k -> (f.clone(), b) }
    var iS = i0.map { case (k, (f, b)) => k -> (f.clone(), b) }
    val nUsers = u0.size.toDouble
    val nItems = i0.size.toDouble
    val k = u0.head._2._1.length

    def err(u: Map[String, (Array[Double], Double)],
        i: Map[String, (Array[Double], Double)]): Map[(String, String), Double] =
      obs.map { case (uu, ii, r) =>
        val (p, ub) = u(uu); val (q, ib) = i(ii)
        val dot = (0 until k).map(f => p(f) * q(f)).sum
        (uu, ii) -> (r - (mean + ub + ib + dot))
      }.toMap

    def userUpdate(e: Map[(String, String), Double],
        u: Map[String, (Array[Double], Double)],
        i: Map[String, (Array[Double], Double)]) =
      u.map { case (uu, (p, ub)) =>
        val cells = obs.filter(_._1 == uu)
        val grad = Array.fill(k)(0.0)
        var esum = 0.0
        cells.foreach { case (_, ii, _) =>
          val ev = e((uu, ii)); val q = i(ii)._1
          (0 until k).foreach(f => grad(f) += ev * q(f)); esum += ev
        }
        val p2 = p.indices.map(f => p(f) + lr * (grad(f) - reg * p(f))).toArray
        uu -> (p2, ub + lr * (esum - reg * ub * nItems))
      }

    def itemUpdate(e: Map[(String, String), Double],
        uForGrad: Map[String, (Array[Double], Double)],
        i: Map[String, (Array[Double], Double)]) =
      i.map { case (ii, (q, ib)) =>
        val cells = obs.filter(_._2 == ii)
        val grad = Array.fill(k)(0.0)
        var esum = 0.0
        cells.foreach { case (uu, _, _) =>
          val ev = e((uu, ii)); val p = uForGrad(uu)._1
          (0 until k).foreach(f => grad(f) += ev * p(f)); esum += ev
        }
        val q2 = q.indices.map(f => q(f) + lr * (grad(f) - reg * q(f))).toArray
        ii -> (q2, ib + lr * (esum - reg * ib * nUsers))
      }

    for (_ <- 0 until epochs) {
      if (alternating) {
        val e0 = err(uS, iS)
        uS = userUpdate(e0, uS, iS)
        val e1 = err(uS, iS)
        iS = itemUpdate(e1, uS, iS)
      } else {
        val e = err(uS, iS)
        val newU = userUpdate(e, uS, iS)
        iS = itemUpdate(e, newU, iS) // trap 2: item grad uses updated P
        uS = newU
      }
    }
    (uS, iS)
  }

  private def assertClose(got: Map[String, (Array[Double], Double)],
      want: Map[String, (Array[Double], Double)]): Unit = {
    assert(got.keySet === want.keySet)
    got.foreach { case (id, (f, b)) =>
      val (wf, wb) = want(id)
      assert(math.abs(b - wb) < 1e-9, s"bias mismatch for $id: $b vs $wb")
      f.indices.foreach { i =>
        assert(math.abs(f(i) - wf(i)) < 1e-9,
          s"factor($i) mismatch for $id: ${f(i)} vs ${wf(i)}")
      }
    }
  }

  private def parityCheck(alternating: Boolean): Unit = {
    val df = ratingsSeq.toDF
    val cfg0 = GdMf.Config(nFactors = 3, epochs = 0, lr = 0.01, reg = 0.1,
      alternating = alternating)
    val init = GdMf.fit(df, cfg0)
    val m = GdMf.fit(df, cfg0.copy(epochs = 3))
    val obs = ratingsSeq.map(r => (r.user, r.item, r.rating))
    val (wu, wi) = naive(obs,
      state(init.userState, "user", "u_factors", "u_bias"),
      state(init.itemState, "item", "i_factors", "i_bias"),
      init.stats.meanRating, 0.01, 0.1, 3, alternating)
    assertClose(state(m.userState, "user", "u_factors", "u_bias"), wu)
    assertClose(state(m.itemState, "item", "i_factors", "i_bias"), wi)
  }

  test("FunkSVD matches the reference formulas over 3 epochs (incl. both traps)") {
    parityCheck(alternating = false)
  }

  test("ALS-GD matches the reference's alternating schedule over 3 epochs") {
    parityCheck(alternating = true)
  }

  test("checkpointInterval=2 yields the identical model to interval=1") {
    // locks the deferred-release ordering: with interval > 1 the item
    // side's uncut lazy chain still reads the previous generation's
    // checkpoint blocks when the user cut runs (premature release threw
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND); results must also be
    // bit-identical since cadence only changes WHERE lineage is cut
    val df = ratingsSeq.toDF
    def fitWith(ci: Int) = {
      val m = GdMf.fit(df, GdMf.Config(nFactors = 3, epochs = 4,
        lr = 0.01, reg = 0.01, checkpointInterval = ci))
      (state(m.userState, "user", "u_factors", "u_bias"),
        state(m.itemState, "item", "i_factors", "i_bias"))
    }
    val (u1, i1) = fitWith(1)
    val (u2, i2) = fitWith(2)
    assert(u1.keySet === u2.keySet && i1.keySet === i2.keySet)
    for (k <- u1.keySet) {
      assert(u1(k)._1.zip(u2(k)._1).forall { case (a, b) => math.abs(a - b) < 1e-12 })
      assert(math.abs(u1(k)._2 - u2(k)._2) < 1e-12)
    }
    for (k <- i1.keySet) {
      assert(i1(k)._1.zip(i2(k)._1).forall { case (a, b) => math.abs(a - b) < 1e-12 })
      assert(math.abs(i1(k)._2 - i2(k)._2) < 1e-12)
    }
  }

  test("FunkSVD converges on an exactly-factorizable rank-1 matrix") {
    // FIXTURES.md F3 rank-1: rating(u,i) = p(u)*q(i), all cells observed
    val p = Seq(1.0, 2.0, 3.0)
    val q = Seq(1.0, 0.5, 2.0, 1.0)
    val cells = for {
      (pu, u) <- p.zipWithIndex
      (qi, i) <- q.zipWithIndex
    } yield Rating(s"u$u", s"i$i", pu * qi, (u * 4 + i).toLong)
    val cfg = GdMf.Config(nFactors = 2, epochs = 40, lr = 0.1, reg = 0.0,
      collectErrors = true)
    val m = GdMf.fit(cells.toDF, cfg)
    val first = m.trainErrors.head._2.rmse
    val last = m.trainErrors.last._2.rmse
    assert(last < first * 0.35, s"rmse did not descend: $first -> $last")
    // training error history is epoch-indexed and finite
    assert(m.trainErrors.map(_._1) === (0 until 40))
    assert(m.trainErrors.forall { case (_, mm) =>
      !mm.mae.isNaN && mm.rmse * mm.rmse - mm.mse < 1e-9
    })
  }

  test("plan-template loop produces the identical model to the legacy loop") {
    val rnd = new scala.util.Random(7)
    val cells = for {
      u <- 0 until 25; i <- 0 until 15 if rnd.nextDouble() < 0.4
    } yield Rating(s"u$u", s"i$i", 1.0 + rnd.nextInt(5), (u * 100 + i).toLong)
    for (alternating <- Seq(false, true)) {
      val base = GdMf.Config(nFactors = 3, epochs = 4, lr = 0.01, reg = 0.01,
        alternating = alternating, collectErrors = true)
      val templ = GdMf.fit(cells.toDF, base.copy(planTemplates = true))
      val legacy = GdMf.fit(cells.toDF, base.copy(planTemplates = false))
      def states(m: GdMf.Model): (Seq[(String, Seq[Double], Double)], Seq[(String, Seq[Double], Double)]) = (
        m.userState.as[(String, Seq[Double], Double)].collect().sortBy(_._1).toSeq,
        m.itemState.as[(String, Seq[Double], Double)].collect().sortBy(_._1).toSeq)
      assert(states(templ) === states(legacy),
        s"state divergence (alternating=$alternating)")
      assert(templ.trainErrors === legacy.trainErrors,
        s"history divergence (alternating=$alternating)")
      templ.release(); legacy.release()
    }
  }

  test("Model.release drops the backing checkpoint blocks") {
    val r = Seq(
      Rating("u1", "i1", 2.0, 1L), Rating("u1", "i2", 3.0, 2L),
      Rating("u2", "i1", 4.0, 3L), Rating("u2", "i2", 5.0, 4L)).toDF
    val m = GdMf.fit(r, GdMf.Config(nFactors = 2, epochs = 2))
    m.userState.count() // usable before release
    val before = spark.sparkContext.getPersistentRDDs.size
    m.release()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after < before,
      s"release() freed no blocks: $before -> $after persistent RDDs")
  }
}
