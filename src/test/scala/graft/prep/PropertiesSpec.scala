package graft.prep

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.encode.Encoding
import graft.model.Rating
import graft.recommender.Evaluator

/** Property-based invariants (SURVEY §5.3): random rating tables →
  * dedup idempotence, split exactness, dense-bijection encoding,
  * metric identities.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val ratingGen: Gen[Rating] = for {
    u <- Gen.chooseNum(0, 40)
    i <- Gen.chooseNum(0, 25)
    r <- Gen.chooseNum(1, 5)
    t <- Gen.chooseNum(0L, 10000L)
  } yield Rating(s"u$u", s"i$i", r.toDouble, t)

  private val tableGen: Gen[List[Rating]] =
    Gen.chooseNum(1, 120).flatMap(n => Gen.listOfN(n, ratingGen))

  /** Minimal forAll: N seeded samples per property (the scalatestplus
    * bridge isn't in the offline cache).
    */
  private def forAll[A](g: Gen[A], n: Int = 8)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i))
        .foreach(a => body(a))
    }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    forAll(g1.flatMap(a => g2.map(b => (a, b))))(t => body(t._1, t._2))

  test("property: dedupExact is idempotent and minimal") {
    forAll(tableGen) { rows =>
      val df = rows.toDF
      val once = Prep.dedupExact(df)
      assert(once.count() === rows.distinct.size)
      assert(Prep.dedupExact(once).count() === once.count())
    }
  }

  test("property: dedupKeepLast keeps exactly one row per key") {
    forAll(tableGen) { rows =>
      val out = Prep.dedupKeepLast(rows.toDF, Seq("user", "item"),
        Seq(col("time"), col("rating")))
      assert(out.count() === rows.map(r => (r.user, r.item)).distinct.size)
    }
  }

  test("property: randomSplit partitions exactly (disjoint cover)") {
    forAll(tableGen, Gen.chooseNum(1L, 999L)) { (rows, seed) =>
      val df = rows.distinct.toDF
      val (a, b) = Prep.randomSplit(df, 0.7, seed)
      assert(a.count() + b.count() === rows.distinct.size)
      assert(a.intersect(b).count() === 0)
    }
  }

  test("property: encoding is a dense bijection 0..n-1") {
    forAll(tableGen) { rows =>
      val dim = Encoding.dimension(rows.toDF, "user", "time", "u_id")
      val ids = dim.select("u_id").as[Int].collect().sorted
      assert(ids.toSeq === (0 until rows.map(_.user).distinct.size))
    }
  }

  test("property: metric identities (rmse²=mse, all non-negative, zero iff exact)") {
    forAll(tableGen) { rows =>
      val df = rows.toDF.withColumn("prediction", col("rating") + lit(0.5))
      val m = Evaluator.evaluate(df, "rating", "prediction")
      assert(m.mae >= 0 && m.mse >= 0 && m.rmse >= 0)
      assert(math.abs(m.rmse * m.rmse - m.mse) < 1e-9)
      assert(math.abs(m.mae - 0.5) < 1e-9 && math.abs(m.mse - 0.25) < 1e-9)
      val exact = Evaluator.evaluate(
        rows.toDF.withColumn("prediction", col("rating")), "rating", "prediction")
      assert(exact.mae === 0.0 && exact.rmse === 0.0)
    }
  }
}
