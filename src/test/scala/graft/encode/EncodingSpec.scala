package graft.encode

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Rating

class EncodingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    Rating("b", "i1", 5.0, 30L),
    Rating("a", "i2", 3.0, 10L),
    Rating("c", "i1", 1.0, 20L),
    Rating("a", "i3", 4.0, 40L)).toDF

  test("dimension assigns dense contiguous ids 0..n-1 by first appearance") {
    val dim = Encoding.dimension(fixture, "user", "time", "u_id")
    val got = dim.orderBy("u_id").as[(String, Int)].collect().toSeq
    // first-appearance order by min(time): a(10) < c(20) < b(30)
    assert(got === Seq(("a", 0), ("c", 1), ("b", 2)))
  }

  test("encode attaches ids bijectively, preserving row count") {
    val u = Encoding.dimension(fixture, "user", "time", "u_id")
    val i = Encoding.dimension(fixture, "item", "time", "i_id")
    val enc = Encoding.encode(fixture, u, i)
    assert(enc.count() === 4)
    assert(enc.filter(col("u_id").isNull || col("i_id").isNull).count() === 0)
    // decoding back via the dim tables is lossless
    val decoded = enc.select("u_id", "i_id", "rating", "time")
      .join(u, "u_id").join(i, "i_id")
      .select("user", "item", "rating", "time")
    assert(decoded.except(fixture).count() === 0)
  }

  test("dimensionAtScale produces the identical mapping to dimension") {
    // larger key space than partitions so range partitioning is exercised
    val rows = (1 to 500).map { i =>
      Rating(s"u${i % 137}", s"i$i", 1.0, (1000 - i).toLong)
    }
    val df = rows.toDF
    val viaWindow = Encoding.dimension(df, "user", "time", "u_id")
      .orderBy("u_id").as[(String, Int)].collect().toSeq
      .map { case (k, id) => (k, id.toLong) }
    val atScale = Encoding.dimensionAtScale(df, "user", "time", "u_id",
      numPartitions = 7)
      .orderBy("u_id").as[(String, Long)].collect().toSeq
    assert(atScale === viaWindow)
    // dense contiguous 0..n-1 in the wide (Long) id space
    assert(atScale.map(_._2) === (0L until 137L))
  }

  test("dimensionAuto switches implementation at the key-count threshold") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val rows = (1 to 100).map(i => Rating(s"u${i % 17}", s"i$i", 1.0, (200 - i).toLong))
    val df = rows.toDF
    val small = Encoding.dimensionAuto(df, "user", "time", "u_id",
      approxKeys = 17, maxWindowKeys = 1000)
    val big = Encoding.dimensionAuto(df, "user", "time", "u_id",
      approxKeys = 17, maxWindowKeys = 5) // force the at-scale path
    // the swap happened: window path numbers in Int, at-scale in Long
    assert(small.schema("u_id").dataType === IntegerType)
    assert(big.schema("u_id").dataType === LongType)
    // and the mappings are identical
    val a = small.as[(String, Int)].collect().map { case (k, v) => (k, v.toLong) }.sorted.toSeq
    val b = big.as[(String, Long)].collect().sorted.toSeq
    assert(a === b)
  }

  test("ratingStats computes all six statistics in one pass") {
    val st = Encoding.ratingStats(fixture)
    assert(st.nRatings === 4 && st.nUsers === 3 && st.nItems === 3)
    assert(st.minRating === 1.0 && st.maxRating === 5.0)
    assert(math.abs(st.meanRating - 3.25) < 1e-12)
  }
}
