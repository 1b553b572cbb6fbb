package graft.io

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join without any shuffle exchange") {
    val orders = (1L to 2000L).map(k => (k, s"o$k")).toDF("key", "o")
    val lines = (1L to 2000L).flatMap(k => Seq((k, k * 10), (k, k * 10 + 1)))
      .toDF("key", "l")

    Bucketing.writeBucketed(orders, "graft_bkt_orders", "key", 8)
    Bucketing.writeBucketed(lines, "graft_bkt_lines", "key", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force sort-merge so the exchange (or its absence) is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_orders")
        .join(spark.table("graft_bkt_lines"), "key")
      joined.collect() // execute so AQE finalizes the plan
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free co-bucketed join, found ${shuffles.size} exchanges")
      assert(joined.count() === 4000)
      // same result as the plain (shuffling) join
      val plain = orders.join(lines, "key")
      assert(joined.exceptAll(plain).count() === 0)
      assert(plain.exceptAll(joined).count() === 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_orders")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_lines")
    }
  }
}
