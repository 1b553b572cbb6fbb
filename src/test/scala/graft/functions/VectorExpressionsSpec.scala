package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
    (Array(1.0, 0.0), Array(0.0, 1.0)),
    (Array(2.0, 0.0), Array(4.0, 0.0))).toDF("a", "b")

  test("DotProduct matches the higher-order-function formulation bitwise") {
    val hof = aggregate(zip_with($"a", $"b", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(VectorExpressions.dot($"a", $"b").as("native"),
      hof.as("hof")).as[(Double, Double)].collect()
    rows.foreach { case (n, h) => assert(n === h) }
    assert(rows(0)._1 === 32.0)
  }

  test("CosineSim: orthogonal=0, colinear=1, zero-norm-safe") {
    val got = df.select(VectorExpressions.cosine($"a", $"b")).as[Double].collect()
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
    val zero = Seq((Array(0.0, 0.0), Array(1.0, 2.0))).toDF("a", "b")
      .select(VectorExpressions.cosine($"a", $"b")).as[Double].head()
    assert(zero === 0.0)
  }

  test("null inputs propagate null") {
    val n = Seq((Some(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
      .select(VectorExpressions.dot($"a", $"b"))
    assert(n.filter(n.columns.map(col(_).isNull).reduce(_ && _)).count() === 1)
  }

  test("expressions survive whole-stage codegen in a real aggregation plan") {
    // force the codegen path through a filter+agg pipeline
    val big = spark.range(1000).select(
      transform(sequence(lit(0), lit(15)), i => (i + col("id")).cast("double")).as("a"),
      transform(sequence(lit(0), lit(15)), i => (i * 2 + col("id")).cast("double")).as("b"))
    val s = big.select(VectorExpressions.dot($"a", $"b").as("d"),
      VectorExpressions.cosine($"a", $"b").as("c"))
      .filter($"d" > 0)
      .agg(sum($"d"), avg($"c")).as[(Double, Double)].head()
    assert(s._1 > 0 && s._2 > 0 && s._2 <= 1.0)
  }

  test("graft_dot / graft_cosine register as SQL functions") {
    GraftFunctions.register(spark)
    df.createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT graft_dot(a, b) AS d, graft_cosine(a, b) AS c FROM vecs")
      .as[(Double, Double)].collect()
    assert(r(0)._1 === 32.0)
    assert(math.abs(r(2)._2 - 1.0) < 1e-12)
  }

  test("graft_pq_* kernels register as SQL functions") {
    GraftFunctions.register(spark)
    // 2 subspaces x 2 centroids x 2 dims, centroids = (1,1) and (-1,-1)
    // per subspace; vector (1,1,-1,-1) -> codes [0,1], self-ADC = 4
    val r = spark.sql(
      """SELECT
        |  graft_pq_encode(v, c, 2, 2) AS codes,
        |  graft_pq_adc_score(graft_pq_encode(v, c, 2, 2),
        |                     graft_pq_adc_table(v, c, 2, 2), 2) AS adc
        |FROM (SELECT array(1D, 1D, -1D, -1D) AS v,
        |             array(1D, 1D, -1D, -1D, 1D, 1D, -1D, -1D) AS c)
        |""".stripMargin).as[(Seq[Int], Double)].head()
    assert(r._1 === Seq(0, 1))
    assert(math.abs(r._2 - 4.0) < 1e-12)
  }
}
