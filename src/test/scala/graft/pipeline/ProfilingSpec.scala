package graft.pipeline

import graft.SparkSpec

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profileNumeric: exact counts, ranges and fixed-point mean, nulls excluded") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.25), (2.0, 10.25), (2.0, null), (null, 0.75))
      .toDF("a", "b")
    val got = Profiling.profileNumeric(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    // a: 3 non-null of 4, values {1,2,2} → mean 5/3 via micro-units
    assert(got(0) === (("a", 3L, 1L, 2L, 1.0, 2.0, 5000000.0 / 3 / 1e6)))
    // b: values {10.25, 10.25, 0.75} → floor-to-micro exact
    assert(got(1) === (("b", 3L, 1L, 2L, 0.75, 10.25, 21250000.0 / 3 / 1e6)))
  }

  test("profileNumeric is a single aggregation job, output rows = |columns|") {
    val df = (1 to 1000).map(i => (i.toDouble, i * 2.0, i * 3.0))
      .toDF("x", "y", "z")
    val got = Profiling.profileNumeric(df, Seq("x", "y", "z"))
    assert(got.count() === 3L)
    assert(got.columns.toSeq ===
      Seq("column", "n", "n_null", "n_distinct", "min_v", "max_v", "mean_v"))
  }
}
