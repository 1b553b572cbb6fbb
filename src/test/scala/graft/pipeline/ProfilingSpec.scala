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

  test("profileNumeric: empty table and all-null column yield null range, zero mean") {
    val empty = Seq.empty[(java.lang.Double, java.lang.Double)].toDF("a", "b")
    val gotEmpty = Profiling.profileNumeric(empty, Seq("a", "b")).collect()
    assert(gotEmpty.length === 2)
    gotEmpty.foreach { r =>
      assert(r.getLong(1) === 0L && r.getLong(2) === 0L && r.getLong(3) === 0L)
      assert(r.isNullAt(4) && r.isNullAt(5))
      assert(r.getDouble(6) === 0.0)
    }
    val allNull = Seq[(java.lang.Double, java.lang.Double)]((null, 1.0), (null, 2.0))
      .toDF("a", "b")
    val gotNull = Profiling.profileNumeric(allNull, Seq("a")).collect().head
    assert(gotNull.getLong(1) === 0L && gotNull.getLong(2) === 2L)
    assert(gotNull.isNullAt(4) && gotNull.isNullAt(5) && gotNull.getDouble(6) === 0.0)
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
