package graft.joins

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal lookup) join — for each left row, the single most
  * recent right row with `rightTime <= leftTime` on the same key. The
  * join family Spark lacks natively (SURVEY §2.4 "absent"; a
  * training-data pipeline needs it constantly: enrich an event with the
  * latest profile/model/price snapshot at event time).
  *
  * Spark-first formulation: NOT a theta-join (`l.t >= r.t` pair
  * explosion, quadratic per key) but a tagged UNION + one window pass —
  * sort each key's merged timeline once and carry the last-seen right
  * ROW forward (`last(ignoreNulls)` of a struct over an
  * unbounded-preceding frame; the struct is atomic, so a right row with
  * null value columns is carried as-is rather than mixed with older
  * rows). One shuffle on the key, O(n log n) per key, no pair blowup;
  * identical to how a streaming backfill would process the timeline.
  *
  * Determinism: a left and right row at the same timestamp match
  * (<= — the right row sorts first); multiple RIGHT rows on the same
  * (key, time) are unspecified-order — pre-aggregate the right side to
  * one row per (key, time) for a deterministic result.
  */
object AsofJoin {

  /** @param rValueCols right-side columns to carry onto left rows
    * @param strict     true = inner semantics (left rows with no prior
    *                   right row are dropped); false = keep them with
    *                   null carried values
    */
  def asOf(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rValueCols: Seq[String], strict: Boolean = true): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, rValueCols, strict, None)

  /** As-of with an upper staleness bound: match only right rows within
    * `maxAge` time units (same unit as the time columns) of the left
    * row. Same single window pass; the carried right time is filtered
    * on age.
    */
  def asOfWithin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rValueCols: Seq[String], maxAge: Column): DataFrame =
    asOfImpl(left, right, keys, leftTime, rightTime, rValueCols,
      strict = true, Some(maxAge))

  private def asOfImpl(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rValueCols: Seq[String], strict: Boolean,
      maxAge: Option[Column]): DataFrame = {
    val reserved = Set("__t", "__side", "__rrow")
    val collisions = rValueCols.toSet
      .intersect(left.columns.toSet -- keys)
    require(collisions.isEmpty,
      s"rValueCols collide with left columns ${collisions.mkString(", ")}; " +
        "rename or drop them on one side first")
    require(!(left.columns ++ right.columns ++ rValueCols)
        .exists(reserved), s"column names ${reserved.mkString(", ")} are reserved")
    val lCarry =
      left.columns.filterNot(c => keys.contains(c) || c == leftTime).toSeq

    // The entire candidate right row travels as ONE struct: it is
    // non-null exactly on right rows, so last(ignoreNulls) yields the
    // latest right ROW — match marker, staleness time, and values in
    // one atomic unit.
    val rStruct = struct(
      col(rightTime).as("__rt") +: rValueCols.map(col): _*)
    val rPrep = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        lCarry.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rStruct.as("__rrow"): _*)
    val lPrep = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        lCarry.map(col): _*)
      .withColumn("__rrow", lit(null).cast(rPrep.schema("__rrow").dataType))

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var out = lPrep.unionByName(rPrep)
      .withColumn("__rrow", last(col("__rrow"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    if (strict) out = out.filter(col("__rrow").isNotNull)
    maxAge.foreach(age => out = out.filter(col("__t") - col("__rrow.__rt") <= age))
    rValueCols.foldLeft(
      out.withColumnRenamed("__t", leftTime)) { (df, c) =>
      df.withColumn(c, col(s"__rrow.$c"))
    }.drop("__side", "__rrow")
  }
}
