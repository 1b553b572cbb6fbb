package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow

/** Stats-free eager local checkpoint.
  *
  * Spark 4's `Dataset.localCheckpoint` builds the replacement
  * `LogicalRDD` via `rewriteStatsAndConstraints`, which COPIES the
  * estimated statistics of the plan being cut into the new leaf. In an
  * iterative loop (checkpoint → join/aggregate → checkpoint → …) each
  * epoch's size-in-bytes estimate is a *product* over children that
  * include the previous epoch's leaf, so the carried `BigInt` compounds
  * geometrically — its digit count roughly doubles per epoch, and by
  * ~epoch 16 Catalyst's stats visitor spends MINUTES in
  * `BigInteger.multiply` (measured: a 20-epoch fit went from ~40 s of
  * real work to 25+ min of driver CPU inside
  * `SizeInBytesOnlyStatsPlanVisitor`).
  *
  * [[localCheckpointFresh]] reproduces what `localCheckpoint(true)`
  * does mechanically — materialize `queryExecution.toRdd` under a local
  * checkpoint — but rebuilds the DataFrame with
  * `internalCreateDataFrame`, whose `LogicalRDD` takes the DEFAULT leaf
  * statistics instead of the inherited ones. Loop operators that force
  * their own join strategies (broadcast hints) lose nothing from the
  * default stats, and the estimate can no longer snowball.
  */
object DatasetBridge {

  final case class FreshCheckpoint(df: DataFrame, rdd: RDD[InternalRow]) {
    /** Drop the checkpointed blocks (old epochs' state). Non-blocking. */
    def release(): Unit = rdd.unpersist(blocking = false)
  }

  def localCheckpointFresh(df: DataFrame): FreshCheckpoint = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count() // eager: materialize the cut now, like localCheckpoint(true)
    FreshCheckpoint(spark.internalCreateDataFrame(rdd, df.schema), rdd)
  }
}
