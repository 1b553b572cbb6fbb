package graft.recommender

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regression metrics of the serving surface (reference
  * `models/als.py:219-223` `eval` → (mae, mse, rmse)).
  */
final case class Metrics(mae: Double, mse: Double, rmse: Double)

object Evaluator {

  /** MAE/MSE/RMSE in ONE distributed pass (the reference computes three
    * separate NumPy reductions on driver-collected arrays). A single
    * hash-free global aggregate: partial sums per partition, one final
    * reduce — O(1) driver memory at any scale.
    */
  def evaluate(df: DataFrame, labelCol: String, predCol: String): Metrics = {
    val err = col(predCol) - col(labelCol)
    val row = df.agg(
      avg(abs(err)).as("mae"),
      avg(err * err).as("mse")).head()
    val mae = row.getDouble(0)
    val mse = row.getDouble(1)
    Metrics(mae, mse, math.sqrt(mse))
  }

  /** Same metrics as a one-row DataFrame (for oracle-differential tests
    * and the `queries` surface).
    */
  def evaluateDf(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val err = col(predCol) - col(labelCol)
    df.agg(
      avg(abs(err)).as("mae"),
      avg(err * err).as("mse"),
      sqrt(avg(err * err)).as("rmse"))
  }
}
