package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Metric bookkeeping as a DataFrame — the reference's `MetricManager`
  * dict-of-lists (paqarin/evaluation.py:57-62) becomes a long table
  * `(generator_name, iteration, metric_key, value)` so every summary is one
  * aggregation.
  */
object Metrics {

  val Schema: Seq[String] = Seq("generator_name", "iteration", "metric_key", "value")

  def empty(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Int, String, Double)].toDF(Schema: _*)
  }

  def record(
      metrics: DataFrame,
      generator: String,
      iteration: Int,
      key: String,
      value: Double): DataFrame = {
    import metrics.sparkSession.implicits._
    metrics.unionByName(
      Seq((generator, iteration, key, value)).toDF(Schema: _*))
  }

  /** A7 avg + A8 population stddev per (generator, metric) — the reference's
    * `avg_<k>` / `std_<k>` summary (paqarin/evaluation.py:96-104;
    * ddof=0 ⇒ stddev_pop, SURVEY §4.3 trap 2).
    */
  def summary(metrics: DataFrame): DataFrame =
    metrics
      .groupBy(col("generator_name"), col("metric_key"))
      .agg(
        avg(col("value")).as("avg_value"),
        stddev_pop(col("value")).as("std_value"),
        count(lit(1)).as("iterations"))

  /** A11 — best generator = argmin of the average metric
    * (paqarin/evaluation.py:122-123). */
  def bestGenerator(metrics: DataFrame, metricKey: String): Option[String] =
    summary(metrics)
      .filter(col("metric_key") === metricKey)
      .orderBy(col("avg_value"), col("generator_name"))
      .select(col("generator_name"))
      .head(1).headOption.map(_.getString(0))

  /** A9 — mean absolute error between two value columns after an equi-join
    * on `keyCols` (sklearn mean_absolute_error over all cells,
    * paqarin/metrics/multivariate_metrics.py:224). */
  def mae(
      predictions: DataFrame,
      labels: DataFrame,
      keyCols: Seq[String],
      predCol: String,
      labelCol: String): Double =
    predictions
      .join(labels, keyCols)
      .agg(avg(abs(col(predCol) - col(labelCol))).as("mae"))
      .head().getDouble(0)
}
