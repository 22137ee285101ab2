package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Plot-preparation utilities (reference: paqarin/utils/data_plots.py —
  * matplotlib rendering stays client-side; the engine's job is producing
  * small, plot-ready frames from arbitrarily large series).
  */
object DataPlots {

  /** O2 — head sample per entity (`head(data_points)` before plotting). */
  def headSample(
      df: DataFrame,
      idCol: String,
      orderCol: String,
      points: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= points)
      .drop("__rn")
  }

  /** Uniform per-entity downsample to ≤ `maxPoints` rows: keep every k-th
    * observation (k = ceil(n / maxPoints)) — deterministic, order-based,
    * one window pass. The 100 TB way to draw a line chart. */
  def downsample(
      df: DataFrame,
      idCol: String,
      orderCol: String,
      maxPoints: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col(orderCol))
    val n = Window.partitionBy(col(idCol))
    df.withColumn("__rn", row_number().over(w) - 1)
      .withColumn("__n", count(lit(1)).over(n))
      .withColumn("__k", ceil(col("__n") / maxPoints).cast("long"))
      .filter(col("__rn") % col("__k") === 0)
      .drop("__rn", "__n", "__k")
  }

  /** Per-bucket envelope (min/mean/max) for band plots: tumbling-window
    * summary instead of raw points. */
  def envelope(
      df: DataFrame,
      idCol: String,
      tsCol: String,
      valueCol: String,
      unit: String = "day"): DataFrame =
    df.groupBy(col(idCol), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(
        min(col(valueCol)).as("lo"),
        avg(col(valueCol)).as("mean"),
        max(col(valueCol)).as("hi"))
}
