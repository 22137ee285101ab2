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

  /** `plot_and_compare` prep twin (data_plots.py:37-67): the real and
    * synthetic sequences aligned positionally and melted to one long
    * plot-ready frame `(seqCols…, orderCol, column, real, synthetic)` —
    * one row per (position, measurement column), exactly the pandas frame
    * `plot_column_comparison` builds per column, for all columns at once.
    * Alignment is a full outer join on (seqCols, orderCol): length
    * mismatches surface as nulls on one side (the reference's positional
    * indexing would instead crash or silently truncate). */
  def comparisonFrame(
      real: DataFrame,
      synthetic: DataFrame,
      seqCols: Seq[String],
      orderCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val keys = seqCols :+ orderCol
    val r = real.select(
      keys.map(col) ++ valueCols.map(c => col(c).as(s"__r_$c")): _*)
    val s = synthetic.select(
      keys.map(col) ++ valueCols.map(c => col(c).as(s"__s_$c")): _*)
    val joined = r.join(s, keys, "full_outer")
    val melted = explode(array(valueCols.map(c => struct(
      lit(c).as("column"),
      col(s"__r_$c").cast("double").as("real"),
      col(s"__s_$c").cast("double").as("synthetic"))): _*))
    joined
      .select(keys.map(col) :+ melted.as("__m"): _*)
      .select(keys.map(col) :+ col("__m.column") :+ col("__m.real")
        :+ col("__m.synthetic"): _*)
  }

  /** `plot_predictions` prep twin (data_plots.py:70-94): labels plus any
    * number of named prediction series melted to one long frame
    * `(orderCol, series, value)` with the label series named "Label"
    * (the reference's legend name). One row per (position, series) —
    * the tidy shape every client-side plotting library takes directly. */
  def predictionsFrame(
      labels: DataFrame,
      predictions: Seq[(String, DataFrame)],
      orderCol: String,
      valueCol: String): DataFrame = {
    require(!predictions.exists(_._1 == "Label"),
      "prediction series name 'Label' collides with the label series")
    val arms = (("Label", labels) +: predictions).map { case (name, df) =>
      df.select(col(orderCol),
        lit(name).as("series"), col(valueCol).cast("double").as("value"))
    }
    arms.reduce(_ unionByName _)
  }
}
