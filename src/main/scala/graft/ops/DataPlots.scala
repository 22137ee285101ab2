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

  /** `plot_metrics` prep twin (data_plots.py:97-110, the per-generator
    * metric box plot): per group, the exact statistics `plt.boxplot`
    * derives from the raw values — linear-interpolated quartiles
    * (matplotlib/numpy type-7, Spark `percentile`'s convention), the
    * 1.5·IQR whiskers CLAMPED TO DATA (lowest/highest observation inside
    * the fences, matplotlib semantics — not the raw fence values), and
    * the outlier count. One quartile aggregate over the metric frame,
    * one broadcast-back, one conditional aggregate — only KBs of box
    * statistics ever reach the plotting client.
    */
  def metricsBoxFrame(
      metrics: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      whiskerIqr: Double = 1.5,
      roundTo: Int = 6): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(whiskerIqr >= 0, s"whiskerIqr must be >= 0, got $whiskerIqr")
    // the percentile call goes through a SQL string — backtick-quote the
    // column so names with spaces/dots work like everywhere else
    require(!valueCol.contains("`"),
      s"valueCol must not contain a backtick: $valueCol")
    val v = col(valueCol).cast("double")
    val q = metrics.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile(`$valueCol`, array(0.25D, 0.5D, 0.75D))")
          .as("__q"),
        count(v).as("n_values"))
      .select(groupCols.map(col) :+ col("n_values") :+
        element_at(col("__q"), 1).as("__q1") :+
        element_at(col("__q"), 2).as("__q2") :+
        element_at(col("__q"), 3).as("__q3"): _*)
    val fenced = metrics
      .join(broadcast(q), groupCols)
      .withColumn("__lo_fence",
        col("__q1") - lit(whiskerIqr) * (col("__q3") - col("__q1")))
      .withColumn("__hi_fence",
        col("__q3") + lit(whiskerIqr) * (col("__q3") - col("__q1")))
    fenced.groupBy(groupCols.map(col): _*)
      .agg(
        first(col("n_values")).as("n_values"),
        round(first(col("__q1")), roundTo).as("q1"),
        round(first(col("__q2")), roundTo).as("median"),
        round(first(col("__q3")), roundTo).as("q3"),
        round(min(when(v >= col("__lo_fence"), v)), roundTo)
          .as("whisker_lo"),
        round(max(when(v <= col("__hi_fence"), v)), roundTo)
          .as("whisker_hi"),
        sum(when(v < col("__lo_fence") || v > col("__hi_fence"), 1L)
          .otherwise(0L)).as("n_outliers"))
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
