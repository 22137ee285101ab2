package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A6 + F6 — min-max scaling with exact inverse (reference:
  * sklearn MinMaxScaler usage in paqarin/adapters/ydata_adapter.py:64-93,
  * 217-253; golden round-trip values in tests/test_doppleganger.py:42-57).
  *
  * Implemented as plain column arithmetic over a one-row stats aggregate
  * rather than MLlib's vector-based `MinMaxScaler`: float64 all the way,
  * which is what the oracle compares (SURVEY.md §7.4 item 3). The fitted
  * stats are a driver-side map (2 doubles per column — trivially
  * broadcastable at any scale).
  */
object Scaling {

  final case class MinMaxStats(stats: Map[String, (Double, Double)]) {

    /** F6 forward: (x − min) / (max − min); constant columns map to 0.0
      * (sklearn maps them to 0 via its zero-range guard). */
    def transform(df: DataFrame): DataFrame =
      stats.foldLeft(df) { case (d, (c, (lo, hi))) =>
        val range = hi - lo
        val scaled: Column =
          if (range == 0.0) lit(0.0) else (col(c) - lit(lo)) / lit(range)
        d.withColumn(c, scaled)
      }

    /** F6 inverse: x · (max − min) + min (reference:
      * paqarin/adapters/ydata_adapter.py:75-93). */
    def inverse(df: DataFrame): DataFrame =
      stats.foldLeft(df) { case (d, (c, (lo, hi))) =>
        d.withColumn(c, col(c) * lit(hi - lo) + lit(lo))
      }
  }

  /** A6 fit: one aggregate pass collecting per-column min/max
    * (reference: MinMaxScaler.fit, paqarin/adapters/ydata_adapter.py:54,223).
    */
  def fit(df: DataFrame, cols: Seq[String]): MinMaxStats = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    MinMaxStats(cols.zipWithIndex.map { case (c, i) =>
      c -> (row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }.toMap)
  }

  /** Distributed variant: scale within groups without collecting stats —
    * window min/max per `partitionCols`, all in one pass, no driver round
    * trip. Preferred at scale when scaling is per-entity.
    */
  def scaleWithinGroups(
      df: DataFrame,
      partitionCols: Seq[String],
      valueCol: String,
      outCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(partitionCols.map(col): _*)
    val lo = min(col(valueCol)).over(w)
    val hi = max(col(valueCol)).over(w)
    df.withColumn(
      outCol,
      when(hi === lo, lit(0.0)).otherwise((col(valueCol) - lo) / (hi - lo)))
  }
}
