package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Composed prep chains that the reference's scorers run before modeling. */
object ForecastPrep {

  /** The AutoGluon data transform (reference:
    * `AutoGluonDataTransformer.transform`,
    * paqarin/metrics/univariate_metrics.py:53-109): canonical renames (P2),
    * keep-first dedup of (item, ts) (P5), regular calendar index with the
    * first observation per bucket (A4/J2), zero fill (P6), and the weekend
    * covariate (W6). Golden fixture F-5
    * (tests/test_univariate_metrics.py:52-87).
    *
    * One aggregation shuffle + broadcast calendar join; covariate is a
    * scan-side projection.
    */
  def autoGluonTransform(
      df: DataFrame,
      itemCol: String,
      tsCol: String,
      targetCol: String,
      orderCol: String,
      unit: String = "day"): DataFrame = {
    val renamed = df.select(
      col(itemCol).as("item_id"),
      col(tsCol).as("timestamp"),
      col(targetCol).as("target"),
      col(orderCol).as("__ord"))
    val deduped = TimeSeriesOps.dedupKeepFirst(
      renamed, Seq("item_id", "timestamp"), "__ord")
    val regular = FrameOps.toRegularIndex(
      deduped, "item_id", "timestamp", "__ord", Seq("target"), unit)
    regular
      .select(col("item_id"), col("bucket").as("timestamp"), col("target"))
      .withColumn("is_weekend", TimeSeriesOps.weekendFlag(col("timestamp")))
  }

  /** A12+U2 — drop items whose frequency cannot be inferred (reference:
    * univariate_metrics.py:81-95,111-119 drops `inferred_freq is None`
    * items via an anti-filter).
    *
    * Two strictness levels:
    *  - default: an item needs at least `minObs` distinct timestamps — the
    *    loose proxy, enough for the median/modal gap estimators.
    *  - `requireRegular = true`: pandas-parity. `infer_freq` returns a
    *    frequency only for a series whose gaps all conform to one pattern
    *    (and needs ≥ 3 points); so an item is dropped unless it has ≥
    *    max(minObs, 3) distinct timestamps AND exactly one distinct
    *    inter-arrival gap. An irregular series is dropped here even though
    *    the median/modal estimators would happily report a number for it —
    *    the divergence the A12 spec pins down. */
  def dropItemsWithoutFrequency(
      df: DataFrame,
      itemCol: String,
      tsCol: String,
      minObs: Int = 2,
      requireRegular: Boolean = false): DataFrame = {
    val bad =
      if (!requireRegular)
        df.groupBy(col(itemCol))
          .agg(countDistinct(col(tsCol)).as("__n"))
          .filter(col("__n") < minObs)
          .select(col(itemCol))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(itemCol)).orderBy(col(tsCol))
        df.withColumn("__s", unix_timestamp(date_trunc("second", col(tsCol))))
          .withColumn("__gap", col("__s") - lag(col("__s"), 1).over(w))
          .groupBy(col(itemCol))
          .agg(countDistinct(col(tsCol)).as("__n"),
            countDistinct(col("__gap")).as("__g"))
          .filter(col("__n") < math.max(minObs, 3) || col("__g") > 1)
          .select(col(itemCol))
      }
    df.join(broadcast(bad), Seq(itemCol), "left_anti")
  }

  /** The synthcity preprocess bundle (reference: `preprocess_data`,
    * paqarin/adapters/synthcity_adapter.py:190-245; fixture F-6,
    * tests/test_synthcity_adapter.py:257-304): surrogate-keyed temporal
    * frame with nulls zero-filled, per-entity static attribute frame, and
    * the constant-zero outcome frame. */
  final case class SequenceBundle(
      temporal: DataFrame, static: DataFrame, outcome: DataFrame)

  def sequenceBundle(
      df: DataFrame,
      idCols: Seq[String],
      tsCol: String,
      numericCols: Seq[String],
      catCols: Seq[String],
      orderCol: String): SequenceBundle = {
    val keyed = TimeSeriesOps.addSurrogateKey(df, idCols, orderCol)
    val temporal = keyed
      .select((Seq("surrogate_item_id", tsCol) ++ numericCols).map(col): _*)
      .na.fill(0.0, numericCols)
    val static = keyed
      .select((Seq("surrogate_item_id") ++ idCols ++ catCols).map(col): _*)
      .dropDuplicates("surrogate_item_id")
    val outcome = static
      .select(col("surrogate_item_id"))
      .withColumn("outcome", lit(0))
    SequenceBundle(temporal, static, outcome)
  }
}
