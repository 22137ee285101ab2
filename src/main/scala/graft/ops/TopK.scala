package graft.ops

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, SortOrder}
import org.apache.spark.sql.functions.col

import graft.plans.{TopKPerGroup, TopKStrategy}

/** Public face of the custom top-k-per-group operator
  * ([[graft.plans.TopKPerGroup]]): keeps the k best rows per group under
  * `orderBy` with a bounded heap per group on both sides of one shuffle —
  * the scale replacement for `row_number().over(...) <= k`, which must
  * fully sort every group. Output row set equals the window form whenever
  * the ordering is total (add a tie-break column to make it so).
  */
object TopK {

  /** Registers the planner strategy once per session (idempotent — also
    * detects the copy GraftExtensions injects at session build time, so
    * extension-built sessions don't consult the strategy twice). */
  def enable(spark: org.apache.spark.sql.SparkSession): Unit = {
    val present =
      spark.experimental.extraStrategies.contains(TopKStrategy) ||
        spark.sessionState.planner.strategies.contains(TopKStrategy)
    if (!present)
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }

  /** @param orderBy sort columns, e.g. `Seq(col("value").desc, col("id"))`;
    *                plain columns sort ascending */
  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderBy: Seq[Column],
      k: Int): DataFrame =
    build(df, groupCols, orderBy, k, rankCol = None)

  /** [[perGroup]] that also EMITS each row's rank (1 = best) as `rankCol`,
    * assigned during the final heap drain — the `row_number().over(...)`
    * equivalent with no Window node and no per-group sort in the plan.
    * Ranks are deterministic when the ordering is total (tie-break). */
  def perGroupRanked(
      df: DataFrame,
      groupCols: Seq[String],
      orderBy: Seq[Column],
      k: Int,
      rankCol: String = "rank"): DataFrame = {
    require(!df.columns.contains(rankCol),
      s"rank column '$rankCol' already exists in the input")
    build(df, groupCols, orderBy, k, rankCol = Some(rankCol))
  }

  private def build(
      df: DataFrame,
      groupCols: Seq[String],
      orderBy: Seq[Column],
      k: Int,
      rankCol: Option[String]): DataFrame = {
    require(groupCols.nonEmpty,
      "TopK.perGroup needs at least one group column; for a global top-k " +
        "use orderBy(...).limit(k), which Spark already plans as TakeOrdered")
    val spark = df.sparkSession
    enable(spark)
    val order = orderBy.map(c => GraftColumnBridge.eagerExpression(spark, c) match {
      case s: SortOrder => s
      case e => SortOrder(e, Ascending)
    })
    val rankAttr = rankCol.map(n =>
      org.apache.spark.sql.catalyst.expressions.AttributeReference(
        n, org.apache.spark.sql.types.IntegerType, nullable = false)())
    GraftColumnBridge.ofRows(
      spark,
      TopKPerGroup(
        groupCols.map(n => GraftColumnBridge.eagerExpression(spark, col(n))),
        order, k, df.queryExecution.logical, rankAttr))
  }
}
