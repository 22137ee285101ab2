package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for context-window batching (north-star extension —
  * the step between curation and training: documents are concatenated into
  * fixed token-budget bins so no context window trains half-empty).
  *
  * Exact greedy packing (close the bin when the next doc overflows) is
  * inherently sequential — a 100 TB corpus cannot thread one running total
  * through every document. The distributed form is BLOCKED packing:
  *  - shard the corpus deterministically (`shardCol`, e.g. `id % n`);
  *  - within a shard, order docs deterministically and take the EXCLUSIVE
  *    running token total (one window per shard, shards independent — the
  *    parallelism is the shard count, no global sort anywhere);
  *  - bin = floor(running-total / budget).
  * A bin may overflow by at most one document (the standard trade in
  * streaming packers); docs longer than the budget occupy their own bin.
  * Deterministic given (shard, order) — and expressible in ANSI SQL, so
  * the DuckDB oracle re-derives it exactly.
  */
object Packing {

  /** Per-document bin assignment: (input columns) + `bin` (long, unique
    * within shard) + `cum_before` (tokens before this doc in its bin run).
    *
    * @param shardCol deterministic shard key (keep cardinality ≥ cluster
    *                 parallelism; each shard is one window partition)
    * @param orderCol total order within the shard (ties break the pack)
    * @param tokenCol per-document token count
    * @param budget   bin capacity in tokens
    */
  def packBlocked(
      df: DataFrame,
      shardCol: Column,
      orderCol: String,
      tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col("__shard")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__shard", shardCol)
      .withColumn("cum_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / budget))
      .drop("__shard")
  }

  /** Bin-level summary (shard, bin, n_docs, sum_tokens) — the packing
    * manifest a batch loader consumes. */
  def packSummary(
      df: DataFrame,
      shardCol: Column,
      orderCol: String,
      tokenCol: String,
      budget: Long): DataFrame =
    packBlocked(df, shardCol, orderCol, tokenCol, budget)
      .withColumn("shard", shardCol)
      .groupBy(col("shard"), col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("sum_tokens"))
}
