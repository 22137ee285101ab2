package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §4.2 "Partitioning/shuffle" row;
  * builder-prompt scale checklist: "Skewed keys → salting or AQE
  * skew-join").
  *
  * AQE handles skewed sort-merge JOINS automatically
  * (`spark.sql.adaptive.skewJoin.enabled`); these helpers cover skewed
  * AGGREGATIONS, where one hot key would otherwise serialize the final
  * reduce: pre-aggregate on (key, salt) — spreading a hot key over
  * `saltBuckets` reducers — then combine the partials per key.
  */
object Skew {

  /** Two-stage salted sum: algebraic, so partials combine exactly. */
  def saltedSum(
      df: DataFrame,
      keyCols: Seq[String],
      valueCols: Seq[String],
      saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn(
      "__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(valueCols.map(c => sum(col(c)).as(c)).head,
        valueCols.map(c => sum(col(c)).as(c)).tail: _*)
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(valueCols.map(c => sum(col(c)).as(c)).head,
        valueCols.map(c => sum(col(c)).as(c)).tail: _*)
  }

  /** Two-stage salted count per key. */
  def saltedCount(
      df: DataFrame,
      keyCols: Seq[String],
      outCol: String = "n",
      saltBuckets: Int = 32): DataFrame = {
    val salted = df.withColumn(
      "__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(outCol))
  }

  /** Salted broadcast-side replication for a skewed equi-join: replicate
    * the small side `saltBuckets`× with an explicit salt column and salt
    * the big side's key, so one hot key spreads over `saltBuckets` tasks.
    * Use when AQE's skew-join split can't kick in (e.g. a broadcast is
    * impossible and the hot key dominates a sort-merge partition).
    *
    * Returns (saltedBig, replicatedSmall, joinCols) — join them with
    * `saltedBig.join(replicatedSmall, joinCols)`.
    */
  def saltedJoinSides(
      big: DataFrame,
      small: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int = 8): (DataFrame, DataFrame, Seq[String]) = {
    val saltedBig = big.withColumn(
      "__salt", pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)).cast("int"))
    val replicated = small.withColumn(
      "__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    (saltedBig, replicated, keyCols :+ "__salt")
  }
}
