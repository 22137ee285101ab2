package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact GLOBAL value ranks without a single-partition window.
  *
  * `rank() OVER (ORDER BY v)` / `percent_rank()` are the curation
  * primitives behind score calibration (map a quality/perplexity score to
  * its corpus CDF position before thresholding or reweighting) — and the
  * naive window form moves the whole corpus through ONE task (Spark warns
  * `No Partition Defined for Window operation`). This is the
  * [[TimeSeriesOps.globalPosition]] pattern applied to VALUE ranks:
  *
  *  1. aggregate to per-distinct-value counts (one exchange; the frame is
  *     value-domain-sized, not corpus-sized — rounded scores collapse
  *     heavily);
  *  2. RANGE-partition the distinct values (equal values land in exactly
  *     one partition, so ties never straddle), run the running-count
  *     window WITHIN each range partition (parallel — bounded by the
  *     partition's value slice), and lift to a global prefix with
  *     per-PARTITION totals — the only driver materialization, P rows;
  *  3. join the (value → rank) table back to the input on the value.
  *
  * Rank semantics are SQL `rank()`: ties share `#{v' < v} + 1`;
  * `percent_rank = (rank − 1) / (N − 1)` (0 when N = 1). Rows with a NULL
  * value get NULL rank/percent_rank (engines disagree on null ordering —
  * callers that want them ranked can coalesce to a sentinel first).
  */
object Ranks {

  def globalValueRanks(
      df: DataFrame,
      valueCol: String,
      outRank: String = "rank",
      outPct: String = "percent_rank",
      roundPctTo: Int = 6): DataFrame = {
    require(df.columns.contains(valueCol), s"missing value column '$valueCol'")
    Seq(outRank, outPct, "__grv").foreach(c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with globalValueRanks output"))
    val spark = df.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val v = col(valueCol)
    val counts = df.filter(v.isNotNull)
      .groupBy(v.as("__grv")).agg(count(lit(1)).as("__n"))
    // localCheckpoint is MANDATORY (globalPosition's note): the
    // RangePartitioner seeds its boundary sample from the RDD id, so the
    // totals job and the final query must read ONE materialized
    // partitioning or their __pid assignments disagree.
    val ranged = counts.repartitionByRange(nPart, col("__grv"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val totals = ranged.groupBy(col("__pid")).agg(sum(col("__n")).as("__t"))
      .orderBy(col("__pid")).collect()
    var acc = 0L
    val partOffset: Map[Int, Long] = totals.map { r =>
      val e = r.getInt(0) -> acc
      acc += r.getLong(1)
      e
    }.toMap
    val n = acc
    val w = Window.partitionBy(col("__pid")).orderBy(col("__grv"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rankTable = ranged
      .withColumn("__local", coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn(outRank,
        col("__local") + lit(1L) +
          coalesce(element_at(typedLit(partOffset), col("__pid")), lit(0L)))
      .withColumn(outPct,
        if (n <= 1L) lit(0.0)
        else round((col(outRank) - 1L).cast("double") / lit((n - 1).toDouble),
          roundPctTo))
      .select(col("__grv"), col(outRank), col(outPct))
    // left join: NULL-valued rows keep NULL rank/pct. No broadcast hint —
    // the rank table is value-domain-sized.
    df.join(rankTable, v === col("__grv"), "left").drop("__grv")
  }

  /** [[globalValueRanks]] specialized to a BOUNDED value domain — the
    * common curation case where the ranked value is a score rounded to a
    * fixed precision (≤10^6 distinct values regardless of corpus size).
    *
    * The whole computation is ONE declarative plan, no driver
    * materialization and no checkpoint: per-value counts (one exchange,
    * map-side combine), a running-count window over the DOMAIN-sized
    * table in a single partition (explicitly bounded — this is the one
    * place a single-task sort is correct, because its input is the value
    * domain, never the corpus), and a broadcast join back. The general
    * range-partitioned form needs a sampling job + a materialized
    * partitioning + a P-row collect; none of that is earned when the
    * rank table provably fits in a broadcast.
    *
    * Caller contract: `valueCol`'s distinct-value count must be bounded
    * (rounded/discretized values). For unbounded domains (raw doubles,
    * ids) use [[globalValueRanks]].
    */
  def globalValueRanksBoundedDomain(
      df: DataFrame,
      valueCol: String,
      outRank: String = "rank",
      outPct: String = "percent_rank",
      roundPctTo: Int = 6): DataFrame = {
    require(df.columns.contains(valueCol), s"missing value column '$valueCol'")
    Seq(outRank, outPct, "__grv").foreach(c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with globalValueRanks output"))
    val v = col(valueCol)
    val counts = df.filter(v.isNotNull)
      .groupBy(v.as("__grv")).agg(count(lit(1)).as("__n"))
    // domain-sized single partition: the window input is the distinct-value
    // table, so Spark's "No Partition Defined" warning does not apply —
    // the bound is the caller's domain contract, not the corpus
    val w = Window.orderBy(col("__grv"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val rankTable = counts
      .withColumn(outRank, coalesce(sum(col("__n")).over(w), lit(0L)) + 1L)
      .withColumn("__tot", sum(col("__n")).over(wAll))
      .withColumn(outPct,
        when(col("__tot") <= 1L, lit(0.0))
          .otherwise(round((col(outRank) - 1L).cast("double") /
            (col("__tot") - 1L).cast("double"), roundPctTo)))
      .select(col("__grv"), col(outRank), col(outPct))
    df.join(broadcast(rankTable), v === col("__grv"), "left").drop("__grv")
  }

  /** Quantile normalization across groups over a BOUNDED value domain:
    * map each row's value to the GLOBAL distribution's value at the same
    * within-group quantile — the batch-effect correction that makes one
    * quality threshold fair across sources whose scorers are biased
    * differently (the rank-family sibling of the mixtures' source
    * balancing). `normalized(v, g) = Q_global(F_g(v))` with the
    * right-continuous inverse CDF `Q(p) = min{u : F(u) ≥ p}`, so every
    * group's maximum maps to the global maximum and ties stay ties.
    *
    * The naive form is `percent_rank` per group + `percentile_cont`
    * per row — a per-group corpus window plus a global sort. Here every
    * distribution lives on the DOMAIN-sized distinct-value frame
    * ([[globalValueRanksBoundedDomain]]'s contract: rounded scores,
    * ≤10^6 values): per-group CDFs via a (group)-partitioned window over
    * the counts, the global CDF via one domain-sized window, the inverse
    * lookup as a FORWARD AS-OF join ([[AsOfJoin.asOfForward]]) of group
    * fractions onto global fractions, and a broadcast join back to the
    * corpus. One corpus aggregate + one corpus broadcast join; nothing
    * corpus-sized is ever sorted.
    *
    * CDF fractions are integer-count ratios rounded to 9 dp before the
    * as-of comparison (exact same doubles in any engine — the oracle
    * replays the lookup). Rows with a NULL value keep a NULL
    * `outCol`.
    */
  def quantileNormalizeBoundedDomain(
      df: DataFrame, groupCol: String, valueCol: String,
      outCol: String = "normalized", roundFracTo: Int = 9): DataFrame = {
    Seq(groupCol, valueCol).foreach(c => require(df.columns.contains(c),
      s"missing column '$c'"))
    Seq(outCol, "__qg", "__qv").foreach(c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with quantileNormalize output"))
    val v = col(valueCol)
    val counts = df.filter(v.isNotNull)
      .groupBy(col(groupCol).as("__qg"), v.as("__qv"))
      .agg(count(lit(1)).as("__qn"))
    val wg = Window.partitionBy(col("__qg")).orderBy(col("__qv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wgAll = Window.partitionBy(col("__qg"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val groupCdf = counts.select(col("__qg"), col("__qv"),
      round(sum(col("__qn")).over(wg)
        / sum(col("__qn")).over(wgAll).cast("double"), roundFracTo)
        .as("__qf"))
    // global CDF re-aggregates the same domain-sized counts frame; its
    // single-partition window is bounded by the domain contract
    val wu = Window.orderBy(col("__uv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wuAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val globalCdf = counts
      .groupBy(col("__qv").as("__uv")).agg(sum(col("__qn")).as("__un"))
      .select(col("__uv"),
        round(sum(col("__un")).over(wu)
          / sum(col("__un")).over(wuAll).cast("double"), roundFracTo)
          .as("__uf"))
    // inverse CDF: the EARLIEST global value whose fraction reaches the
    // group fraction — the [[AsOfJoin]] union trick inlined (the generic
    // operator's schema-align/struct-carry machinery measurably costs
    // per-construction plan analysis; here the payload is one column and
    // both sides are already domain-sized). Descending fraction order
    // with global rows first at ties ⇒ the running last global value is
    // exactly min{u : F(u) ≥ p}; the group's 1.0 always matches the
    // global 1.0, so no group row is left unmatched.
    val unioned = groupCdf
      .select(col("__qg"), col("__qv"), col("__qf").as("__f"),
        lit(null).cast(globalCdf.schema("__uv").dataType).as("__uv"),
        lit(1).as("__isg"))
      .unionByName(globalCdf.select(
        lit(null).cast(groupCdf.schema("__qg").dataType).as("__qg"),
        lit(null).cast(groupCdf.schema("__qv").dataType).as("__qv"),
        col("__uf").as("__f"), col("__uv"), lit(0).as("__isg")))
    val wm = Window.orderBy(col("__f").desc, col("__isg"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lookup = unioned
      .withColumn(outCol, last(col("__uv"), ignoreNulls = true).over(wm))
      .filter(col("__isg") === 1)
      .select(col("__qg"), col("__qv"), col(outCol))
    df.join(broadcast(lookup),
        col(groupCol) === col("__qg") && v === col("__qv"), "left")
      .drop("__qg", "__qv")
  }
}
