package graft.ops

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame

/** Scan-parallelism remediation for CPU-heavy map passes.
  *
  * A parquet file smaller than `spark.sql.files.maxPartitionBytes` — or
  * one whose row groups are fewer than the cores — scans as a HANDFUL of
  * tasks no matter how many cores the session has (splits below row-group
  * granularity don't parallelize), so a tokenize/gram/signature kernel
  * over it runs effectively single-threaded while every other core idles.
  * That is a small-data latency artifact, but it sits on the critical
  * path of every text operator whose first pass is the expensive one.
  *
  * [[Par.fanOutSmallScan]] fixes exactly that case and ONLY that case:
  * when the optimizer's size estimate says the whole input fits inside
  * one scan partition's byte budget, redistribute it round-robin across
  * `defaultParallelism` before the kernel pass — trading one tiny
  * exchange (the input is ≤ one partition budget BY THE TRIGGERING
  * CONDITION) for full-width kernel parallelism. At corpus scale the
  * condition is false by orders of magnitude and the call is a strict
  * no-op — the operator plans it carries ("text never shuffles") hold
  * unchanged; specs pin that by pre-parallelizing inputs past the
  * threshold. The probe reads `optimizedPlan.stats` (driver-side
  * analysis+optimization of the input subframe, no job, no physical
  * plan).
  */
object Par {

  /** Round-robin-redistribute `df` to `defaultParallelism` partitions iff
    * its optimizer size estimate fits in ONE scan partition
    * (`spark.sql.files.maxPartitionBytes`); identity otherwise. */
  def fanOutSmallScan(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (target <= 1) return df
    val onePartitionBudget = JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes"))
    val estimate = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (estimate <= BigInt(onePartitionBudget)) df.repartition(target)
    else df
  }
}
