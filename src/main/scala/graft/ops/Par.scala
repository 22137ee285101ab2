package graft.ops

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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
  * when the input is a plain file scan (optionally behind Project/Filter
  * pushdown shapes) whose ACTUAL on-disk byte size fits inside one scan
  * partition's byte budget, redistribute it round-robin across
  * `defaultParallelism` before the kernel pass — trading one tiny
  * exchange (the input is ≤ one partition budget BY THE TRIGGERING
  * CONDITION) for full-width kernel parallelism. At corpus scale the
  * condition is false by orders of magnitude and the call is a strict
  * no-op — the operator plans it carries ("text never shuffles") hold
  * unchanged; specs pin that by pre-parallelizing inputs past the
  * threshold.
  *
  * The probe deliberately does NOT trust `optimizedPlan.stats` for
  * derived inputs: a post-filter/join frame's estimate can sit far below
  * its actual size, and a corpus-scale frame slipping under a
  * misestimated threshold would buy an unintended full exchange —
  * silently violating the no-shuffle plan contracts. So the trigger
  * requires (a) a Project/Filter chain over exactly one file relation or
  * an exact-sized LocalRelation — anything else (joins, aggregates,
  * RDD-backed checkpoints, unions) is identity — and (b) for file scans,
  * the relation's real `location.sizeInBytes` (sum of file lengths — an
  * upper bound on what any Project/Filter over it can produce), not an
  * optimizer guess. Driver-side plan walk only; no job.
  */
object Par {

  /** The actual (not estimated) byte size of `plan` when it is a plain
    * Project/Filter chain over a single file-scan or LocalRelation leaf;
    * None for any other shape (derived/joined/RDD-backed inputs).
    *
    * Walked over the ANALYZED plan, not the optimized one: the probe only
    * needs the leaf relation's real bytes, and asking for `optimizedPlan`
    * would (a) pay a throwaway optimizer run per call — the caller's
    * downstream query re-optimizes from scratch anyway — and (b) via
    * `ConvertToLocalRelation`, eagerly evaluate the Project/Filter chain
    * ON THE DRIVER for LocalRelation inputs (a UDF filter runs once per
    * row at probe time — observed as a phantom "second corpus scan" by
    * the single-pass counting specs). Analysis resolves names and types
    * but executes nothing. */
  private def plainScanBytes(plan: LogicalPlan): Option[BigInt] = plan match {
    case Project(_, child)       => plainScanBytes(child)
    case Filter(_, child)        => plainScanBytes(child)
    case SubqueryAlias(_, child) => plainScanBytes(child)
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      Some(BigInt(fs.location.sizeInBytes))
    case lr: LocalRelation => Some(lr.stats.sizeInBytes) // exact: in-memory rows
    case _                 => None
  }

  /** Round-robin-redistribute `df` to `defaultParallelism` partitions iff
    * it is a plain file scan (Project/Filter over one relation) whose
    * actual file bytes fit in ONE scan partition
    * (`spark.sql.files.maxPartitionBytes`); identity otherwise. */
  def fanOutSmallScan(df: DataFrame): DataFrame = {
    // streaming frames: identity, explicitly. Micro-batches are already
    // parallel, a stream's source leaf would never match the scan walk
    // below, and probing a stream's batch plan beyond analysis throws —
    // the guard keeps operators shared with the streaming twins usable
    // on either kind of frame without relying on those incidentals
    if (df.isStreaming) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (target <= 1) return df
    val onePartitionBudget = JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes"))
    plainScanBytes(df.queryExecution.analyzed) match {
      case Some(actual) if actual <= BigInt(onePartitionBudget) =>
        df.repartition(target)
      case _ => df
    }
  }
}
