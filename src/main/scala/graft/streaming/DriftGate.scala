package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.ext.SnapshotAudit

/** Streaming distribution-drift monitor — the streaming twin of
  * [[graft.ext.SnapshotAudit.distributionDrift]], built on the SAME
  * mergeable histogram state instead of a streaming aggregation.
  *
  * A native streaming agg (update mode) would hold the running histogram
  * in operator state and still need a post-aggregation join + window for
  * the JS reduction — shapes streaming Spark restricts. But histogram
  * counts are mergeable sufficient statistics, so the monitor needs no
  * streaming state at all: each micro-batch writes its OWN (group,
  * bucket, n) increment via `foreachBatch` (a plain batch aggregate of
  * that batch's rows), and the current drift against a persisted
  * reference is [[SnapshotAudit.distributionDriftFromStates]] over the
  * accumulated increments — EXACT vs re-running the batch operator on
  * everything seen so far (count addition is order- and
  * partitioning-free; StreamingSpec pins the equality). Restart-safe the
  * same way the batch increments are: an increment directory either
  * exists completely or is rewritten by its retried batch id.
  */
object DriftGate {

  /** `foreachBatch` body: the micro-batch's histogram increment →
    * `base/batch_<batchId>` (overwrite — a Structured Streaming retry of
    * the same batch id rewrites, not duplicates). */
  def histogramWriter(
      groupCol: String, bucket: Column, base: String)
      : (DataFrame, Long) => Unit =
    (batch, batchId) =>
      SnapshotAudit.writeHistogramState(
        batch, groupCol, bucket, s"$base/batch_$batchId")

  /** The COMMITTED increment directories written so far (sorted for
    * determinism). Only directories carrying the Hadoop committer's
    * `_SUCCESS` marker count: a mid-write crash leaves a partial
    * directory that the retried batch overwrites — until then it must
    * not skew the merged histogram. Deployments that disable markers
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs=false`, common
    * on object stores) must leave them ON for the increment path — the
    * writes come from [[histogramWriter]]'s own Spark jobs, so the
    * setting is under this pipeline's control. */
  def incrementPaths(spark: SparkSession, base: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(base)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val batchDirs = fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_"))
      val committed = batchDirs
        .filter(s =>
          fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
        .map(_.getPath.toString).sorted
      // MULTIPLE batch dirs but NONE carries the marker: a marker-disabled
      // deployment (marksuccessfuljobs=false), not a crash — fail loudly,
      // since silently merging zero increments would report an empty/
      // skewed drift with no hint why. Exactly ONE unmarked dir is the
      // benign first-batch-in-flight race (the committer hasn't placed
      // _SUCCESS yet) and stays "no increments yet".
      require(batchDirs.size < 2 || committed.nonEmpty,
        s"${batchDirs.size} batch_* directories under $base but none " +
          "carries a _SUCCESS marker — is " +
          "mapreduce.fileoutputcommitter.marksuccessfuljobs=false? The " +
          "increment path requires committer markers (see scaladoc)")
      committed
    }
  }

  /** Current drift of everything streamed so far vs the reference
    * lineage (e.g. the day-1 [[SnapshotAudit.writeHistogramState]]). */
  def drift(
      spark: SparkSession, referencePaths: Seq[String], base: String,
      groupCol: String, roundTo: Int = 6): DataFrame = {
    val inc = incrementPaths(spark, base)
    require(inc.nonEmpty, s"no histogram increments under $base yet")
    SnapshotAudit.distributionDriftFromStates(
      spark, referencePaths, inc, groupCol, roundTo)
  }
}
