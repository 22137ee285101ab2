package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

import graft.ext.Dedup

/** Streaming incremental-ingest dedup — the crawl-ingest composition of
  * [[graft.ext.Dedup.dedupIncrement]] with a `readStream` source: each
  * micro-batch is one ingest increment, deduped against the PERSISTED
  * signature index (history is touched only through its KB-per-million-docs
  * signature rows — its text is never re-shingled) plus within the batch,
  * and the survivors roll the index forward for the next batch.
  *
  * Semantics are the batch incremental-ingest family's, applied per
  * increment: FIRST ARRIVAL WINS. A later near-duplicate of an already
  * ingested document is dropped regardless of id order, exactly like
  * re-crawling a page that is already in the corpus — so the streaming
  * survivor set equals the sequential batch fold of `dedupIncrement`
  * over the same increments in arrival order (StreamingSpec pins this),
  * NOT a single all-at-once `dedupIncrement` over the concatenated
  * increments (whose within-shard tie-break is id order, not arrival
  * order).
  *
  * Restart safety mirrors [[DriftGate]]: both the survivor output and the
  * signature increment land under `batch_<batchId>` with mode=overwrite,
  * so a Structured Streaming retry REWRITES its own directories rather
  * than duplicating; [[signaturePaths]] reads only `_SUCCESS`-committed
  * directories and EXCLUDES the in-flight batch's own id (a retried
  * batch must not see its own half-rolled signatures and drop every doc
  * as a self-duplicate).
  *
  * Scale posture: per batch, one signature pass over the increment (the
  * small side by definition) and the banded shuffle-hash join against the
  * index — the [[graft.ext.Dedup.minHashCrossPairsFromSignatures]] plan.
  * The index accumulates one parquet directory per batch; compact it
  * offline with [[graft.ext.Dedup.writeSignatures]] over the survivor
  * corpus when the directory count grows (the same hygiene as any
  * streaming sink).
  */
object IngestDedupGate {

  /** Committed signature directories under `indexBase` (sorted for
    * determinism): any `_SUCCESS`-marked subdirectory counts, so a
    * pre-seeded history index (e.g. `indexBase/history` written by
    * [[graft.ext.Dedup.writeSignatures]]) joins the `batch_*` increments
    * uniformly. `excludeBatchId` drops that batch's own directory — the
    * retry-self-match guard. */
  def signaturePaths(
      spark: SparkSession,
      indexBase: String,
      excludeBatchId: Long = -1L): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(indexBase)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory
        && s.getPath.getName != s"batch_$excludeBatchId"
        && fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.toString).sorted
  }

  /** `foreachBatch` body: dedup the micro-batch against the rolling index
    * (plus within itself), write survivors to `outBase/batch_<batchId>`
    * and their signatures to `indexBase/batch_<batchId>`. */
  def survivorWriter(
      idCol: String,
      textCol: String,
      indexBase: String,
      outBase: String,
      threshold: Double = 0.7,
      shingleLen: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8): (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    val paths = signaturePaths(spark, indexBase, excludeBatchId = batchId)
    val index =
      if (paths.nonEmpty) spark.read.parquet(paths: _*)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField(idCol, batch.schema(idCol).dataType),
          StructField("sig", ArrayType(LongType)))))
    val survivors = Dedup.dedupIncrement(batch, index, idCol, idCol,
      textCol, "sig", threshold, shingleLen, numHashes, bands).persist()
    try {
      survivors.write.mode("overwrite").parquet(s"$outBase/batch_$batchId")
      Dedup.writeSignatures(survivors, idCol, textCol,
        s"$indexBase/batch_$batchId", shingleLen, numHashes)
    } finally {
      survivors.unpersist(blocking = false)
      ()
    }
  }

  /** `foreachBatch` body of the PERCEPTUAL IMAGE ingest gate — the
    * pair-level multimodal twin of [[survivorWriter]]: per micro-batch,
    * derive the 8-byte dHash map-side
    * ([[graft.ext.Multimodal.imageDHashCol]], native expression — pixels
    * never enter the pair machinery), drop images within Hamming ≤
    * `maxDistance` of the persisted index or of a lower-id batch mate
    * ([[graft.ext.Multimodal.imageDedupIncrement]] →
    * [[graft.ext.Dedup.hammingCrossPairs]] banding), and roll survivors'
    * (id, dhash) rows into the index. Same directory discipline as the
    * text gate: `batch_<id>` + mode=overwrite (retry rewrites, never
    * duplicates), `_SUCCESS`-committed reads, own-batch exclusion, and
    * id-equal pairs never drop (replay-after-compaction safety). Where
    * [[graft.streaming.StreamingResample.dedupImageStream]] keeps only
    * the EXACT-collision grain in watermark-bounded state, this gate
    * catches Hamming-1+ re-encodes against the full ingest history —
    * the index is persisted signatures, not stream state, so the
    * horizon is unbounded at 8 bytes/image. */
  def imageSurvivorWriter(
      idCol: String,
      payloadCol: String,
      indexBase: String,
      outBase: String,
      maxDistance: Int = 3,
      maxBucketSize: Int = 10000): (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    val paths = signaturePaths(spark, indexBase, excludeBatchId = batchId)
    val index =
      if (paths.nonEmpty) spark.read.parquet(paths: _*)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField(idCol, batch.schema(idCol).dataType),
          StructField("dhash", LongType))))
    val hashes = batch.select(org.apache.spark.sql.functions.col(idCol),
      graft.ext.Multimodal.imageDHashCol(
        org.apache.spark.sql.functions.col(payloadCol)).as("dhash"))
    val keptIds = graft.ext.Multimodal.imageDedupIncrement(
      hashes, index, idCol, "dhash", maxDistance, maxBucketSize).persist()
    try {
      batch.join(keptIds.select(org.apache.spark.sql.functions.col(idCol)),
          Seq(idCol), "left_semi")
        .write.mode("overwrite").parquet(s"$outBase/batch_$batchId")
      keptIds.write.mode("overwrite").parquet(s"$indexBase/batch_$batchId")
    } finally {
      keptIds.unpersist(blocking = false)
      ()
    }
  }

  /** Everything ingested and kept so far (the committed `batch_*` survivor
    * directories under `outBase`, merged). */
  def survivors(spark: SparkSession, outBase: String): DataFrame = {
    val paths = signaturePaths(spark, outBase) // same listing discipline
    require(paths.nonEmpty, s"no committed survivor batches under $outBase")
    spark.read.parquet(paths: _*)
  }

  /** Compact the rolling index: merge every committed directory under
    * `indexBase` into ONE `compact_<k>` directory and delete the merged
    * inputs — the directory-count hygiene a long-running ingest needs
    * (every [[drift]]-style listing and [[Dedup.dedupIncrement]] read
    * otherwise opens one parquet footer per batch ever ingested).
    *
    * Crash-safe ordering: the compacted directory is FULLY committed
    * (`_SUCCESS`) before any input is deleted. A crash between the two
    * steps leaves duplicate signature rows (compact + not-yet-deleted
    * inputs) — harmless to `dedupIncrement` (duplicate index rows only
    * produce duplicate pair candidates; survivors come from an
    * anti-join) — and the next compact() merges them away.
    *
    * Replay safety: compaction moves a batch's signatures where
    * [[signaturePaths]]' own-batch exclusion can no longer mask them,
    * but a replayed micro-batch still survives intact because
    * [[graft.ext.Dedup.dedupIncrement]] never drops an id-equal pair (a
    * document is not a duplicate of itself — StreamingSpec pins the
    * replay-after-compaction survivor set). Concurrency: a batch
    * directory committed AFTER the listing snapshot is neither merged
    * nor deleted, but an IN-FLIGHT micro-batch that already planned its
    * index read over the merged inputs will fail on the deleted files
    * and be retried by the stream (idempotently, per the above) — run
    * compaction between batches to avoid the spurious retry.
    *
    * @return the compacted directory path */
  def compactIndex(
      spark: SparkSession, indexBase: String, numFiles: Int = 1): String = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    val paths = signaturePaths(spark, indexBase)
    require(paths.nonEmpty, s"nothing to compact under $indexBase")
    // only compact_<digits> names feed the ordinal — a foreign committed
    // directory like compact_tmp is still MERGED as an input (it's in
    // `paths`) but must not abort compaction with a NumberFormatException
    val compactName = "compact_(\\d+)".r
    val ordinal = 1 + paths.map(new org.apache.hadoop.fs.Path(_).getName)
      .collect { case compactName(n) => n.toLong }
      .foldLeft(0L)(math.max)
    val target = s"$indexBase/compact_$ordinal"
    spark.read.parquet(paths: _*)
      .repartition(numFiles)
      .write.mode("overwrite").parquet(target)
    val fs = new org.apache.hadoop.fs.Path(indexBase)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    paths.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
    target
  }
}
