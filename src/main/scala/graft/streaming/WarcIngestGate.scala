package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Warc

/** Streaming WARC crawl ingest — the canonical crawl-pipeline shape,
  * composed end to end from proven pieces (round-17 ask 6):
  * `readStream` over arriving archives → records parsed IN-TASK
  * ([[graft.sources.Warc.parseArchive]], one task per archive, no
  * shuffle) → exact n-gram decontamination ([[ContaminationGate]]) →
  * fuzzy MinHash decontamination ([[FuzzyContaminationGate]]) → the
  * incremental near-dup survivor writer ([[IngestDedupGate]], first
  * arrival wins against the persisted signature index).
  *
  * Each micro-batch is one ingest increment, so the streaming survivor
  * set equals the sequential batch fold of the same gates +
  * `dedupIncrement` over the archives in arrival order (StreamingSpec
  * pins stream ≡ batch over a two-archive fixture). Restart safety is
  * [[IngestDedupGate.survivorWriter]]'s: per-batch directories with
  * mode=overwrite, `_SUCCESS`-committed index reads, own-batch
  * exclusion.
  *
  * Scale posture: the benchmark side of both gates is KB–MB and
  * broadcast/driver-bounded (the batch operators' documented contract);
  * the archive side is map-only parse + signature pass per increment.
  * At a real crawl's volume the gates re-derive the benchmark gram set
  * per micro-batch — pre-compute it once and lift it into a shared
  * gate instance if batches are seconds apart (same trade the batch
  * pipeline documents).
  */
object WarcIngestGate {

  /** Parse one micro-batch of `binaryFile` rows into HTTP response
    * documents: `(record_id, archive_path, target_uri, warc_date,
    * http_status, text)`. Non-response records (warcinfo, request,
    * metadata) are skipped; the entity body is split from the HTTP
    * preamble by [[Warc.httpBody]] (chunked transfer encodings fail
    * loudly) and decoded as UTF-8 — the text-extraction start point a
    * browser would see. Map-only: safe on a streaming frame. */
  def parseResponses(batch: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    batch.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        Warc.parseArchive(bytes).iterator
          .filter(_.warc_type == "response")
          .map { r =>
            val (status, body) = Warc.httpBody(r.payload)
            (r.record_id, path, r.target_uri, r.warc_date, status,
              new String(body, java.nio.charset.StandardCharsets.UTF_8))
          }.toSeq
      }
      .toDF("record_id", "archive_path", "target_uri", "warc_date",
        "http_status", "text")
  }

  /** `foreachBatch` body: parse the increment's archives, gate exact
    * contamination (`contamination > maxContamination` drops), gate
    * fuzzy benchmark similarity (MinHash-estimated ≥ `fuzzyThreshold`
    * drops), then run the rolling-index near-dup survivor writer.
    * Survivors land under `outBase/batch_<id>`, their signatures roll
    * the index at `indexBase` forward. */
  def survivorWriter(
      benchmark: DataFrame,
      benchTextCol: String,
      indexBase: String,
      outBase: String,
      maxContamination: Double = 0.9,
      fuzzyThreshold: Double = 0.5,
      dedupThreshold: Double = 0.7,
      shingleLen: Int = 3,
      numHashes: Int = 32,
      bands: Int = 8): (DataFrame, Long) => Unit = (batch, batchId) => {
    val gated = gate(parseResponses(batch), benchmark, benchTextCol,
      maxContamination, fuzzyThreshold, shingleLen, numHashes, bands)
    IngestDedupGate.survivorWriter("record_id", "text", indexBase, outBase,
      dedupThreshold, shingleLen, numHashes, bands)(gated, batchId)
  }

  /** The decontamination half, shared by the stream and its batch-fold
    * twin: exact n-gram gate then fuzzy MinHash gate, both stateless.
    * Documents with no n-gram (empty/short bodies) score 0 and pass —
    * nothing can leak from them. */
  def gate(
      docs: DataFrame,
      benchmark: DataFrame,
      benchTextCol: String,
      maxContamination: Double,
      fuzzyThreshold: Double,
      shingleLen: Int,
      numHashes: Int,
      bands: Int): DataFrame = {
    val exact = ContaminationGate.withScore(docs,
        benchmark.select(col(benchTextCol).as("text")), "text",
        n = shingleLen)
      .filter(col("contamination") <= maxContamination)
      .drop("n_grams", "n_contaminated", "contamination")
    FuzzyContaminationGate(exact, benchmark, "text", benchTextCol,
      fuzzyThreshold, shingleLen, numHashes, bands)
  }

  /** `readStream` over arriving archives (plain `.warc` or per-record-
    * gzipped `.warc.gz`, the CommonCrawl layout): the `binaryFile`
    * source emits one row per NEW file, `maxFilesPerTrigger` bounds the
    * increment size (1 = one archive per micro-batch — the arrival-order
    * semantics the batch fold replays). */
  def stream(
      spark: SparkSession,
      pathGlob: String,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.format("binaryFile")
      // streaming sources refuse schema inference; binaryFile's schema
      // is the datasource's FIXED one, restated here verbatim
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(pathGlob)
}
