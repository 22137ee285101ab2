package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader with timestamp normalization (SURVEY §2.1 S1/S2).
  *
  * Spark's TimestampType is microsecond-precision and refuses parquet
  * TIMESTAMP(NANOS) columns; with `spark.sql.legacy.parquet.nanosAsLong=true`
  * they surface as LongType nanos. `load` converts any such column back to a
  * proper timestamp by integer-truncating to micros — byte-identical to how
  * DuckDB (the oracle) coerces ns → µs.
  */
object Tables {

  /** Columns that are nanosecond epochs when `nanosAsLong` kicks in. */
  private val NanoTsCols = Set("ts")

  /** Per-session memo of loaded tables: `spark.read.parquet` costs ~70 ms
    * PER CALL (file listing + footer schema read are not cached across
    * reads), which dominated every benchmarked query — a 5-table star join
    * paid ~350 ms of relation setup per repetition before any analysis.
    * The resolved plan is immutable, so reusing the DataFrame is exactly
    * what a long-lived application does with its tables. Bounded LRU keyed
    * by session UUID (see [[graft.internal.PlanMemo]] for why not a
    * session-keyed WeakHashMap); test data is immutable, but
    * [[clearCache]] exists for callers that rewrite files.
    */
  private val tableCache = new graft.internal.PlanMemo[String]()

  def clearCache(): Unit = tableCache.clear()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    tableCache.getOrBuild(spark, s"$dir/$name")(loadUncached(spark, dir, name))

  private def loadUncached(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (NanoTsCols.contains(f.name) && f.dataType == LongType)
        d.withColumn(f.name, expr(s"timestamp_micros(${f.name} div 1000)"))
      else d
    }
  }

  /** S1/S2 — CSV scan with header + inferred dtypes (`pd.read_csv`,
    * reference: examples/dopplenganger_example.py:44). Globs (`part-*.csv`,
    * the cloud_trainer.py:56-78 wildcard pattern) resolve natively; object
    * stores (`s3a://`, `gs://`) go through the same Hadoop FS path, so the
    * reference's manual blob walk (cloud_trainer.py:81-116) is just a URI.
    */
  def loadCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** S3 — CSV sink (`DataFrame.to_csv`, univariate_metrics.py:198-207). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** S1/S3 — JSON-lines scan/sink: the interchange format for
    * training-data pipelines (one document per line). Schema may be
    * supplied to skip the inference pass — at corpus scale an explicit
    * schema avoids a full extra read. Globs and object-store URIs resolve
    * exactly as in [[loadCsv]]. */
  def loadJson(
      spark: SparkSession,
      path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    schema.fold(spark.read.json(path))(sc => spark.read.schema(sc).json(path))

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Crawl-grade JSONL ingest: PERMISSIVE parse with the corrupt raw line
    * RETAINED (`_corrupt_record`), so malformed lines — a fact of life in
    * web-crawl dumps — are quarantined with evidence instead of silently
    * nulled (DROPMALFORMED) or fatal (FAILFAST kills a 100 TB job on one
    * bad byte). A missing FIELD is not corruption (it parses to null);
    * only unparseable lines carry the raw text. Schema is required: at
    * corpus scale inference is a full extra read, and the corrupt column
    * only works with an explicit schema anyway.
    *
    * Spark restriction (SPARK-21610): a query over the RAW files whose
    * pruned schema is ONLY `_corrupt_record` is disallowed — e.g. a bare
    * `count()` after filtering on it. Keep a data column in the
    * projection (what [[splitCorrupt]] consumers naturally do), or
    * persist the parsed frame first. */
  def loadJsonAudited(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema must not declare _corrupt_record — it is added here")
    spark.read
      .schema(schema.add("_corrupt_record",
        org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }

  /** Split a [[loadJsonAudited]] frame into (clean, quarantined). Both
    * sides keep every schema column (the quarantine side carries the raw
    * line alongside whatever half-parsed — Spark: both sides reference
    * data columns too, which keeps the plan clear of the
    * only-corrupt-column scan restriction Spark disallows). */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(col("_corrupt_record").isNull).drop("_corrupt_record"),
    df.filter(col("_corrupt_record").isNotNull))

  /** Hive-layout partitioned parquet (`path/col=value/…`): the 100 TB
    * corpus layout — partition columns (language, crawl date, source)
    * never store per-row, and a filter on one prunes whole directories
    * BEFORE any task launches (`PartitionFilters` in the scan, asserted
    * in SourcesSpec). `maxRecordsPerFile` bounds file size so a skewed
    * partition (one dominant language) still writes split-friendly
    * files. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 0L): Unit = {
    require(partitionCols.nonEmpty, "need at least one partition column")
    val w = df.write.mode("overwrite").partitionBy(partitionCols: _*)
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile)
    else w).parquet(path)
  }

  /** Bucketed parquet table for co-located joins: both sides bucketed and
    * sorted on the join key with the same bucket count join with NO
    * shuffle exchange (verified in SourcesSpec). The 100 TB pattern for
    * fact-to-fact joins that repeat across a pipeline: pay the
    * partitioning once at write time, never again. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)
}
