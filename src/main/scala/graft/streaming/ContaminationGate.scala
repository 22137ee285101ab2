package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Streaming benchmark-decontamination gate — the streaming twin of
  * [[graft.ext.Dedup.contaminationScore]].
  *
  * The batch operator explodes corpus grams and broadcast-joins the
  * benchmark's distinct gram-hash set, then re-aggregates per document.
  * On a stream that shape would need a streaming aggregation (state,
  * watermark, late-data policy) for what is really a PER-ROW computation:
  * every gram of a document lives in that document's own row. So the gate
  * folds the benchmark side into a constant — the distinct gram hashes,
  * collected once at build time (a BOUNDED driver collect: eval sets are
  * KBs–MBs of text by construction, the same boundary the batch
  * broadcast ships) — and scores each document with one map-only kernel
  * ([[graft.functions.CountInLongSet]], sorted-array binary probe). No
  * explode, no join, no aggregation: the gate is stateless and
  * watermark-free, so the SAME transform runs unchanged on batch frames
  * and on `readStream` sources in append mode, and a 100 TB batch run
  * reads the corpus exactly once with zero shuffles.
  *
  * Output matches `contaminationScore` value-exactly (StreamingSpec):
  * (idCol, n_grams, n_contaminated, contamination ∈ [0,1], round 6);
  * documents too short to have any n-gram emit no row.
  */
object ContaminationGate {

  /** Builds the gate against `benchmark` and applies it to `docs` (batch
    * or streaming). `docs` must carry `idCol` and `textCol`. */
  def apply(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    def gramHashes(c: Column): Column = GraftColumnBridge.column(
      graft.functions.XxHash64Array(
        GraftColumnBridge.expression(Dedup.wordNgrams(c, n))))
    // benchmark gram set → driver, once, at gate-build time (bounded by
    // construction — see scaladoc; the stream side never collects)
    val benchHashes: Array[Long] = benchmark
      .select(explode(gramHashes(col(textCol))).as("__g"))
      .distinct().collect().map(_.getLong(0))
    val contaminated: Column =
      if (benchHashes.isEmpty) lit(0L) // nothing can leak into an empty set
      else GraftColumnBridge.column(graft.functions.CountInLongSet(
        GraftColumnBridge.expression(col("__gs")), benchHashes)).cast("long")
    docs
      .select(col(idCol), gramHashes(col(textCol)).as("__gs"))
      .filter(size(col("__gs")) > 0)
      .select(col(idCol),
        size(col("__gs")).cast("long").as("n_grams"),
        contaminated.as("n_contaminated"))
      .withColumn("contamination",
        round(col("n_contaminated") / col("n_grams"), 6))
  }
}
