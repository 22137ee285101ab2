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

  /** Appends `n_grams` / `n_contaminated` / `contamination` to `docs`
    * (ALL original columns kept) — the composable form for pipelines that
    * gate in place, e.g.
    * `withScore(corpus, bench, "text").filter(col("contamination") < 0.5)`.
    * Documents with no n-gram score `contamination = 0.0` here (nothing
    * can leak from them, and a gate must keep them); [[apply]] instead
    * omits them entirely, matching the batch operator's contract. */
  /** Hard cap on the benchmark's distinct gram-hash count. The gate's
    * driver collect is only safe because eval sets are small; this turns
    * that scaladoc assumption into an enforced bound. 32M longs = 256 MB
    * on the driver — already generous for any real benchmark suite. */
  val MaxBenchmarkGrams: Long = 32L * 1024 * 1024

  def withScore(
      docs: DataFrame,
      benchmark: DataFrame,
      textCol: String,
      n: Int = 3,
      maxBenchmarkGrams: Long = MaxBenchmarkGrams): DataFrame = {
    // the guarded collect below limits to cap+1 rows through an Int-typed
    // limit(); a cap at/above Int.MaxValue would overflow (negative limit)
    // or silently clamp so the overflow diagnostic could never fire
    require(maxBenchmarkGrams > 0 && maxBenchmarkGrams < Int.MaxValue,
      s"maxBenchmarkGrams must be in (0, Int.MaxValue): $maxBenchmarkGrams")
    import org.apache.spark.sql.GraftColumnBridge
    def gramHashes(c: Column): Column = GraftColumnBridge.column(
      graft.functions.XxHash64Array(
        GraftColumnBridge.expression(Dedup.wordNgrams(c, n))))
    // benchmark gram set → driver, once, at gate-build time. The collect
    // is guarded: limit(cap+1) bounds what can ever reach the driver, and
    // overflow fails with a diagnostic instead of an OOM — an argument
    // swap (corpus passed as `benchmark`) dies loudly here.
    val capped = benchmark
      .select(explode(gramHashes(col(textCol))).as("__g"))
      .distinct().limit((maxBenchmarkGrams + 1).toInt)
      .collect()
    if (capped.length > maxBenchmarkGrams)
      throw new IllegalArgumentException(
        s"ContaminationGate: benchmark side has > $maxBenchmarkGrams " +
          "distinct grams — too large for the streaming gate's driver-side " +
          "set. Did you swap the corpus and benchmark arguments? For a " +
          "genuinely huge benchmark use the batch contaminationScore, " +
          "which broadcasts instead of collecting.")
    val benchHashes: Array[Long] = capped.map(_.getLong(0))
    def contaminated(gs: Column): Column =
      if (benchHashes.isEmpty) lit(0L) // nothing can leak into an empty set
      else GraftColumnBridge.column(graft.functions.CountInLongSet(
        GraftColumnBridge.expression(gs), benchHashes)).cast("long")
    docs
      .withColumn("__gs", gramHashes(col(textCol)))
      .withColumn("n_grams", size(col("__gs")).cast("long"))
      .withColumn("n_contaminated", contaminated(col("__gs")))
      .withColumn("contamination",
        when(col("n_grams") > 0,
          round(col("n_contaminated") / col("n_grams"), 6))
          .otherwise(lit(0.0)))
      .drop("__gs")
  }

  /** Builds the gate against `benchmark` and applies it to `docs` (batch
    * or streaming), returning the narrow score frame
    * (idCol, n_grams, n_contaminated, contamination) — value-identical
    * to [[graft.ext.Dedup.contaminationScore]]: documents too short to
    * have any n-gram emit no row. */
  def apply(
      docs: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame =
    withScore(docs.select(col(idCol), col(textCol)), benchmark, textCol, n)
      .filter(col("n_grams") > 0)
      .select(col(idCol), col("n_grams"), col("n_contaminated"),
        col("contamination"))
}
