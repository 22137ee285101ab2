package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection — Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling" (public method; no
  * reference analogue — north-star breadth): given a small TARGET sample
  * (the domain you want more of — an eval-adjacent corpus, a curated
  * seed set) and the RAW crawl, estimate per-document importance weights
  * λ(x) = log p̂_target(x) − log p̂_raw(x) under hashed bag-of-n-gram
  * unigram models, then sample without replacement ∝ exp λ via the
  * Gumbel-top-k trick. The selected subset is distributed like the
  * target while drawn from the raw corpus — the classic
  * "more-Wikipedia-like CommonCrawl" selection step.
  *
  * Scale shape: model FITTING is one gram pass per corpus — the
  * [[graft.functions.HashedGramBuckets]] kernel emits the multiset of
  * bucket ids map-side and the partial-aggregated `groupBy(bucket)`
  * exchange carries at most `buckets` rows per task (the model is
  * `buckets` doubles — KBs — collected driver-side like the IVF
  * centroids). SCORING is ONE [[graft.functions.HashedGramLogSum]]
  * kernel eval per row with the log-ratio table as a broadcast reference
  * object — no explode, join, or shuffle at any corpus size. The
  * RESAMPLE tail is the bounded-heap [[graft.ops.TopK]] operator
  * (O(groups·k) state, no Window, no global sort).
  *
  * Portability: buckets come from the first 8 md5 hex digits of each
  * gram (replayable in any engine with md5 — the oracle recomputes the
  * models, weights and Gumbel keys in SQL); λ rounds to 4 dp before the
  * key and the key to 6 dp before ranking (id tie-break), so ln/sum
  * ulps between engines cannot flip the selected set.
  */
object Dsir {

  /** An add-α unigram model over hashed n-gram buckets: `logProbs(b)` =
    * ln((count(b) + α) / (total + α·buckets)). */
  final case class HashedModel(
      logProbs: Array[Double],
      buckets: Int,
      maxN: Int,
      totalGrams: Long,
      alpha: Double)

  /** Output/internal names the weighting/resample machinery appends — a
    * caller column sharing one would be silently clobbered (same guard
    * class as Retrieval.ReservedCols, advisor r10). */
  private val ReservedCols = Set("__ds", "__g", "log_weight", "n_feat",
    "sample_key", "rank")

  private def requireNotReserved(df: DataFrame, alsoCols: String*): Unit =
    (df.columns.toSeq ++ alsoCols).filter(ReservedCols)
      .headOption.foreach(c => throw new IllegalArgumentException(
        s"column name '$c' collides with the DSIR outputs/internals " +
          s"(${ReservedCols.toSeq.sorted.mkString(", ")}) — rename it first"))

  private def bucketsCol(text: Column, maxN: Int, buckets: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.HashedGramBuckets(
      GraftColumnBridge.expression(text), maxN, buckets))
  }

  /** Fit the hashed-n-gram model on a corpus: ONE text scan (the kernel
    * emits bucket ids map-side), one partial-aggregated bucket exchange
    * (≤ `buckets` rows per task), and a `buckets`-row collect. */
  def fitHashedModel(
      df: DataFrame, textCol: String, buckets: Int = 8192,
      maxN: Int = 2, alpha: Double = 1.0): HashedModel = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    // fanOutSmallScan: the md5 gram hashing is the fit's whole cost; a
    // sub-split input pins it to one task (no-op at corpus scale)
    val counts = graft.ops.Par.fanOutSmallScan(df)
      .select(explode(bucketsCol(col(textCol), maxN, buckets)).as("__b"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val total = counts.valuesIterator.sum
    val denom = total + alpha * buckets
    val lp = Array.tabulate(buckets)(b =>
      math.log((counts.getOrElse(b, 0L) + alpha) / denom))
    HashedModel(lp, buckets, maxN, total, alpha)
  }

  /** Append `log_weight` (λ(x) = Σ_grams (log p_target − log p_raw),
    * rounded to 4 dp — the [[TextAnalysis.scoreUnigram]] ulp-absorption
    * precedent) and `n_feat` (gram occurrences). Map-only: one kernel
    * eval per row, the log-ratio table rides the task binary. */
  def importanceWeights(
      df: DataFrame, textCol: String,
      target: HashedModel, raw: HashedModel): DataFrame = {
    require(target.buckets == raw.buckets && target.maxN == raw.maxN,
      s"model shapes differ: target (${target.buckets}, n≤${target.maxN})" +
        s" vs raw (${raw.buckets}, n≤${raw.maxN})")
    requireNotReserved(df)
    import org.apache.spark.sql.GraftColumnBridge
    val ratio = Array.tabulate(target.buckets)(b =>
      target.logProbs(b) - raw.logProbs(b))
    val st = GraftColumnBridge.column(graft.functions.HashedGramLogSum(
      GraftColumnBridge.expression(col(textCol)),
      target.maxN, target.buckets,
      scala.collection.immutable.ArraySeq.unsafeWrapArray(ratio)))
    df.withColumn("__ds", st)
      .withColumn("log_weight", round(col("__ds.sum"), 4))
      .withColumn("n_feat", col("__ds.n_feat"))
      .drop("__ds")
  }

  /** Gumbel-top-k importance resampling: keep the `k` rows (per group;
    * one global group by default) with the largest
    * `key = λ + Gumbel(u)`, `Gumbel(u) = −ln(−ln u)` — over many draws
    * each document's inclusion probability is proportional to exp λ,
    * i.e. to its importance weight, WITHOUT materializing exp λ (which
    * over/underflows for long documents). `u` comes from the first 52
    * bits of `md5(id:seed)` shifted off 0 by half an ulp — deterministic,
    * reseedable per epoch, and replayable in SQL. Documents with zero
    * grams carry no evidence and are excluded. Appends `log_weight`,
    * `n_feat`, `sample_key`, `rank`. */
  def resample(
      df: DataFrame, idCol: String, textCol: String,
      target: HashedModel, raw: HashedModel, k: Int,
      groupCols: Seq[String] = Nil, seed: String = "42"): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val weighted = importanceWeights(df, textCol, target, raw)
      .filter(col("n_feat") > 0)
    val u = (graft.ops.Sampling.priorityPrefix(
        graft.ops.Sampling.hashPriority(col(idCol), seed), 13)
      .cast("double") + lit(0.5)) / lit(4503599627370496.0) // 2^52
    val keyed = weighted.withColumn("sample_key",
      round(col("log_weight") - log(-log(u)), 6))
    val order = Seq(col("sample_key").desc, col(idCol))
    if (groupCols.isEmpty)
      graft.ops.TopK.perGroupRanked(
          keyed.withColumn("__g", lit(1)), Seq("__g"), order, k)
        .drop("__g")
    else graft.ops.TopK.perGroupRanked(keyed, groupCols, order, k)
  }

  /** Persist a fitted model as parquet `(bucket, log_prob)` with the fit
    * parameters denormalized on — the `Retrieval.writeIndex` /
    * `Dedup.writeSignatures` pattern at model grain: fit once on the
    * reference corpora, then daily increments score against the stored
    * table without re-reading a byte of the fit corpus. `buckets` rows —
    * KBs — in one file. */
  def writeModel(
      spark: org.apache.spark.sql.SparkSession,
      m: HashedModel, path: String): Unit = {
    import spark.implicits._
    m.logProbs.toSeq.zipWithIndex
      .map { case (lp, b) =>
        (b, lp, m.buckets, m.maxN, m.totalGrams, m.alpha) }
      .toDF("bucket", "log_prob", "buckets", "max_n", "total_grams",
        "alpha")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[writeModel]] table back into a scoring-ready model. */
  def readModel(
      spark: org.apache.spark.sql.SparkSession, path: String): HashedModel = {
    val rows = spark.read.parquet(path)
      .select("bucket", "log_prob", "buckets", "max_n", "total_grams",
        "alpha")
      .collect()
    require(rows.nonEmpty, s"empty DSIR model at $path")
    val head = rows.head
    val (buckets, maxN) = (head.getInt(2), head.getInt(3))
    require(rows.length == buckets,
      s"DSIR model at $path holds ${rows.length} rows for $buckets buckets")
    val lp = new Array[Double](buckets)
    rows.foreach(r => lp(r.getInt(0)) = r.getDouble(1))
    HashedModel(lp, buckets, maxN, head.getLong(4), head.getDouble(5))
  }
}
