package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Byte-pair-encoding subword tokenizer (Sennrich et al. 2016) — the
  * real token accounting a training-data pipeline budgets with (the
  * whitespace [[TextAnalysis.tokenCount]] is the cheap proxy; corpus
  * mixture budgets, packing and per-source caps ultimately count BPE
  * tokens).
  *
  * Scale split, matching how subword tokenizers are actually trained
  * and applied at corpus scale:
  *
  *  - FIT: the classic Sennrich algorithm operates on the WORD-COUNT
  *    table, not the raw corpus — so the corpus-sized work here is one
  *    distributed `explode → groupBy(word)` count (one shuffle of
  *    word-sized rows), capped to the `maxWords` most frequent words by
  *    the bounded-heap top-k. The merge loop then runs driver-side over
  *    that bounded table (≤ maxWords rows — MBs), which is exact w.r.t.
  *    the capped table and deterministic: ties on pair count break
  *    lexicographically.
  *  - ENCODE: one [[graft.functions.BpeEncode]] kernel eval per row,
  *    merge table broadcast as reference-object state — map-only, zero
  *    shuffle at any corpus size.
  *
  * Reference: the paqarin pipeline has no tokenizer at all (its token
  * counts are whitespace proxies); this family is part of the
  * LLM-pipeline extension surface.
  */
object Bpe {

  /** A fitted merge list; rank = position. */
  final case class BpeModel(merges: Seq[(String, String)])

  /** Fit `numMerges` BPE merges on the corpus' `maxWords` most frequent
    * whitespace words. The merge loop stops early when no adjacent pair
    * remains (every word fully merged to one symbol); unlike subword-nmt
    * it does NOT stop below frequency 2, so count-1 pairs are still
    * learned as merges — deterministic and golden-pinned. */
  def fit(
      df: DataFrame, textCol: String, numMerges: Int,
      maxWords: Int = 1 << 16): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    require(maxWords >= 1, s"maxWords must be positive, got $maxWords")
    val counts = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
    val top = graft.ops.TopK.perGroupRanked(
        counts.withColumn("__g", lit(1)), Seq("__g"),
        Seq(col("n").desc, col("w")), maxWords)
      .select(col("w"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    BpeModel(learnMerges(top, numMerges))
  }

  /** Driver-side Sennrich merge loop over a word-count table. Exposed
    * for specs; production callers use [[fit]]. */
  def learnMerges(
      wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    // symbol sequences: code points + the </w> end marker
    var vocab: Array[(Array[String], Long)] = wordCounts.map { case (w, c) =>
      val syms = new scala.collection.mutable.ArrayBuffer[String](w.length + 1)
      var ci = 0
      while (ci < w.length) {
        val cp = w.codePointAt(ci)
        syms += new String(Character.toChars(cp))
        ci += Character.charCount(cp)
      }
      syms += graft.functions.BpeCore.Eow
      (syms.toArray, c)
    }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var it = 0
    var exhausted = false
    while (it < numMerges && !exhausted) {
      // java.lang.Long values so the absent-key null check is real
      val stats = new java.util.HashMap[(String, String), java.lang.Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          val cur = stats.get(k)
          stats.put(k,
            java.lang.Long.valueOf((if (cur == null) 0L else cur.longValue()) + c))
          i += 1
        }
      }
      if (stats.isEmpty) exhausted = true
      else {
        // deterministic best: count desc, then pair asc
        var best: (String, String) = null
        var bestC = -1L
        val e = stats.entrySet().iterator()
        while (e.hasNext) {
          val kv = e.next()
          val k = kv.getKey
          val c = kv.getValue.longValue()
          if (c > bestC || (c == bestC && pairLt(k, best))) {
            best = k; bestC = c
          }
        }
        merges += best
        vocab = vocab.map { case (syms, c) => (mergePair(syms, best), c) }
      }
      it += 1
    }
    merges.toSeq
  }

  private def pairLt(a: (String, String), b: (String, String)): Boolean =
    b == null || a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def mergePair(
      syms: Array[String], pair: (String, String)): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == pair._1 && syms(i + 1) == pair._2) {
        out += pair._1 + pair._2; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** BPE-encode a text column: document-order subword tokens of every
    * non-empty word (each word's final subword carries `</w>`). */
  def encode(text: Column, model: BpeModel): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.BpeEncode(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        model.merges))

  /** Per-document BPE accounting: `n_words` (whitespace tokens),
    * `n_tok_bpe` (subword tokens under the model), `n_chars`
    * (non-whitespace characters) and `tok_hash` (xxhash64 of the
    * space-joined subword stream — pins exact token VALUES, not just
    * counts, in the golden gate). Map-only. */
  def encodeStats(
      df: DataFrame, textCol: String, model: BpeModel): DataFrame = {
    // loud reject over silent clobber (the advisor-r10 guard class)
    val reserved = Set("__bpe", "n_words", "n_tok_bpe", "n_chars", "tok_hash")
    df.columns.find(reserved).foreach(c =>
      throw new IllegalArgumentException(
        s"column name '$c' collides with the BPE accounting outputs " +
          s"(${reserved.toSeq.sorted.mkString(", ")}) — rename it first"))
    val toks = encode(col(textCol), model)
    df.withColumn("__bpe", toks)
      .withColumn("n_words", TextAnalysis.tokenCount(col(textCol)))
      // size(null) is -1 under legacy (non-ANSI) semantics — keep null
      .withColumn("n_tok_bpe",
        when(col("__bpe").isNotNull, size(col("__bpe"))))
      .withColumn("n_chars",
        length(regexp_replace(col(textCol), "\\s+", "")))
      // concat_ws maps a NULL array to "" — an unguarded hash would give
      // null documents the same tok_hash as genuinely empty ones
      .withColumn("tok_hash",
        when(col("__bpe").isNotNull, xxhash64(concat_ws(" ", col("__bpe")))))
      .drop("__bpe")
  }

  /** Persist a fitted model as a (rank, left, right) parquet table —
    * fit once on a bounded sample, encode every daily increment. */
  def writeModel(spark: SparkSession, m: BpeModel, path: String): Unit = {
    import spark.implicits._
    m.merges.zipWithIndex
      .map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "left", "right")
      .coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a [[writeModel]] table back into an encode-ready model. */
  def readModel(spark: SparkSession, path: String): BpeModel = {
    val rows = spark.read.parquet(path)
      .select("rank", "left", "right")
      .collect()
      .sortBy(_.getInt(0))
    BpeModel(rows.map(r => (r.getString(1), r.getString(2))).toSeq)
  }
}
