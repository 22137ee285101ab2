package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece `unigram`
  * model) — the probabilistic sibling of [[Bpe]]: a piece vocabulary
  * with log-probabilities, EM-fitted so that likely segmentations
  * dominate, encoded by Viterbi best segmentation.
  *
  * Scale split, identical to [[Bpe]] and to how SentencePiece itself is
  * deployed: the corpus-sized work is ONE distributed word count capped
  * to the `maxWords` most frequent words (bounded-heap top-k); seeding,
  * EM and pruning run driver-side over that bounded table — exact
  * w.r.t. the capped table and deterministic (fixed iteration orders,
  * ties broken by (count desc, piece asc) everywhere). Encoding is one
  * [[graft.functions.UnigramTokEncode]] kernel eval per row, the piece
  * table broadcast as reference-object state — map-only, zero shuffle
  * at any corpus size.
  *
  * Reference: the paqarin pipeline has no tokenizer; this family is
  * part of the LLM-pipeline extension surface beside [[Bpe]].
  */
object UnigramTok {

  /** A fitted unigram tokenizer: pieces with natural-log probabilities
    * (sorted (piece asc) for canonical equality), the max piece length,
    * and the per-character unknown penalty applied when Viterbi meets a
    * character no piece covers. */
  final case class UnigramTokModel(
      pieces: Seq[(String, Double)],
      maxPieceLen: Int,
      unkLogProb: Double)

  /** Fit a unigram-LM tokenizer.
    *
    *  1. word counts → top `maxWords` (the one corpus pass);
    *  2. seed: every substring of length 1..`maxPieceLen` of the kept
    *     words, scored count×length; the top `seedSize` by
    *     (score desc, piece asc) PLUS every single character (so every
    *     fit word stays segmentable at any cap);
    *  3. EM: `emIters` forward-backward rounds over the word table
    *     (log-space, fixed orders — deterministic); then, while the
    *     vocabulary exceeds `vocabSize`, drop to
    *     max(vocabSize, ⌈size·shrinkFactor⌉) pieces by
    *     (expected count desc, piece asc) — single characters exempt —
    *     and re-run EM. Zero-expectation multi-char pieces fall out at
    *     every M-step.
    *
    * The fitted log-probs are the final M-step's; encode-time unknowns
    * (characters never seen at fit) cost `unkLogProb` each. */
  def fit(
      df: DataFrame, textCol: String, vocabSize: Int = 512,
      maxWords: Int = 1 << 16, maxPieceLen: Int = 8,
      seedSize: Int = 4096, emIters: Int = 2,
      shrinkFactor: Double = 0.75,
      unkLogProb: Double = -20.0): UnigramTokModel = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be positive, got $maxPieceLen")
    require(seedSize >= 1, s"seedSize must be positive, got $seedSize")
    require(emIters >= 1, s"emIters must be positive, got $emIters")
    require(shrinkFactor > 0 && shrinkFactor < 1,
      s"shrinkFactor must be in (0, 1), got $shrinkFactor")
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
    learn(top, vocabSize, maxPieceLen, seedSize, emIters, shrinkFactor,
      unkLogProb)
  }

  /** Driver-side seed + EM + prune over a word-count table. Exposed for
    * specs; production callers use [[fit]]. */
  def learn(
      wordCounts: Seq[(String, Long)], vocabSize: Int, maxPieceLen: Int,
      seedSize: Int, emIters: Int, shrinkFactor: Double,
      unkLogProb: Double): UnigramTokModel = {
    if (wordCounts.isEmpty)
      return UnigramTokModel(Nil, maxPieceLen, unkLogProb)
    // ——— seed: substring scores, single chars force-included ———
    val score = scala.collection.mutable.HashMap.empty[String, Long]
    val singles = scala.collection.mutable.TreeSet.empty[String]
    wordCounts.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + maxPieceLen)) {
          val p = w.substring(i, j)
          score(p) = score.getOrElse(p, 0L) + c * (j - i)
          if (j - i == 1) singles += p
          j += 1
        }
        i += 1
      }
    }
    val seeded = score.toSeq.sortBy { case (p, s) => (-s, p) }
      .take(seedSize).map(_._1).toSet ++ singles
    // init probs ∝ seed score, fixed (piece asc) order throughout
    var pieces: Vector[String] = seeded.toVector.sorted
    var logp: Map[String, Double] = {
      val tot = pieces.map(score(_).toDouble).sum
      pieces.map(p => p -> math.log(score(p) / tot)).toMap
    }

    def logsumexp(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }

    /** One EM round: expected piece counts under the current model. */
    def eStep(): scala.collection.mutable.LinkedHashMap[String, Double] = {
      val exp = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      wordCounts.foreach { case (w, c) =>
        val n = w.length
        val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
        val beta = Array.fill(n + 1)(Double.NegativeInfinity)
        alpha(0) = 0.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxPieceLen)
          while (j < i) {
            logp.get(w.substring(j, i)).foreach { lp =>
              alpha(i) = logsumexp(alpha(i), alpha(j) + lp)
            }
            j += 1
          }
          i += 1
        }
        beta(n) = 0.0
        i = n - 1
        while (i >= 0) {
          var j = i + 1
          while (j <= math.min(n, i + maxPieceLen)) {
            logp.get(w.substring(i, j)).foreach { lp =>
              beta(i) = logsumexp(beta(i), lp + beta(j))
            }
            j += 1
          }
          i -= 1
        }
        val z = alpha(n)
        if (z != Double.NegativeInfinity) {
          i = 0
          while (i < n) {
            var j = i + 1
            while (j <= math.min(n, i + maxPieceLen)) {
              val p = w.substring(i, j)
              logp.get(p).foreach { lp =>
                val post = math.exp(alpha(i) + lp + beta(j) - z) * c
                if (post > 0) exp(p) = exp.getOrElse(p, 0.0) + post
              }
              j += 1
            }
            i += 1
          }
        }
      }
      exp
    }

    def mStep(exp: scala.collection.Map[String, Double]): Unit = {
      // zero-expectation multi-char pieces drop out; single chars keep a
      // floor so every fit word stays segmentable (the all-singles path)
      val kept = pieces.filter(p => exp.getOrElse(p, 0.0) > 0 || p.length == 1)
      val floor = 1e-12
      val tot = kept.map(p => math.max(exp.getOrElse(p, 0.0), floor)).sum
      pieces = kept
      logp = kept.map(p =>
        p -> math.log(math.max(exp.getOrElse(p, 0.0), floor) / tot)).toMap
    }

    var lastExp: scala.collection.Map[String, Double] = Map.empty
    var rounds = 0
    var doneShrinking = false
    while (!doneShrinking) {
      var it = 0
      while (it < emIters) { lastExp = eStep(); mStep(lastExp); it += 1 }
      if (pieces.length <= vocabSize ||
          pieces.forall(_.length == 1)) {
        // character coverage is the floor: a vocabSize below the single-
        // char count yields the all-singles model, not an unsegmentable one
        doneShrinking = true
      } else {
        val target = math.max(vocabSize,
          math.ceil(pieces.length * shrinkFactor).toInt)
        val singlesSet = pieces.filter(_.length == 1).toSet
        val multi = pieces.filterNot(singlesSet)
          .sortBy(p => (-lastExp.getOrElse(p, 0.0), p))
        val room = math.max(0, target - singlesSet.size)
        pieces = (singlesSet ++ multi.take(room)).toVector.sorted
        val tot = pieces.map(p =>
          math.max(lastExp.getOrElse(p, 0.0), 1e-12)).sum
        logp = pieces.map(p =>
          p -> math.log(math.max(lastExp.getOrElse(p, 0.0), 1e-12) / tot)).toMap
      }
      rounds += 1
      require(rounds < 1000, "unigram fit failed to converge (bug)")
    }
    UnigramTokModel(
      pieces.sorted.map(p => (p, logp(p))), maxPieceLen, unkLogProb)
  }

  /** Viterbi-encode a text column: document-order best-segmentation
    * pieces of every non-empty whitespace word. Ties break toward the
    * LONGER piece ending at each position (then by position order) —
    * fixed and engine-independent. Characters no piece covers emit
    * themselves at `unkLogProb` each. */
  def encode(text: Column, model: UnigramTokModel): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.functions.UnigramTokEncode(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        model.pieces, model.maxPieceLen, model.unkLogProb))

  /** Per-document unigram-tokenizer accounting: `n_words`, `n_tok_uni`,
    * `n_chars` and `tok_hash` (xxhash64 of the space-joined piece
    * stream — pins exact piece VALUES in the golden gate). Map-only,
    * the [[Bpe.encodeStats]] twin. */
  def encodeStats(
      df: DataFrame, textCol: String, model: UnigramTokModel): DataFrame = {
    val reserved = Set("__uni", "n_words", "n_tok_uni", "n_chars", "tok_hash")
    df.columns.find(reserved).foreach(c =>
      throw new IllegalArgumentException(
        s"column name '$c' collides with the unigram accounting outputs " +
          s"(${reserved.toSeq.sorted.mkString(", ")}) — rename it first"))
    val toks = encode(col(textCol), model)
    df.withColumn("__uni", toks)
      .withColumn("n_words", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("n_tok_uni",
        when(col("__uni").isNotNull, size(col("__uni"))))
      .withColumn("n_chars",
        length(regexp_replace(col(textCol), "\\s+", "")))
      .withColumn("tok_hash",
        when(col("__uni").isNotNull, xxhash64(concat_ws(" ", col("__uni")))))
      .drop("__uni")
  }

  /** Persist a fitted model as a (piece, log_prob, max_piece_len,
    * unk_log_prob) parquet table — fit once, encode every increment. */
  def writeModel(spark: SparkSession, m: UnigramTokModel, path: String): Unit = {
    import spark.implicits._
    require(m.pieces.nonEmpty,
      "cannot persist an empty unigram model (fit on a non-empty corpus)")
    m.pieces.map { case (p, lp) => (p, lp, m.maxPieceLen, m.unkLogProb) }
      .toDF("piece", "log_prob", "max_piece_len", "unk_log_prob")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[writeModel]] table back into an encode-ready model. */
  def readModel(spark: SparkSession, path: String): UnigramTokModel = {
    val rows = spark.read.parquet(path)
      .select("piece", "log_prob", "max_piece_len", "unk_log_prob")
      .collect()
    require(rows.nonEmpty, s"empty unigram model at $path")
    UnigramTokModel(
      rows.map(r => (r.getString(0), r.getDouble(1))).sortBy(_._1).toSeq,
      rows.head.getInt(2), rows.head.getDouble(3))
  }
}
