package graft

import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.UnigramTok
import graft.ext.UnigramTok.UnigramTokModel

/** Unigram-LM (SentencePiece) tokenizer (UnigramTok.fit/encode +
  * UnigramTokEncode kernel): Viterbi optimality against brute-force
  * segmentation enumeration, EM sanity (normalization, non-decreasing
  * corpus likelihood), determinism, cap behavior, persistence round
  * trip, degenerate inputs, and the map-only encode plan. */
class UnigramTokSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // brute force over KNOWN pieces only: all segmentations of w. Callers
  // guarantee coverage (every single char is a piece), so the kernel's
  // unk fallback never fires and optimality is the whole contract.
  private def bruteBest(
      w: String, m: UnigramTokModel): (Double, Seq[String]) = {
    val table = m.pieces.toMap
    def rec(i: Int): Seq[(Double, List[String])] =
      if (i == w.length) Seq((0.0, Nil))
      else for {
        j <- ((i + 1) to math.min(w.length, i + m.maxPieceLen)).toSeq
        lp <- table.get(w.substring(i, j)).toSeq
        (s, rest) <- rec(j)
      } yield (lp + s, w.substring(i, j) :: rest)
    rec(0).maxBy(_._1)
  }

  private def fitOn(texts: Seq[String], vocabSize: Int = 40,
      maxPieceLen: Int = 4): UnigramTokModel =
    UnigramTok.fit(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text"),
      "text", vocabSize = vocabSize, maxPieceLen = maxPieceLen,
      seedSize = 200, emIters = 2)

  test("piece log-probs normalize to 1") {
    val m = fitOn(Seq("abab abab cd", "abab cd cd", "ab cd"))
    assert(m.pieces.nonEmpty)
    val tot = m.pieces.map { case (_, lp) => math.exp(lp) }.sum
    assert(tot === 1.0 +- 1e-9)
  }

  test("Viterbi encode == brute-force best segmentation (fuzz, 30 " +
      "hand-built models with guaranteed coverage)") {
    val r = new scala.util.Random(0x51eb)
    for (caseId <- 1 to 30) {
      val alpha = "abc"
      val maxLen = 1 + r.nextInt(4)
      // every single char is a piece (coverage ⇒ unk never fires); a
      // random sample of longer substrings joins with random log-probs
      val longer = (0 until 12).map(_ =>
        (0 until 2 + r.nextInt(math.max(1, maxLen - 1)))
          .map(_ => alpha(r.nextInt(3))).mkString)
        .filter(_.length <= maxLen).distinct
      val pieces = (alpha.map(_.toString) ++ longer).distinct
        .map(p => (p, -1.0 - 7.0 * r.nextDouble())).sorted
      val m = UnigramTokModel(pieces, maxLen, unkLogProb = -20.0)
      val probe = (0 until 1 + r.nextInt(8)).map(_ => alpha(r.nextInt(3)))
        .mkString
      val gotPieces = Seq((1L, probe)).toDF("id", "text")
        .select(UnigramTok.encode(col("text"), m)).as[Seq[String]].head()
      val (bestScore, _) = bruteBest(probe, m)
      val table = m.pieces.toMap
      val gotScore = gotPieces.map(table(_)).sum
      assert(gotPieces.mkString("") == probe,
        s"case $caseId: pieces don't reassemble '$probe': $gotPieces")
      assert(gotScore === bestScore +- 1e-9,
        s"case $caseId: Viterbi score $gotScore != brute best $bestScore " +
          s"for '$probe' (pieces $gotPieces)")
    }
  }

  test("EM improves or maintains corpus likelihood across emIters") {
    val texts = Seq("international internet interface",
      "internal internet nation", "nation station international")
    def corpusLL(m: UnigramTokModel): Double = {
      // Viterbi LL proxy: best-segmentation score of each word
      val words = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      words.map(w => bruteBest(w, m)._1).sum
    }
    val m1 = UnigramTok.fit(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
      "text", vocabSize = 60, maxPieceLen = 5, seedSize = 300, emIters = 1)
    val m3 = UnigramTok.fit(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text"),
      "text", vocabSize = 60, maxPieceLen = 5, seedSize = 300, emIters = 3)
    assert(corpusLL(m3) >= corpusLL(m1) - 1e-6)
  }

  test("vocabSize cap bites; all single characters survive it") {
    val texts = Seq("abcdefgh abcd efgh abcdefgh", "abcd abcd efgh")
    val big = fitOn(texts, vocabSize = 200, maxPieceLen = 4)
    val small = fitOn(texts, vocabSize = 8, maxPieceLen = 4)
    assert(small.pieces.size <= math.max(8,
      texts.flatMap(_.filterNot(_ == ' ')).distinct.size))
    assert(big.pieces.size > small.pieces.size)
    val singles = texts.flatMap(_.split("\\s+")).flatMap(_.toSeq)
      .distinct.map(_.toString).toSet
    assert(singles.subsetOf(small.pieces.map(_._1).toSet),
      "single characters must survive any cap")
  }

  test("fit is deterministic across invocations") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def m() = UnigramTok.fit(docs, "text", vocabSize = 80,
      maxPieceLen = 4, seedSize = 300, emIters = 2)
    assert(m() == m())
  }

  test("writeModel/readModel round-trips; encode identical") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(100)
    val m = UnigramTok.fit(docs, "text", vocabSize = 100,
      maxPieceLen = 4, seedSize = 400, emIters = 2)
    val tmp = java.nio.file.Files.createTempDirectory("unitok").toString
    UnigramTok.writeModel(spark, m, tmp)
    val back = UnigramTok.readModel(spark, tmp)
    assert(back == m)
    val a = UnigramTok.encodeStats(docs.select("doc_id", "text"), "text", m)
      .select("doc_id", "tok_hash").as[(Long, Long)].collect().sortBy(_._1)
    val b = UnigramTok.encodeStats(docs.select("doc_id", "text"), "text", back)
      .select("doc_id", "tok_hash").as[(Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("degenerate inputs: null / empty / whitespace-only / unk-only") {
    val m = fitOn(Seq("aa bb aa"))
    val got = UnigramTok.encodeStats(
        Seq((1L, Some("")), (2L, Some(" \t ")), (3L, None: Option[String]),
          (4L, Some("zzz")))
          .toDF("id", "text"), "text", m)
      .select("id", "n_tok_uni", "tok_hash")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2)))
    assert(got(0)._2 == 0)
    assert(got(1)._2 == 0)
    assert(got(2)._2 == null && got(2)._3 == null)
    assert(got(3)._2 == 3) // three unk chars, still encodes
  }

  test("plan: encode is map-only — no exchange touches the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val m = fitOn(Seq("aa bb aa"))
    val out = UnigramTok.encodeStats(
      docs.select("doc_id", "text"), "text", m)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"unigram encode plans an exchange:\n$plan")
  }

  test("encodeStats refuses reserved column names (loud, not clobbered)") {
    val m = fitOn(Seq("aa bb"))
    val e = intercept[IllegalArgumentException] {
      UnigramTok.encodeStats(
        Seq((1L, "x", 2)).toDF("id", "text", "n_chars"), "text", m)
    }
    assert(e.getMessage.contains("n_chars"))
  }
}
