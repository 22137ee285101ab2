package graft

import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextAnalysis

/** Bigram stupid-backoff LM (fitBigramModel / scoreBigram /
  * BigramLogProbStats): hand-computed fixture, an independent
  * from-scratch differential model over randomized corpora (including
  * held-out scoring, the backoff-heavy case), the maxBigrams cap,
  * OOV-sentinel mapping, edge docs, and the map-only scoring plan. */
class BigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— independent reference model (from scratch — shares no code with
  // the operator: scala-regex split, immutable maps, direct fold) ———

  private def refTokens(s: String): Vector[String] =
    "\\s+".r.split(s).toVector.filter(_.nonEmpty)

  private case class RefModel(
      uniLp: Map[String, Double], oovLp: Double,
      bigramLp: Map[(String, String), Double], backoffLp: Double)

  private def refFit(
      corpus: Seq[String], vocabSize: Int, alpha: Double,
      backoff: Double, maxBigrams: Int): RefModel = {
    val toks = corpus.flatMap(refTokens)
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = counts.toVector
      .sortBy { case (t, c) => (-c, t) }.take(vocabSize).map(_._1)
    val vset = vocab.toSet
    val total = toks.size.toLong
    val denom = total + alpha * (vocab.size + 1)
    val uniLp = vocab.map(t => t -> math.log((counts(t) + alpha) / denom)).toMap
    val oovLp = math.log(alpha / denom)
    def m(t: String) = if (vset(t)) t else ""
    val bgOcc = corpus.flatMap { doc =>
      val ts = refTokens(doc).map(m)
      if (ts.size < 2) Nil else ts.sliding(2).map(p => (p(0), p(1))).toList
    }
    val bgCounts = bgOcc.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctx = bgOcc.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val kept = bgCounts.toVector
      .sortBy { case ((a, b), c) => (-c, a + " " + b) }.take(maxBigrams)
    val bigramLp = kept.map { case ((a, b), c) =>
      (a, b) -> math.log(c.toDouble / ctx(a))
    }.toMap
    RefModel(uniLp, oovLp, bigramLp, math.log(backoff))
  }

  private def refScore(doc: String, mdl: RefModel): (Double, Int, Int) = {
    val vset = mdl.uniLp.keySet
    def mm(t: String) = if (vset(t)) t else ""
    def uni(t: String) = mdl.uniLp.getOrElse(t, mdl.oovLp)
    val ts = refTokens(doc).map(mm)
    if (ts.isEmpty) return (0.0, 0, 0)
    var sum = uni(ts.head)
    var hits = 0
    ts.sliding(2).filter(_.size == 2).foreach { p =>
      mdl.bigramLp.get((p(0), p(1))) match {
        case Some(lp) => sum += lp; hits += 1
        case None => sum += mdl.backoffLp + uni(p(1))
      }
    }
    (sum, ts.size, hits)
  }

  // ——— fixture ———

  // fit corpus token counts: a=4, b=3, c=2  (mapped bigrams with V=2:
  // vocab {a, b}; c → "")
  private def fitCorpus = Seq(
    (1L, "a b a b c"),
    (2L, "a a b c")
  ).toDF("doc_id", "text")

  test("fit: hand-computed bigram conditionals over mapped tokens") {
    val m = TextAnalysis.fitBigramModel(fitCorpus, "text", vocabSize = 2)
    // doc1 mapped: a b a b ''  → (a,b) (b,a) (a,b) (b,'')
    // doc2 mapped: a a b ''    → (a,a) (a,b) (b,'')
    // counts: (a,b)=3 (b,a)=1 (b,'')=2 (a,a)=1 ; ctx: a=4, b=3
    val bm = m.bigramLogProbs.toMap
    assert(bm.size == 4)
    assert(bm("a b") === math.log(3.0 / 4) +- 1e-12)
    assert(bm("b a") === math.log(1.0 / 3) +- 1e-12)
    assert(bm("b ") === math.log(2.0 / 3) +- 1e-12) // (b, OOV)
    assert(bm("a a") === math.log(1.0 / 4) +- 1e-12)
  }

  test("score: seen bigrams use conditionals, unseen back off; first " +
      "token scores unigram") {
    val m = TextAnalysis.fitBigramModel(fitCorpus, "text", vocabSize = 2)
    // unigram: total=9, denom=9+3=12; a: log(5/12), b: log(4/12), oov log(1/12)
    val (la, lb, loov) =
      (math.log(5.0 / 12), math.log(4.0 / 12), math.log(1.0 / 12))
    val rows = TextAnalysis.scoreBigram(
        Seq((1L, "a b a"), (2L, "c a"), (3L, "b b")).toDF("doc_id", "text"),
        "text", m)
      .select("doc_id", "sum_lp", "n_tok", "n_hit")
      .as[(Long, Double, Int, Int)].collect().sortBy(_._1)
    // doc1: uni(a) + lp(a,b) + lp(b,a) — all seen
    assert(rows(0)._2 === la + math.log(3.0 / 4) + math.log(1.0 / 3) +- 1e-12)
    assert((rows(0)._3, rows(0)._4) == ((3, 2)))
    // doc2: c maps to OOV; uni('')=oov + ('',a) unseen → backoff + uni(a)
    assert(rows(1)._2 === loov + math.log(0.4) + la +- 1e-12)
    assert((rows(1)._3, rows(1)._4) == ((2, 0)))
    // doc3: uni(b) + (b,b) unseen → backoff + uni(b)
    assert(rows(2)._2 === lb + math.log(0.4) + lb +- 1e-12)
    assert((rows(2)._3, rows(2)._4) == ((2, 0)))
  }

  test("maxBigrams cap keeps the (count desc, bigram asc) prefix; " +
      "context masses stay pre-cap") {
    val m = TextAnalysis.fitBigramModel(
      fitCorpus, "text", vocabSize = 2, maxBigrams = 2)
    // top-2 by (n desc, bg asc): (a,b)=3, (b,'')=2
    assert(m.bigramLogProbs.map(_._1).sorted == Seq("a b", "b "))
    // conditional still divides by the PRE-cap context mass ctx(a)=4
    assert(m.bigramLogProbs.toMap.apply("a b") === math.log(3.0 / 4) +- 1e-12)
    // capped-away (b,a) backs off at scoring
    val r = TextAnalysis.scoreBigram(
        Seq((1L, "b a")).toDF("doc_id", "text"), "text", m)
      .select("sum_lp", "n_hit").as[(Double, Int)].head()
    val (la, lb) = (math.log(5.0 / 12), math.log(4.0 / 12))
    assert(r._1 === lb + math.log(0.4) + la +- 1e-12)
    assert(r._2 == 0)
  }

  test("edge docs: empty, whitespace-only, single-token, null") {
    val m = TextAnalysis.fitBigramModel(fitCorpus, "text", vocabSize = 2)
    val edge = Seq((10L, Some("")), (11L, Some("   ")), (12L, Some(" a ")),
      (13L, None)).toDF("doc_id", "text")
    val rows = TextAnalysis.scoreBigram(edge, "text", m)
      .select("doc_id", "n_tok", "n_hit", "avg_lp")
      .as[(Long, Option[Int], Option[Int], Option[Double])]
      .collect().sortBy(_._1)
    assert(rows(0) == ((10L, Some(0), Some(0), None)))
    assert(rows(1) == ((11L, Some(0), Some(0), None)))
    assert(rows(2)._2 == Some(1) && rows(2)._4.isDefined) // unigram only
    assert(rows(3) == ((13L, None, None, None)))          // null text
  }

  test("fuzz: fit+score == from-scratch model, held-out scoring " +
      "(100 cases)") {
    val rnd = new scala.util.Random(20260814)
    val alphabet = Vector("aa", "bb", "cc", "dd", "ee", "ff", "g", "h")
    for (caseId <- 1 to 100) {
      val nFit = 1 + rnd.nextInt(8)
      val nScore = 1 + rnd.nextInt(8)
      def doc(): String = {
        val n = rnd.nextInt(12)
        val seps = Vector(" ", "  ", "\t", " \n")
        (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.size)))
          .mkString(seps(rnd.nextInt(seps.size))) +
          (if (rnd.nextBoolean()) " " else "")
      }
      val fitDocs = (0 until nFit).map(_ => doc())
      val scoreDocs = (0 until nScore).map(_ => doc())
      val vocabSize = 1 + rnd.nextInt(6)
      val maxBigrams = 1 + rnd.nextInt(10)
      val ref = refFit(fitDocs, vocabSize, 1.0, 0.4, maxBigrams)
      val m = TextAnalysis.fitBigramModel(
        fitDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "text", vocabSize, 1.0, 0.4, maxBigrams)
      val got = TextAnalysis.scoreBigram(
          scoreDocs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text"), "text", m)
        .select("doc_id", "sum_lp", "n_tok", "n_hit")
        .as[(Long, Double, Int, Int)].collect().sortBy(_._1)
      scoreDocs.zipWithIndex.foreach { case (d, i) =>
        val (s, n, h) = refScore(d, ref)
        val g = got(i)
        assert(g._3 == n && g._4 == h,
          s"case $caseId doc $i: counts (${g._3},${g._4}) != ($n,$h) " +
            s"for '$d' fit=$fitDocs vocab=$vocabSize cap=$maxBigrams")
        assert(g._2 === s +- 1e-9,
          s"case $caseId doc $i: sum_lp ${g._2} != $s for '$d'")
      }
    }
  }

  test("plan: scoring is map-only — no exchange touches the corpus") {
    val m = TextAnalysis.fitBigramModel(fitCorpus, "text", vocabSize = 2)
    val df = TextAnalysis.scoreBigram(fitCorpus, "text", m)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bigram scoring leaked a shuffle:\n$plan")
  }

  test("scoreBigram refuses reserved column names (loud, not clobbered)") {
    val m = TextAnalysis.fitBigramModel(fitCorpus, "text", vocabSize = 2)
    val bad = fitCorpus.withColumn("n_hit", lit(7))
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.scoreBigram(bad, "text", m)
    }
    assert(e.getMessage.contains("n_hit"))
  }

  test("writeBigramModel/readBigramModel round-trip scores identically") {
    val m = TextAnalysis.fitBigramModel(fitCorpus, "text", vocabSize = 2)
    val path = java.nio.file.Files
      .createTempDirectory("bigram-model").resolve("m").toString
    TextAnalysis.writeBigramModel(spark, m, path)
    val m2 = TextAnalysis.readBigramModel(spark, path)
    assert(m2.unigram.logProbs == m.unigram.logProbs)
    assert(m2.unigram.oovLogProb == m.unigram.oovLogProb)
    assert(m2.unigram.totalTokens == m.unigram.totalTokens)
    assert(m2.unigram.alpha == m.unigram.alpha)
    assert(m2.backoff == m.backoff)
    assert(m2.bigramLogProbs.toMap == m.bigramLogProbs.toMap)
    val score = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val a = TextAnalysis.scoreBigram(score, "text", m)
      .select("sum_lp", "n_hit").as[(Double, Int)].head()
    val b = TextAnalysis.scoreBigram(score, "text", m2)
      .select("sum_lp", "n_hit").as[(Double, Int)].head()
    assert(a == b)
  }
}
