package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.QualityClassifier

class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic separable corpus: positives talk like reference pages,
    * negatives like spam; held-out docs reuse the same generators with
    * different mixing offsets. */
  private def labeledCorpus(n: Int, offset: Int) = {
    val pos = Seq("reference", "study", "method", "analysis", "source")
    val neg = Seq("buy", "click", "winner", "free", "casino")
    (0 until n).map { i =>
      val j = i + offset
      val good = j % 2 == 0
      val base = if (good) pos else neg
      // vary length and composition deterministically
      val words = (0 to j % 4).flatMap(r => base.drop(j % 3)) ++
        Seq("the", "a", "page")
      (j.toLong, words.mkString(" "), if (good) 1.0 else 0.0)
    }.toDF("doc_id", "text", "label")
  }

  test("train + score separates a held-out labeled corpus") {
    val clf = QualityClassifier.train(
      labeledCorpus(200, 0), "text", "label", numFeatures = 1 << 12)
    val scored = QualityClassifier.score(
      labeledCorpus(100, 1000), "text", clf)
    assert(scored.columns.contains("quality_prob"))
    val acc = scored
      .select(avg(when(
        (col("quality_prob") >= 0.5) === (col("label") === 1.0), 1.0)
        .otherwise(0.0)))
      .head().getDouble(0)
    assert(acc >= 0.95, s"held-out accuracy $acc below 0.95")
    val bounds = scored.agg(
      min(col("quality_prob")), max(col("quality_prob"))).head()
    assert(bounds.getDouble(0) >= 0.0 && bounds.getDouble(1) <= 1.0)
  }

  test("score is schema-stable and row-preserving") {
    val clf = QualityClassifier.train(
      labeledCorpus(60, 0), "text", "label", numFeatures = 1 << 10)
    val in = Seq((1L, "reference analysis"), (2L, ""), (3L, "casino click"))
      .toDF("doc_id", "text")
    val out = QualityClassifier.score(in, "text", clf)
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("doc_id", "text", "quality_prob"))
  }

  test("markerLogit matches the closed form exactly (dyadic weights)") {
    val df = Seq(
      (1L, "data data slow the"),
      (2L, "spark"),
      (3L, "")).toDF("doc_id", "text")
    val got = QualityClassifier.markerLogit(
        df, "text",
        Seq(("data", 0.75), ("slow", -1.25), ("spark", 0.5)),
        bias = -0.25)
      .select("doc_id", "logit", "prob")
      .as[(Long, Double, Double)].collect().toSeq.sortBy(_._1)
    def sig(x: Double) =
      BigDecimal(1.0 / (1.0 + math.exp(-x)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc1: -0.25 + 2·0.75 − 1.25 = 0.0; doc2: -0.25 + 0.5 = 0.25;
    // doc3 (no tokens): bias
    assert(got == Seq(
      (1L, 0.0, sig(0.0)),
      (2L, 0.25, sig(0.25)),
      (3L, -0.25, sig(-0.25))))
  }

  test("noisyThresholdGate: deterministic, reseedable, score-monotone in aggregate") {
    val n = 2000
    val df = (0 until n).map(i => (i.toLong, if (i % 2 == 0) 0.9 else 0.0))
      .toDF("doc_id", "score")
    val kept = QualityClassifier.noisyThresholdGate(df, "doc_id", "score")
      .select("doc_id").as[Long].collect().toSet
    // Lomax survival P(draw > x) = (1+x)^(-9): x=0.1 → ~0.42, x=1 → ~0.2%
    val hi = kept.count(_ % 2 == 0) / (n / 2).toDouble
    val lo = kept.count(_ % 2 == 1) / (n / 2).toDouble
    assert(hi > 0.3 && hi < 0.55, s"high-score survival $hi outside (0.3, 0.55)")
    assert(lo < 0.02, s"zero-score survival $lo should be ~0.2%")
    // deterministic replay; a different seed draws a different sample
    val again = QualityClassifier.noisyThresholdGate(df, "doc_id", "score")
      .select("doc_id").as[Long].collect().toSet
    assert(again == kept)
    val reseeded = QualityClassifier.noisyThresholdGate(
        df, "doc_id", "score", seed = "7")
      .select("doc_id").as[Long].collect().toSet
    assert(reseeded != kept)
    // the gate only filters: survivors are input rows with the draw appended
    assert(kept.subsetOf((0 until n).map(_.toLong).toSet))
  }

  test("fuzz: VocabTfs-fused markerLogit == split/count driver model " +
      "(100 cases, adversarial whitespace)") {
    val weights = Seq(("data", 0.75), ("slow", -1.25), ("spark", 0.5),
      ("the", -0.125))
    val bias = -0.25
    val vocab = Array("data", "slow", "spark", "the", "DATA", "spar",
      "sparkk", "", "a")
    val rnd = new scala.util.Random(77)
    val ws = Array(" ", "  ", "\t", "\n", "\r", "", "\f")
    val texts = (0 until 100).map { i =>
      val n = rnd.nextInt(30)
      (i.toLong, (0 until n).map(_ =>
        vocab(rnd.nextInt(vocab.length)) + ws(rnd.nextInt(ws.length)))
        .mkString + (if (rnd.nextBoolean()) "data" else ""))
    }
    val df = texts.toDF("doc_id", "text")
    val got = QualityClassifier.markerLogit(df, "text", weights, bias)
      .select("doc_id", "logit").as[(Long, Double)].collect().toMap
    def model(text: String): Double = {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      // left-to-right in declared weight order, like the column fold
      weights.foldLeft(bias) { case (acc, (t, w)) =>
        acc + w * toks.count(_ == t)
      }
    }
    texts.foreach { case (id, text) =>
      val want = BigDecimal(model(text))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want " +
        s"for text '${text.take(60)}'")
    }
  }

  test("markerLogit rejects duplicate marker terms") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      QualityClassifier.markerLogit(
        df, "text", Seq(("a", 1.0), ("a", 2.0)), bias = 0.0)
    }
  }
}
