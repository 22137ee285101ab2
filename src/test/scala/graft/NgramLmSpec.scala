package graft

import org.apache.spark.sql.functions._
import org.scalactic.Tolerance._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextAnalysis
import graft.ext.TextAnalysis.NgramLmModel

/** Hashed n≤5 stupid-backoff LM (fitNgramModel / scoreNgram +
  * NgramHashes / NgramBackoffLogProbStats kernels): portable-hash pin
  * against Spark's own md5 SQL, from-scratch fit+score differentials
  * (caps, collisions, backoff chains), model persistence round trip,
  * and the n=2 relationship to the bigram scorer's shape. */
class NgramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— from-scratch reference (immutable collections, direct math) ———

  private def refHash(g: String): Long =
    java.math.BigInteger
      .valueOf(0)
      .add(new java.math.BigInteger(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(g).substring(0, 14),
        16))
      .longValueExact()

  private def toks(text: String): Vector[String] =
    text.split("\\s+").filter(_.nonEmpty).toVector

  private def refFit(
      texts: Seq[String], n: Int, cap: Int): (Seq[Map[Long, Long]], Long) = {
    val all = for {
      t <- texts.map(toks)
      i <- t.indices
      o <- 1 to math.min(n, i + 1)
    } yield (o, refHash(t.slice(i - o + 1, i + 1).mkString(" ")))
    val total = all.count(_._1 == 1).toLong
    val tables = (1 to n).map { o =>
      all.filter(_._1 == o).groupBy(_._2).view.mapValues(_.size.toLong)
        .toSeq.sortBy { case (h, c) => (-c, h) }.take(cap).toMap
    }
    (tables, total)
  }

  private def refScore(
      text: String, n: Int, tables: Seq[Map[Long, Long]], total: Long,
      b1: Int, alpha: Double, backoff: Double): (Double, Int, Int) = {
    val t = toks(text)
    var sum = 0.0
    var nTop = 0
    for (i <- t.indices) {
      val maxO = math.min(n, i + 1)
      def tryOrder(o: Int): Double =
        if (o == 1) {
          val c = tables.head.getOrElse(refHash(t(i)), 0L).toDouble
          (maxO - 1) * math.log(backoff) +
            math.log((c + alpha) / (total + alpha * (b1 + 1)))
        } else {
          val gh = refHash(t.slice(i - o + 1, i + 1).mkString(" "))
          val ch = refHash(t.slice(i - o + 1, i).mkString(" "))
          (tables(o - 1).get(gh), tables(o - 2).get(ch)) match {
            case (Some(cg), Some(cc)) =>
              if (o == maxO) nTop += 1
              (maxO - o) * math.log(backoff) +
                math.log(cg.toDouble / cc.toDouble)
            case _ => tryOrder(o - 1)
          }
        }
      sum += tryOrder(maxO)
    }
    (sum, t.length, nTop)
  }

  test("kernel hash56 == Spark's conv(substr(md5, 1, 14), 16, 10)") {
    val samples = Seq("abc", "the quick fox", "", "a b", "ümlaut Ünicode",
      "x" * 100)
    val viaSql = samples.toDF("s")
      .select(conv(substring(md5(col("s").cast("binary")), 1, 14), 16, 10)
        .cast("long"))
      .as[Long].collect().toSeq
    val viaKernel = samples.map(graft.functions.NgramHashing.hash56)
    assert(viaKernel == viaSql)
    assert(viaKernel == samples.map(refHash))
  }

  test("fit+score == from-scratch reference (fuzz: caps, backoff chains)") {
    val r = new scala.util.Random(0xbead5)
    val words = Vector("aa", "bb", "cc", "dd", "ee")
    for (caseId <- 1 to 12) {
      val n = 1 + r.nextInt(5)
      val cap = 1 + r.nextInt(12) // small: the cap MUST bite
      val nDocs = 4 + r.nextInt(6)
      val texts = (0 until nDocs).map(_ =>
        (0 until r.nextInt(12)).map(_ => words(r.nextInt(words.size)))
          .mkString(" "))
      val fitIdx = texts.indices.filter(_ % 2 == 0)
      val model = TextAnalysis.fitNgramModel(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .filter(x => fitIdx.contains(x._1.toInt)).toDF("id", "text"),
        "text", n, alpha = 1.0, backoff = 0.4, maxPerOrder = cap)
      val (refTables, refTotal) = refFit(fitIdx.map(texts), n, cap)
      assert(model.tables.map(_.toMap) == refTables,
        s"case $caseId: fitted tables diverge (n=$n cap=$cap)")
      assert(model.totalTokens == refTotal, s"case $caseId: total")
      assert(model.b1 == refTables.head.size, s"case $caseId: b1")
      val got = TextAnalysis.scoreNgram(
          texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("id", "text"), "text", model)
        .select("id", "sum_lp", "n_tok", "n_top")
        .as[(Long, Double, Int, Int)].collect().sortBy(_._1)
      texts.zipWithIndex.foreach { case (t, i) =>
        val (s, nt, topN) = refScore(
          t, n, refTables, refTotal, model.b1, 1.0, 0.4)
        val g = got(i)
        assert(g._2 === s +- 1e-9, s"case $caseId doc $i: sum_lp")
        assert((g._3, g._4) == ((nt, topN)), s"case $caseId doc $i: counts")
      }
    }
  }

  test("write/readNgramModel round-trips value-exactly; scores agree") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val model = TextAnalysis.fitNgramModel(
      docs.filter(col("doc_id") % 2 === 0), "text", n = 3,
      maxPerOrder = 500)
    val tmp = java.nio.file.Files.createTempDirectory("ngramlm").toString
    TextAnalysis.writeNgramModel(spark, model, tmp)
    val back = TextAnalysis.readNgramModel(spark, tmp)
    assert(back == model)
    val a = TextAnalysis.scoreNgram(docs, "text", model)
      .select("doc_id", "sum_lp").as[(Long, Double)].collect().sortBy(_._1)
    val b = TextAnalysis.scoreNgram(docs, "text", back)
      .select("doc_id", "sum_lp").as[(Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq)
  }

  test("null / empty / whitespace-only text scores to (0, 0, 0)") {
    val model = TextAnalysis.fitNgramModel(
      Seq((1L, "a b c a b")).toDF("id", "text"), "text", n = 3)
    val got = TextAnalysis.scoreNgram(
        Seq((1L, Some("")), (2L, Some("   \t  ")), (3L, None: Option[String]))
          .toDF("id", "text"), "text", model)
      .select("id", "n_tok", "n_top", "avg_lp")
      .collect().map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3)))
    assert(got(0) == ((1L, 0, 0, null)))
    assert(got(1) == ((2L, 0, 0, null)))
    // null text: kernel null-propagates, counts are null too
    assert(got(2)._1 == 3L && got(2)._4 == null)
  }
}
