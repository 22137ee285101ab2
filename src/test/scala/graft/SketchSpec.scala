package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextAnalysis

/** Misra–Gries heavy-hitters: exactness at full capacity, the
  * [count_lo, count_lo + max_undercount] containment invariant under
  * forced partial merges, and guaranteed retention of true heavy
  * hitters. */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def exactCounts(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (t, l) => t -> l.size.toLong }

  test("capacity >= distinct tokens: summary is exact, zero undercount") {
    val docs = Seq("a b a c", "b a", "d d d c")
    val df = docs.toDF("text")
    val got = TextAnalysis.approxTopTokens(df, "text", 10, capacity = 64)
      .select("rank", "token", "count_lo", "max_undercount")
      .as[(Long, String, Long, Long)].collect().toSeq
    val exact = exactCounts(docs)
    assert(got.forall(_._4 == 0L))
    assert(got.map(r => r._2 -> r._3).toMap == exact)
    // rank order: count desc, token asc
    val expectedOrder = exact.toSeq.sortBy { case (t, n) => (-n, t) }.map(_._1)
    assert(got.sortBy(_._1).map(_._2) == expectedOrder)
  }

  test("MG invariant holds under forced partial merges; heavy hitters " +
      "are always retained") {
    val rnd = new scala.util.Random(17)
    // skewed vocabulary: a few heavy tokens + a long tail
    val heavy = Seq("alpha", "beta", "gamma")
    val docs = (0 until 400).map { _ =>
      val nH = rnd.nextInt(6)
      val nT = rnd.nextInt(6)
      (Seq.fill(nH)(heavy(rnd.nextInt(heavy.size))) ++
        Seq.fill(nT)("tail" + rnd.nextInt(200))).mkString(" ")
    }
    val exact = exactCounts(docs)
    val df = docs.toDF("text").repartition(7) // force per-partition summaries
    val got = TextAnalysis.approxTopTokens(df, "text", 32, capacity = 32)
      .select("token", "count_lo", "max_undercount")
      .as[(String, Long, Long)].collect().toSeq
    assert(got.nonEmpty)
    val delta = got.head._3
    assert(got.forall(_._3 == delta)) // one shared undercount bound
    // containment: count_lo <= true <= count_lo + delta
    got.foreach { case (t, lo, d) =>
      val tru = exact(t)
      assert(lo <= tru && tru <= lo + d, s"$t: lo=$lo delta=$d true=$tru")
    }
    // any token with true count > delta must be present
    val present = got.map(_._1).toSet
    exact.foreach { case (t, tru) =>
      if (tru > delta) assert(present.contains(t),
        s"heavy token $t (true=$tru > delta=$delta) missing")
    }
    // the genuinely heavy tokens are found at the top
    val top3 = TextAnalysis.approxTopTokens(df, "text", 3, capacity = 32)
      .select("token").as[String].collect().toSet
    assert(top3 == heavy.toSet)
  }

  test("tokens longer than 64 KiB survive the serialize/merge path") {
    // writeUTF would throw UTFDataFormatException past 65535 bytes of
    // modified UTF-8 — whitespace-free blobs (base64, minified JS) are
    // one "token" to the whitespace tokenizer, so the summary must
    // round-trip them through the partial-aggregate shuffle
    val blob = "x" * 70000
    val blobU = "é" * 40000 // 80000 UTF-8 bytes, multi-byte chars
    val docs = Seq(s"$blob common", s"$blob common", s"$blobU common", "common")
    val df = docs.toDF("text").repartition(3) // force serialize + merge
    val got = TextAnalysis.approxTopTokens(df, "text", 10, capacity = 16)
      .select("token", "count_lo").as[(String, Long)].collect().toMap
    assert(got("common") == 4L)
    assert(got(blob) == 2L)
    assert(got(blobU) == 1L)
  }

  test("empty corpus and null/empty text yield an empty summary") {
    val df = Seq(Option.empty[String], Some(""), Some("   "))
      .toDF("text")
    val got = TextAnalysis.approxTopTokens(df, "text", 5, capacity = 8)
      .collect()
    assert(got.isEmpty)
  }
}
