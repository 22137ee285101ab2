package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** ExactSubstr-style span dedup against hand-computed fixtures: window
  * detection positions, keep-first masking, overlap coverage, whole-doc
  * elimination, byte-identical untouched docs. The oracle queries
  * (`dedup_spans`, `text_span_dedup`) pin the same semantics vs DuckDB
  * at three SFs; DifferentialFuzzSpec replays randomized corpora against
  * a from-scratch model. */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("repeatedSpans: shared run yields every covering window, both docs") {
    // docs share the 6-token run "a b c d e f" → with n=4 the windows
    // "a b c d"/"b c d e"/"c d e f" each occur twice
    val df = Seq(
      (0L, "a b c d e f g h"),
      (1L, "x a b c d e f y")).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(df, "doc_id", "text", 4)
      .orderBy("doc_id", "pos")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 2L), (0L, 2L, 2L), (0L, 3L, 2L),
      (1L, 2L, 2L), (1L, 3L, 2L), (1L, 4L, 2L)))
  }

  test("dropRepeatedSpans: later doc loses the shared run, first keeps it") {
    val df = Seq(
      (0L, "a b c d e f g h"),
      (1L, "x a b c d e f y")).toDF("doc_id", "text")
    val got = Dedup.dropRepeatedSpans(df, "doc_id", "text", 4)
      .orderBy("doc_id").select("text").as[String].collect().toSeq
    // doc 1's occurrences at pos 2,3,4 cover tokens 2..7
    assert(got == Seq("a b c d e f g h", "x y"))
  }

  test("within-doc repeat: the second occurrence is masked") {
    val df = Seq((5L, "p q r s p q r s")).toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(df, "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(spans == Set((5L, 1L, 2L), (5L, 5L, 2L)))
    val got = Dedup.dropRepeatedSpans(df, "doc_id", "text", 4)
      .select("text").as[String].head()
    assert(got == "p q r s")
  }

  test("whole-doc duplicate is emptied; untouched docs stay byte-identical") {
    val weird = "u  v\tw   z" // internal whitespace must survive untouched
    val df = Seq(
      (0L, "m n o p"),
      (1L, "m n o p"),
      (2L, weird),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Dedup.dropRepeatedSpans(df, "doc_id", "text", 4)
      .orderBy("doc_id").select("text").as[Option[String]].collect().toSeq
    assert(got == Seq(Some("m n o p"), Some(""), Some(weird), None))
  }

  test("span index round-trip: increment masking == recomputed full-corpus " +
      "dropRepeatedSpans on the increment rows") {
    // randomized corpus with verbatim cross- and within-split repeats;
    // history ids (even, 0..98) precede increment ids (odd + copies at
    // 101+), so the full-corpus min-(doc,pos) keeper coincides with the
    // increment path's history-wins precedence — the documented parity
    // regime
    val rnd = new scala.util.Random(19)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val base = (0 until 60).map { i =>
      val len = rnd.nextInt(14) // includes < n tokens → no windows
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // the increment: verbatim copies of history docs (history→increment
    // repeats), fresh random docs, and a within-increment duplicate pair;
    // ALL increment ids follow every history id
    val copies = base.take(8).map { case (id, t) => (id + 101L, t) }
    val fresh = (0 until 20).map { i =>
      val len = rnd.nextInt(14)
      (200L + i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val withinDup = Seq((301L, "zz yy xx ww vv uu"), (303L, "zz yy xx ww vv uu"))
    val docs = (base ++ copies ++ fresh ++ withinDup).toDF("doc_id", "text")
    val history = docs.filter(col("doc_id") < 100)
    val increment = docs.filter(col("doc_id") >= 100)
    val n = 4
    val dir = java.nio.file.Files.createTempDirectory("graft-span-idx").toFile
    dir.deleteOnExit()
    Dedup.writeSpanIndex(history, "doc_id", "text", dir.getAbsolutePath, n)
    val idx = spark.read.parquet(dir.getAbsolutePath)
    // history windows repeated only against the increment must still be
    // in the index (it persists ALL occurrences, not just repeated ones)
    assert(idx.columns.toSeq == Seq("h1", "h2", "doc_id", "pos"))
    val got = Dedup.dropRepeatedSpansIncrement(
        increment, idx, "doc_id", "text", n)
      .select("doc_id", "text").as[(Long, Option[String])].collect().toMap
    val expected = Dedup.dropRepeatedSpans(
        docs, "doc_id", "text", n)
      .join(increment.select("doc_id"), Seq("doc_id"), "left_semi")
      .select("doc_id", "text").as[(Long, Option[String])].collect().toMap
    assert(got.keySet == expected.keySet)
    // real repeats must exist for the test to bite
    val touched = increment.select("doc_id", "text")
      .as[(Long, Option[String])].collect().toMap
      .exists { case (k, v) => got(k) != v }
    assert(touched, "fixture produced no masked increment doc")
    got.foreach { case (k, v) =>
      assert(v == expected(k), s"doc $k: increment=$v recomputed=${expected(k)}")
    }
  }

  test("rewrite composes: a second pass finds nothing new (idempotence " +
      "on the fixture)") {
    val df = Seq(
      (0L, "a b c d e f g h"),
      (1L, "x a b c d e f y"),
      (2L, "a b c d e f q r")).toDF("doc_id", "text")
    val once = Dedup.dropRepeatedSpans(df, "doc_id", "text", 4)
    val twice = Dedup.dropRepeatedSpans(once, "doc_id", "text", 4)
    val a = once.orderBy("doc_id").select("text").as[String].collect().toSeq
    val b = twice.orderBy("doc_id").select("text").as[String].collect().toSeq
    assert(a == b)
  }
}
