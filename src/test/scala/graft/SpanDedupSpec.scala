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
