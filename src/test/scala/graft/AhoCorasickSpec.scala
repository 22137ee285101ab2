package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextAnalysis

/** Multi-phrase blocklist over the Aho–Corasick kernel
  * ([[graft.functions.AhoCorasickStats]]): hand fixtures for the
  * overlap/containment semantics, a 100-case differential fuzz against
  * a brute-force indexOf model, the gate contract, and the map-only
  * plan. */
class AhoCorasickSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def stats(text: String, phrases: Seq[String]): (Long, Int) =
    TextAnalysis.phraseStats(Seq((0L, text)).toDF("id", "t"), "t", phrases)
      .select("n_phrase_hits", "n_phrases_hit")
      .as[(Long, Int)].head()

  test("occurrence semantics: overlapping matches and contained phrases " +
      "all count; distinct-phrase count is presence") {
    // "aa" occurs 3 times in "aaaa" (end positions 1,2,3)
    assert(stats("aaaa", Seq("aa")) == ((3L, 1)))
    // contained phrases both fire: "ab" once, "b" twice
    assert(stats("abcb", Seq("ab", "b")) == ((3L, 2)))
    // a phrase that is a suffix of another still fires via suffix links
    assert(stats("xabab", Seq("abab", "bab", "zz")) == ((2L, 2)))
    // empty text, no hits
    assert(stats("", Seq("a")) == ((0L, 0)))
    // multi-word phrases over the corpus-shaped vocabulary
    assert(stats("fast table scan slow fast table", Seq("fast table",
      "scan slow", "quantum banana")) == ((3L, 2)))
  }

  test("fuzz: == brute-force indexOf model on dense small-alphabet text " +
      "(100 cases)") {
    val rnd = new scala.util.Random(47)
    def rs(n: Int, alpha: Int) =
      (1 to n).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString
    for (cse <- 1 to 100) {
      val alpha = 2 + rnd.nextInt(3)
      val text = rs(20 + rnd.nextInt(120), alpha)
      val phrases = (0 until 1 + rnd.nextInt(8))
        .map(_ => rs(1 + rnd.nextInt(5), alpha)).distinct
      val (hits, distinct) = stats(text, phrases)
      var wantHits = 0L
      var wantDistinct = 0
      phrases.foreach { p =>
        var i = text.indexOf(p)
        var any = false
        while (i >= 0) { wantHits += 1; any = true; i = text.indexOf(p, i + 1) }
        if (any) wantDistinct += 1
      }
      assert((hits, distinct) == ((wantHits, wantDistinct)),
        s"case $cse text=$text phrases=$phrases")
    }
  }

  test("guards: duplicate phrases and output-name collisions are " +
      "rejected loudly") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextAnalysis.phraseStats(docs, "text", Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.phraseStats(
        docs.withColumn("n_phrases_hit", lit(1)), "text", Seq("a"))
    }
  }

  test("dropBlockedPhrases keeps exactly the hit-free docs; null text " +
      "passes the gate (a blocklist only drops what it names); plan is " +
      "map-only") {
    val docs = Seq(
      (1L, "clean words only here"),
      (2L, "contains a bad phrase inside"),
      (3L, "another clean one"),
      (4L, null))
      .toDF("doc_id", "text")
    val kept = TextAnalysis.dropBlockedPhrases(docs, "text",
        Seq("bad phrase", "worse phrase"))
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(1L, 3L, 4L))
    val plan = TextAnalysis.phraseStats(docs, "text", Seq("x"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"phraseStats grew an exchange:\n$plan")
  }
}
