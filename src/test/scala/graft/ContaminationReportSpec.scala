package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** The fused [[Dedup.contaminationReport]] (one corpus gram pass, both
  * directions) must be value-identical to running [[Dedup.contaminationScore]]
  * and [[Dedup.contaminationAttribution]] separately — the two oracle rows
  * `text_contamination` / `text_contamination_report` pin the separate
  * functions against DuckDB; this spec pins the fusion against them, in
  * both join postures, on corpora with real overlap, empty docs, and
  * no-hit docs.
  */
class ContaminationReportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpusOf(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val vocab = Vector("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "pack", "my", "box", "with", "five", "dozen", "jugs")
    val docs = (0 until n).map { i =>
      val len = rnd.nextInt(20) // includes < n tokens → no grams
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // verbatim cross-parity copies: guaranteed high-overlap leaks
    val dups = docs.take(5).map { case (id, t) => (id + 501L, t) }
    (docs ++ dups).toDF("doc_id", "text")
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("contaminationReport == separate score + attribution (both postures)") {
    for (seed <- Seq(3, 11); bcast <- Seq(true, false)) {
      val docs = corpusOf(seed, 60)
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      val bench = docs.filter(col("doc_id") % 2 === 1)
      val expScore = Dedup.contaminationScore(corpus, bench, "doc_id", "text")
      val expAttr = Dedup.contaminationAttribution(
        corpus, bench, "doc_id", "doc_id", "text", "text",
        broadcastBenchmark = bcast)
      val (gotScore, gotAttr) = Dedup.contaminationReport(
        corpus, bench, "doc_id", "doc_id", "text", "text",
        broadcastBenchmark = bcast)
      assert(gotScore.columns.toSeq == expScore.columns.toSeq)
      assert(gotAttr.columns.toSeq == expAttr.columns.toSeq)
      assert(rows(gotScore) == rows(expScore),
        s"score mismatch (seed=$seed bcast=$bcast)")
      assert(rows(gotAttr) == rows(expAttr),
        s"attribution mismatch (seed=$seed bcast=$bcast)")
    }
  }

  test("contaminationAttributionCompact (single-pass kernel) == join-form " +
      "attribution, incl. duplicate bench ids and zero-gram edges") {
    for (seed <- Seq(3, 11, 42)) {
      val docs = corpusOf(seed, 60)
      val corpus = docs.filter(col("doc_id") % 2 === 0)
      // duplicate bench ids: two rows share id 999 — the union semantics
      // the default join path implements with its groupBy
      val bench = docs.filter(col("doc_id") % 2 === 1)
        .unionByName(Seq((999L, "the quick brown fox"),
          (999L, "fox jumps over lazy")).toDF("doc_id", "text"))
      val exp = Dedup.contaminationAttribution(
        corpus, bench, "doc_id", "doc_id", "text", "text")
      val got = Dedup.contaminationAttributionCompact(
        corpus, bench, "doc_id", "doc_id", "text", "text")
      assert(got.columns.toSeq == exp.columns.toSeq)
      assert(rows(got) == rows(exp), s"compact mismatch (seed=$seed)")
    }
    // empty benchmark gram side: empty result, correct schema
    val corpus = Seq((0L, "aa bb cc dd ee")).toDF("doc_id", "text")
    val bench = Seq((1L, "xx")).toDF("doc_id", "text") // < n tokens
    val got = Dedup.contaminationAttributionCompact(
      corpus, bench, "doc_id", "doc_id", "text", "text")
    assert(got.columns.toSeq ==
      Seq("bench_id", "n_contaminated_docs", "max_overlap"))
    assert(got.count() == 0)
    // oversized benchmark fails AT CONSTRUCTION with the argument-swap
    // diagnostic — and via a distributed pre-count, so the failure comes
    // BEFORE any corpus-sized collect can reach the driver
    val big = corpusOf(7, 200)
    val e = intercept[IllegalArgumentException](
      Dedup.contaminationAttributionCompact(
        big, big, "doc_id", "doc_id", "text", "text",
        maxBenchmarkPostings = 10))
    assert(e.getMessage.contains("swap"), s"unexpected: ${e.getMessage}")
  }

  test("report handles a benchmark with zero overlap and empty docs") {
    val corpus = Seq((0L, "aa bb cc dd ee"), (2L, ""), (4L, "one two")).toDF("doc_id", "text")
    val bench = Seq((1L, "xx yy zz ww vv"), (3L, "")).toDF("doc_id", "text")
    val (score, attr) = Dedup.contaminationReport(
      corpus, bench, "doc_id", "doc_id", "text", "text")
    val s = score.orderBy("doc_id").collect()
    // only docs with >= 1 gram emit a row; nothing is contaminated
    assert(s.map(_.getLong(0)).toSeq == Seq(0L))
    assert(s.forall(_.getLong(2) == 0L))
    assert(attr.count() == 0)
  }
}
