package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Bpe

/** BPE tokenizer (Bpe.fit / learnMerges / encode / BpeEncode kernel):
  * the classic hand-computed fixture, an independent from-scratch
  * trainer+encoder differential model over randomized corpora, the
  * maxWords cap, zero-merge identity, determinism, persistence
  * round-trip, and the map-only encode plan. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ——— independent reference (from scratch: immutable Lists, fold-based
  // counting, recursive merge application) ———

  private val Eow = "</w>"

  private def refSyms(w: String): List[String] =
    w.toCharArray.map(_.toString).toList :+ Eow

  private def refPairCounts(
      vocab: List[(List[String], Long)]): Map[(String, String), Long] =
    vocab.foldLeft(Map.empty[(String, String), Long]) { case (acc, (syms, c)) =>
      syms.zip(syms.tail).foldLeft(acc) { (a, p) =>
        a.updated(p, a.getOrElse(p, 0L) + c)
      }
    }

  private def refMerge(
      syms: List[String], p: (String, String)): List[String] = syms match {
    case a :: b :: rest if a == p._1 && b == p._2 =>
      (a + b) :: refMerge(rest, p)
    case a :: rest => a :: refMerge(rest, p)
    case Nil => Nil
  }

  private def refLearn(
      wordCounts: Seq[(String, Long)], n: Int): List[(String, String)] = {
    var vocab = wordCounts.map { case (w, c) => (refSyms(w), c) }.toList
    var merges = List.empty[(String, String)]
    var i = 0
    var stop = false
    while (i < n && !stop) {
      val stats = refPairCounts(vocab)
      if (stats.isEmpty) stop = true
      else {
        val best = stats.toList.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges = merges :+ best
        vocab = vocab.map { case (s, c) => (refMerge(s, best), c) }
      }
      i += 1
    }
    merges
  }

  private def refEncodeWord(
      w: String, merges: List[(String, String)]): List[String] = {
    val ranks = merges.zipWithIndex.toMap
    var syms = refSyms(w)
    var done = false
    while (!done) {
      val cands = syms.zip(syms.tail).flatMap(p => ranks.get(p).map(p -> _))
      if (cands.isEmpty) done = true
      else syms = refMerge(syms, cands.minBy(_._2)._1)
    }
    syms
  }

  private def refEncodeDoc(
      doc: String, merges: List[(String, String)]): List[String] =
    "\\s+".r.split(doc).toList.filter(_.nonEmpty)
      .flatMap(refEncodeWord(_, merges))

  // ——— fixture: the classic low/lower corpus ———

  test("learnMerges: hand-computed merge sequence") {
    // words: low×5, lower×2 ; symbols l o w </w> (+ e r)
    // pair counts r1: (l,o)=7 (o,w)=7 (w,</w>)=5 (w,e)=2 (e,r)=2 (r,</w>)=2
    // tie (l,o) vs (o,w) at 7 → lexicographic: (l,o)
    val m = Bpe.learnMerges(Seq(("low", 5L), ("lower", 2L)), 3)
    assert(m(0) == (("l", "o")))
    // r2: (lo,w)=7 (w,</w>)=5 ... → (lo,w)
    assert(m(1) == (("lo", "w")))
    // r3: (low,</w>)=5 vs (low,e)=2,(e,r)=2,(r,</w>)=2 → (low,</w>)
    assert(m(2) == (("low", "</w>")))
  }

  test("encode: greedy lowest-rank merges; final subword carries </w>") {
    val model = Bpe.BpeModel(
      Seq(("l", "o"), ("lo", "w"), ("low", "</w>")))
    val out = Seq((1L, "low lower lowest"))
      .toDF("doc_id", "text")
      .select(Bpe.encode(col("text"), model).as("t"))
      .as[Seq[String]].head()
    assert(out == Seq("low</w>", "low", "e", "r", "</w>",
      "low", "e", "s", "t", "</w>"))
  }

  test("zero merges: pure code-point + </w> split") {
    val model = Bpe.BpeModel(Nil)
    val out = Seq((1L, "ab c"))
      .toDF("doc_id", "text")
      .select(Bpe.encode(col("text"), model).as("t"))
      .as[Seq[String]].head()
    assert(out == Seq("a", "b", "</w>", "c", "</w>"))
  }

  test("fuzz: fit+encode == from-scratch trainer+encoder (60 cases)") {
    val rnd = new scala.util.Random(0xb9e)
    val alphabet = "abcde"
    for (caseId <- 1 to 60) {
      def word(): String =
        (0 until 1 + rnd.nextInt(5))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      def doc(): String =
        (0 until rnd.nextInt(10)).map(_ => word()).mkString(" ")
      val docs = (0 until 1 + rnd.nextInt(6)).map(_ => doc())
      val numMerges = rnd.nextInt(12)
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val model = Bpe.fit(df, "text", numMerges, maxWords = 1 << 16)
      // reference trains on the full word-count table of the same corpus
      val wc = docs.flatMap("\\s+".r.split(_)).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val refMerges = refLearn(wc, numMerges)
      assert(model.merges == refMerges,
        s"case $caseId: merges ${model.merges} != $refMerges on $docs")
      val got = df.select(col("doc_id"), Bpe.encode(col("text"), model).as("t"))
        .as[(Long, Seq[String])].collect().sortBy(_._1)
      docs.zipWithIndex.foreach { case (d, i) =>
        assert(got(i)._2 == refEncodeDoc(d, refMerges),
          s"case $caseId doc $i: encode mismatch on '$d'")
      }
    }
  }

  test("maxWords cap: training sees only the most frequent words, " +
      "encode still covers the rest") {
    // 'aa'×3, 'bb'×2, 'cc'×1 — cap 2 drops cc from TRAINING only
    val df = Seq((1L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    val m = Bpe.fit(df, "text", numMerges = 2, maxWords = 2)
    val mRef = refLearn(Seq(("aa", 3L), ("bb", 2L)), 2)
    assert(m.merges == mRef)
    // cc still encodes (to chars + </w> unless a merge happens to apply)
    val out = df.select(Bpe.encode(col("text"), m).as("t"))
      .as[Seq[String]].head()
    assert(out.containsSlice(refEncodeWord("cc", mRef)))
  }

  test("fit is deterministic across invocations") {
    val df = Seq((1L, "ab ba ab ba aab")).toDF("doc_id", "text")
    val a = Bpe.fit(df, "text", 5)
    val b = Bpe.fit(df, "text", 5)
    assert(a.merges == b.merges)
  }

  test("writeModel/readModel round-trip preserves rank order and encode") {
    val df = Seq((1L, "low lower low lowest")).toDF("doc_id", "text")
    val m = Bpe.fit(df, "text", 4)
    val path = java.nio.file.Files
      .createTempDirectory("bpe-model").resolve("m").toString
    Bpe.writeModel(spark, m, path)
    val m2 = Bpe.readModel(spark, path)
    assert(m2.merges == m.merges)
    val a = Bpe.encodeStats(df, "text", m).select("tok_hash")
      .as[Long].collect().toSeq
    val b = Bpe.encodeStats(df, "text", m2).select("tok_hash")
      .as[Long].collect().toSeq
    assert(a == b)
  }

  test("encodeStats: counts and null/edge docs") {
    val m = Bpe.BpeModel(Seq(("l", "o"), ("lo", "w")))
    val df = Seq((1L, Some("low low")), (2L, Some("")), (3L, Some("  ")),
      (4L, None)).toDF("doc_id", "text")
    val rows = Bpe.encodeStats(df, "text", m)
      .select("doc_id", "n_words", "n_tok_bpe", "n_chars")
      .as[(Long, Option[Int], Option[Int], Option[Int])]
      .collect().sortBy(_._1)
    // "low" → [low, </w>]: 2 subwords per word
    assert(rows(0) == ((1L, Some(2), Some(4), Some(6))))
    assert(rows(1) == ((2L, Some(0), Some(0), Some(0))))
    assert(rows(2) == ((3L, Some(0), Some(0), Some(0))))
    assert(rows(3)._2.isEmpty && rows(3)._3.isEmpty) // null text
    // tok_hash pins token VALUES: null text must hash NULL, not collide
    // with a genuinely empty document's hash (advisor-r11)
    val hashes = Bpe.encodeStats(df, "text", m)
      .select("doc_id", "tok_hash")
      .as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(hashes(3)._2.isEmpty, "null text must have NULL tok_hash")
    assert(hashes(1)._2.nonEmpty, "empty text hashes its empty encoding")
  }

  test("plan: encode is map-only — no exchange touches the corpus") {
    val m = Bpe.BpeModel(Seq(("l", "o")))
    val df = Seq((1L, "low")).toDF("doc_id", "text")
    val out = Bpe.encodeStats(df, "text", m)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"BPE encode leaked a shuffle:\n$plan")
  }

  test("encodeStats refuses reserved column names (loud, not clobbered)") {
    val m = Bpe.BpeModel(Seq(("l", "o")))
    val bad = Seq((1L, "low", 9)).toDF("doc_id", "text", "tok_hash")
    val e = intercept[IllegalArgumentException] {
      Bpe.encodeStats(bad, "text", m)
    }
    assert(e.getMessage.contains("tok_hash"))
  }
}
