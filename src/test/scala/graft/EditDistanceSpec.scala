package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dedup

/** Edit-distance near-dup pairs ([[Dedup.editDistancePairs]], the
  * Ed-Join prefix-filter family): builtin threshold semantics, hand
  * fixtures, the short-string contract, and a randomized differential
  * completeness check against naive all-pairs Levenshtein. */
class EditDistanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("builtin levenshtein threshold semantics: -1 past the band") {
    // the operator's verify step depends on exactly this contract
    val r = Seq(("kitten", "sitting")).toDF("a", "b")
      .select(levenshtein(col("a"), col("b")),
        levenshtein(col("a"), col("b"), 3),
        levenshtein(col("a"), col("b"), 2))
      .as[(Int, Int, Int)].head()
    assert(r == ((3, 3, -1)))
  }

  test("editDistancePairs: revision twins found, far docs not, " +
      "short strings excluded") {
    val a = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(
      (1L, a),
      (2L, a.dropRight(3) + " zq"),                  // <= 6 edits from 1
      (3L, "a completely different sentence about boats and rivers"),
      (4L, "tiny"))                                  // below q*(k+1) = 21
      .toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text",
        maxEdits = 6, q = 3)
      .as[(Long, Long, Int)].collect().toSeq.sortBy(p => (p._1, p._2))
    assert(got.map(p => (p._1, p._2)) == Seq((1L, 2L)))
    assert(got.head._3 <= 6 && got.head._3 >= 1)
    // identical docs pair at distance 0
    val dup = Seq((1L, a), (2L, a)).toDF("doc_id", "text")
    val d = Dedup.editDistancePairs(dup, "doc_id", "text", maxEdits = 2)
      .as[(Long, Long, Int)].collect().toSeq
    assert(d == Seq((1L, 2L, 0)))
  }

  test("differential completeness: == naive all-pairs Levenshtein on " +
      "random corpora with planted edits") {
    val rnd = new scala.util.Random(31)
    def randStr(n: Int) =
      (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    def edit(s: String): String = {
      val i = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.updated(i, ('a' + rnd.nextInt(26)).toChar) // sub
        case 1 => s.take(i) + ('a' + rnd.nextInt(26)).toChar + s.drop(i)
        case 2 => s.take(i) + s.drop(i + 1)
      }
    }
    for (trial <- 1 to 3) {
      val bases = (0 until 12).map(_ => randStr(25 + rnd.nextInt(30)))
      // derivatives at 0..8 edits: some inside the k=5 band, some out
      val all = bases ++ bases.flatMap { b =>
        (0 until rnd.nextInt(3)).map { _ =>
          (0 until rnd.nextInt(9)).foldLeft(b)((s, _) => edit(s))
        }
      }
      val df = all.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val k = 5
      val got = Dedup.editDistancePairs(df, "doc_id", "text",
          maxEdits = k, q = 3)
        .as[(Long, Long, Int)].collect().toSet
      // naive model through the independent 2-arg builtin, full cross
      val f = df.filter(length(col("text")) >= 3 * (k + 1))
      val want = f.as("a").crossJoin(f.as("b"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id"), col("b.doc_id"),
          levenshtein(col("a.text"), col("b.text")).as("ed"))
        .filter(col("ed") <= k)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("posting volume is the bounded prefix: k*q+1 rows per doc") {
    // plan-shape proxy: candidates for disjoint strings are empty even
    // though lengths match (no shared gram in any prefix)
    val docs = Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      (2L, "bbbbbbbbbbbbbbbbbbbbbbbbbbbbbb"))
      .toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text", maxEdits = 3)
    assert(got.count() == 0)
  }
}
