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

  /** Textbook Wagner–Fischer DP — a from-scratch model sharing NO code
    * with the operator or the builtin. */
  private def scalaLev(a: String, b: String): Int = {
    val prev = Array.tabulate(b.length + 1)(identity)
    val cur = new Array[Int](b.length + 1)
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
      }
      Array.copy(cur, 0, prev, 0, cur.length)
    }
    prev(b.length)
  }

  test("differential completeness: == from-scratch all-pairs DP model " +
      "on random corpora with planted edits and exact-dup clusters") {
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
    for (trial <- 1 to 12) {
      val bases = (0 until 12).map(_ => randStr(25 + rnd.nextInt(30)))
      // derivatives at 0..8 edits (some in the k=5 band, some out) plus
      // verbatim copies — the exact-text collapse path must still emit
      // every member pair
      val all = bases ++ bases.flatMap { b =>
        (0 until rnd.nextInt(4)).map { _ =>
          (0 until rnd.nextInt(9)).foldLeft(b)((s, _) => edit(s))
        }
      } ++ bases.take(rnd.nextInt(3))
      val df = all.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val k = 5
      val got = Dedup.editDistancePairs(df, "doc_id", "text",
          maxEdits = k, q = 3)
        .as[(Long, Long, Int)].collect().toSet
      // from-scratch model: full cross product through the Scala DP
      val kept = all.zipWithIndex.collect {
        case (t, i) if t.length >= 3 * (k + 1) => (i.toLong, t)
      }
      val want = (for {
        (ia, ta) <- kept; (ib, tb) <- kept if ia < ib
        d = scalaLev(ta, tb) if d <= k
      } yield (ia, ib, d)).toSet
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
