package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Packing

/** Fixed-length training-sequence assembly (Packing.packSequences):
  * fixture exactness, a from-scratch sequential model fuzz (the op's
  * distributed prefix-sum/straddle/reassembly vs literally concatenating
  * each shard's stream and chunking it), null/empty/degenerate inputs,
  * and the guard rails. */
class PackSequencesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val EOS = 999L

  /** The semantics, stated sequentially: per shard, concatenate
    * (ids ++ EOS) in order, chunk by L; n_docs counts docs overlapping
    * the chunk; doc_starts are the in-chunk offsets of doc beginnings. */
  private def model(
      docs: Seq[(Long, Option[Seq[Long]])], nShards: Int, l: Int,
      drop: Boolean): Seq[(Long, Long, Seq[Long], Long, Seq[Long], Long)] =
    docs.groupBy { case (ord, _) => ord % nShards }.toSeq.flatMap {
      case (shard, ds) =>
        val sorted = ds.sortBy(_._1)
        val withEos = sorted.map { case (ord, ids) =>
          (ord, ids.getOrElse(Seq.empty) :+ EOS)
        }
        val offs = withEos.scanLeft(0L)(_ + _._2.length.toLong)
        val stream = withEos.flatMap(_._2)
        val spans = withEos.zip(offs).map { case ((_, ids), off) =>
          (off, off + ids.length) // [off, end)
        }
        stream.grouped(l).toSeq.zipWithIndex.flatMap { case (chunk, s) =>
          if (drop && chunk.length < l) None
          else {
            val lo = s.toLong * l
            val hi = lo + chunk.length
            val nDocs = spans.count { case (a, b) => a < hi && b > lo }
            val starts = spans.collect {
              case (a, _) if a >= lo && a < hi => a - lo
            }.sorted
            Some((shard, s.toLong, chunk.toSeq, nDocs.toLong, starts,
              chunk.length.toLong))
          }
        }
    }

  private def run(
      docs: Seq[(Long, Option[Seq[Long]])], nShards: Int, l: Int,
      drop: Boolean): Seq[(Long, Long, Seq[Long], Long, Seq[Long], Long)] = {
    val df = docs.toDF("ord", "tok_ids")
    Packing.packSequences(df, "tok_ids", pmod(col("ord"), lit(nShards.toLong)),
        "ord", l, EOS, dropRemainder = drop)
      .select(col("shard"), col("seq_idx"), col("ids"), col("n_docs"),
        col("doc_starts"), col("n_tokens"))
      .as[(Long, Long, Seq[Long], Long, Seq[Long], Long)].collect().toSeq
  }

  test("fixture: docs straddle window boundaries exactly") {
    // one shard, L=4: [1,2,3]+EOS | [4]+EOS | []+EOS
    // stream = 1,2,3,E,4,E,E → windows [1,2,3,E], [4,E,E] (short)
    val docs = Seq(
      (0L, Some(Seq(1L, 2L, 3L))), (3L, Some(Seq(4L))),
      (6L, Some(Seq.empty[Long])))
    val full = run(docs, 1, 4, drop = false).sortBy(r => (r._1, r._2))
    assert(full == Seq(
      (0L, 0L, Seq(1L, 2L, 3L, EOS), 1L, Seq(0L), 4L),
      (0L, 1L, Seq(4L, EOS, EOS), 2L, Seq(0L, 2L), 3L)))
    val dropped = run(docs, 1, 4, drop = true)
    assert(dropped == Seq((0L, 0L, Seq(1L, 2L, 3L, EOS), 1L, Seq(0L), 4L)))
  }

  test("fixture: one doc spans many windows") {
    val docs = Seq((0L, Some((1L to 10L).toSeq)))
    val got = run(docs, 1, 3, drop = false).sortBy(_._2)
    assert(got.map(_._3) == Seq(
      Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(7L, 8L, 9L), Seq(10L, EOS)))
    assert(got.map(_._4) == Seq(1L, 1L, 1L, 1L))
    // the doc starts in window 0 only; continuations have no reset point
    assert(got.map(_._5) == Seq(Seq(0L), Seq(), Seq(), Seq()))
  }

  test("null ids contribute exactly the EOS separator") {
    val docs = Seq((0L, None: Option[Seq[Long]]), (1L, Some(Seq(7L))))
    val got = run(docs, 1, 4, drop = false)
    assert(got == Seq((0L, 0L, Seq(EOS, 7L, EOS), 2L, Seq(0L, 1L), 3L)))
  }

  test("fuzz: op == sequential concat-and-chunk model (60 cases)") {
    val rnd = new scala.util.Random(20260815L)
    (1 to 60).foreach { k =>
      val n = rnd.nextInt(40)
      val docs = (0 until n).map { i =>
        val ids =
          if (rnd.nextInt(12) == 0) None
          else Some(Seq.fill(rnd.nextInt(30))(rnd.nextInt(500).toLong))
        (i.toLong, ids)
      }
      val nShards = 1 + rnd.nextInt(3)
      val l = Seq(4, 8, 16)(rnd.nextInt(3))
      val drop = rnd.nextBoolean()
      val got = run(docs, nShards, l, drop).sortBy(r => (r._1, r._2))
      val want = model(docs, nShards, l, drop).sortBy(r => (r._1, r._2))
      assert(got == want, s"case $k: n=$n shards=$nShards L=$l drop=$drop")
    }
  }

  test("guards: seqLen and reserved names") {
    val df = Seq((0L, Seq(1L))).toDF("ord", "tok_ids")
    intercept[IllegalArgumentException] {
      Packing.packSequences(df, "tok_ids", lit(0), "ord", 0, EOS)
    }
    intercept[IllegalArgumentException] {
      Packing.packSequences(df.withColumnRenamed("tok_ids", "ids"), "ids",
        lit(0), "ord", 4, EOS)
    }
  }
}
