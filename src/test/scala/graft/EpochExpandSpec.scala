package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

/** Deterministic epoch upsampling (Sampling.epochExpand): exactness
  * against an independent JVM-md5 model, recipe semantics (floor copies +
  * hash-gated fractional extra), determinism across repartition, and the
  * guards. */
class EpochExpandSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent replay: first 8 md5 hex digits of "id:seed" over 2^32. */
  private def uniform(id: Long, seed: String): Double = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$id:$seed".getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(8)
    java.lang.Long.parseLong(hex, 16).toDouble / 4294967296.0
  }

  private def modelCopies(id: Long, w: Double, seed: String): Long =
    math.floor(w).toLong +
      (if (uniform(id, seed) < w - math.floor(w)) 1L else 0L)

  private val weights = Seq("a" -> 0.0, "b" -> 0.5, "c" -> 2.5, "d" -> 3.0)

  private def docs = (0L until 200L).map { i =>
    (i, Seq("a", "b", "c", "d", "e")(((i % 5).toInt)))
  }

  test("op == md5 model for every row (floor copies + gated fractional)") {
    val got = Sampling.epochExpand(docs.toDF("doc_id", "source"),
        "doc_id", "source", weights, defaultEpochs = 1.0, seed = "s13")
      .select(col("doc_id"), col("source"), col("epoch"))
      .as[(Long, String, Long)].collect().toSeq.sorted
    val wMap = weights.toMap
    val want = docs.flatMap { case (id, src) =>
      val n = modelCopies(id, wMap.getOrElse(src, 1.0), "s13")
      (1L to n).map(e => (id, src, e))
    }.sorted
    assert(got == want)
    // the fixture really exercises both branches of the fractional gate
    val bCopies = want.filter(_._2 == "b").groupBy(_._1).map(_._2.size).toSet
    assert(bCopies == Set(1), "w=0.5 rows appear exactly once when kept")
    assert(want.count(_._2 == "b") > 0 &&
      want.count(_._2 == "b") < docs.count(_._2 == "b"),
      "w=0.5 must keep a strict subset")
    val cCounts = want.filter(_._2 == "c").groupBy(_._1).map(_._2.size).toSet
    assert(cCounts == Set(2, 3), "w=2.5 rows appear 2 or 3 times")
    assert(!want.exists(_._2 == "a"), "w=0 drops the source")
    assert(want.filter(_._2 == "e").groupBy(_._1).forall(_._2.size == 1),
      "default weight 1.0 passes through")
  }

  test("partition-layout independence") {
    val base = docs.toDF("doc_id", "source")
    val a = Sampling.epochExpand(base, "doc_id", "source", weights)
      .select("doc_id", "epoch").as[(Long, Long)].collect().toSeq.sorted
    val b = Sampling.epochExpand(base.repartition(7), "doc_id", "source",
        weights)
      .select("doc_id", "epoch").as[(Long, Long)].collect().toSeq.sorted
    assert(a == b)
  }

  test("guards: weight range and reserved output column") {
    val df = docs.take(3).toDF("doc_id", "source")
    intercept[IllegalArgumentException] {
      Sampling.epochExpand(df, "doc_id", "source", Seq("a" -> -0.1))
    }
    intercept[IllegalArgumentException] {
      Sampling.epochExpand(df.withColumn("epoch", lit(1)), "doc_id",
        "source", weights)
    }
  }
}
