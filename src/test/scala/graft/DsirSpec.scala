package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Dsir

/** DSIR importance resampling ([[graft.ext.Dsir]], Xie et al. 2023):
  * kernel bucketing ≡ Spark's own SQL md5 replay, model-fit arithmetic,
  * map-only scoring ≡ explode+join recompute, Gumbel top-k determinism. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Buckets = 64

  private val docs = Seq(
    (0L, "the cat sat on the mat"),
    (1L, "the dog  ran"), // double space: empty token must be skipped
    (2L, "cats and dogs and cats"),
    (3L, ""),
    (4L, "one"))
    .toDF("doc_id", "text")

  /** Multiset grams (orders 1..2 over non-empty tokens) + the portable
    * bucket, recomputed with SPARK SQL built-ins — an independent code
    * path from the kernel's MessageDigest walk. */
  private def sqlBuckets = {
    val withToks = docs.withColumn("toks",
      filter(split(col("text"), "\\s+"), x => x =!= lit("")))
    val toks = col("toks")
    val bis = when(size(toks) >= 2,
        transform(sequence(lit(1), size(toks) - 1), i =>
          concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    withToks.select(col("doc_id"),
        explode(concat(toks, bis)).as("gram"))
      .select(col("doc_id"),
        (conv(substring(md5(col("gram").cast("binary")), 1, 8), 16, 10)
          .cast("long") % Buckets).cast("int").as("b"))
  }

  test("HashedGramBuckets == SQL md5-prefix replay (multiset, orders 1..2)") {
    import org.apache.spark.sql.GraftColumnBridge
    val kernel = docs.select(col("doc_id"),
        explode(GraftColumnBridge.column(graft.functions.HashedGramBuckets(
          GraftColumnBridge.expression(col("text")), 2, Buckets))).as("b"))
      .groupBy("doc_id", "b").count()
      .as[(Long, Int, Long)].collect().toSet
    val sql = sqlBuckets.groupBy("doc_id", "b").count()
      .as[(Long, Int, Long)].collect().toSet
    assert(kernel == sql)
    // gram arithmetic: doc 0 has 6 tokens → 6 + 5 = 11 grams; doc 1's
    // empty token is skipped (3 tokens → 5 grams); doc 3 none; doc 4 one
    val perDoc = kernel.toSeq.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    assert(perDoc == Map(0L -> 11L, 1L -> 5L, 2L -> 9L, 4L -> 1L))
  }

  test("fitHashedModel: add-α probabilities over the bucket counts") {
    val m = Dsir.fitHashedModel(docs, "text", buckets = Buckets, maxN = 2)
    val counts = sqlBuckets.groupBy("b").count()
      .as[(Int, Long)].collect().toMap
    val total = counts.values.sum
    assert(m.totalGrams == total)
    (0 until Buckets).foreach { b =>
      val want = math.log((counts.getOrElse(b, 0L) + 1.0) / (total + Buckets))
      assert(math.abs(m.logProbs(b) - want) < 1e-12, s"bucket $b")
    }
  }

  test("importanceWeights == explode + ratio-table join recompute; map-only") {
    val target = docs.filter(col("doc_id") < 2)
    val tm = Dsir.fitHashedModel(target, "text", buckets = Buckets, maxN = 2)
    val rm = Dsir.fitHashedModel(docs, "text", buckets = Buckets, maxN = 2)
    val got = Dsir.importanceWeights(docs, "text", tm, rm)
      .select(col("doc_id"), col("log_weight"), col("n_feat"))
      .as[(Long, Double, Int)].collect()
      .map { case (k, v, n) => (k, (v, n)) }.toMap
    val ratio = (0 until Buckets).map(b => tm.logProbs(b) - rm.logProbs(b))
    val want = sqlBuckets.as[(Long, Int)].collect()
      .groupBy(_._1).view
      .mapValues(bs => (
        BigDecimal(bs.map(p => ratio(p._2)).sum)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        bs.length))
      .toMap
    docs.select("doc_id").as[Long].collect().foreach { id =>
      val (wLam, wN) = want.getOrElse(id, (0.0, 0))
      val (gLam, gN) = got(id)
      assert(gN == wN, s"doc $id n_feat")
      if (wN > 0) assert(math.abs(gLam - wLam) < 1e-9, s"doc $id λ")
    }
    // scale contract: scoring is one kernel eval per row — no exchange
    val plan = Dsir.importanceWeights(docs, "text", tm, rm)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"importanceWeights grew an exchange:\n$plan")
  }

  test("resample: deterministic Gumbel top-k, k bound, zero-gram docs " +
      "excluded, reseed reshuffles") {
    val target = docs.filter(col("doc_id") === 2)
    val tm = Dsir.fitHashedModel(target, "text", buckets = Buckets, maxN = 2)
    val rm = Dsir.fitHashedModel(docs, "text", buckets = Buckets, maxN = 2)
    val a = Dsir.resample(docs, "doc_id", "text", tm, rm, k = 3)
      .select("doc_id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    val b = Dsir.resample(docs, "doc_id", "text", tm, rm, k = 3)
      .select("doc_id", "rank").as[(Long, Int)].collect().toSeq.sortBy(_._2)
    assert(a == b)             // deterministic
    assert(a.length == 3)
    assert(a.map(_._2) == Seq(1, 2, 3))
    assert(!a.map(_._1).contains(3L)) // empty doc has no grams
    // a large-k draw keeps every gram-bearing doc exactly once
    val all = Dsir.resample(docs, "doc_id", "text", tm, rm, k = 100)
      .select("doc_id").as[Long].collect().toSeq
    assert(all.sorted == Seq(0L, 1L, 2L, 4L))
    // reseeding is an independent draw: keys change
    val k1 = Dsir.resample(docs, "doc_id", "text", tm, rm, k = 100)
      .select("doc_id", "sample_key").as[(Long, Double)].collect().toMap
    val k2 = Dsir.resample(docs, "doc_id", "text", tm, rm, k = 100,
        seed = "7").select("doc_id", "sample_key")
      .as[(Long, Double)].collect().toMap
    assert(k1.keySet == k2.keySet && k1 != k2)
  }

  test("resample honors groupCols and mismatched models are rejected") {
    val withG = docs.withColumn("g", (col("doc_id") % 2).cast("int"))
    val tm = Dsir.fitHashedModel(docs, "text", buckets = Buckets, maxN = 2)
    val got = Dsir.resample(withG, "doc_id", "text", tm, tm, k = 1,
        groupCols = Seq("g"))
      .select("g", "doc_id").as[(Int, Long)].collect().toSeq
    assert(got.map(_._1).sorted == Seq(0, 1)) // one winner per group
    val other = Dsir.fitHashedModel(docs, "text", buckets = 32, maxN = 2)
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(docs, "text", tm, other)
    }
    // reserved output names are rejected loudly, not clobbered
    intercept[IllegalArgumentException] {
      Dsir.importanceWeights(
        docs.withColumn("log_weight", lit(0.0)), "text", tm, tm)
    }
  }

  test("editDistancePairs rejects id/text names colliding with its " +
      "internals") {
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("id_a", "text")
    intercept[IllegalArgumentException] {
      graft.ext.Dedup.editDistancePairs(df, "id_a", "text", maxEdits = 2)
    }
  }
}
