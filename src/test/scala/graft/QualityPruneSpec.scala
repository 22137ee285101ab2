package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.TextAnalysis

/** Quality-percentile pruning strategies (TextAnalysis.pruneBottomQuantile
  * / pruneBottomQuantileKeep): value identity between the rescore and
  * join text-retention strategies, consistency with the metadata-only
  * prune, and each strategy's plan posture. */
class QualityPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "lang", "text")

  test("rescore and join strategies keep identical rows, text included") {
    val a = TextAnalysis.pruneBottomQuantileKeep(docs, "text", 0.25, "doc_id")
      .orderBy("doc_id").as[(Long, String, String, Double)].collect().toSeq
    val b = TextAnalysis.pruneBottomQuantileKeep(docs, "text", 0.25, "doc_id",
      strategy = "join")
      .orderBy("doc_id").as[(Long, String, String, Double)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty && a.size < docs.count())
  }

  test("kept ids == the metadata-only prune's ids") {
    val keep = TextAnalysis.pruneBottomQuantileKeep(docs, "text", 0.25, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    val meta = TextAnalysis.pruneBottomQuantile(docs, "text", 0.25,
      Seq("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(keep == meta)
  }

  test("materialize=false (declarative bench posture) == materialize=true " +
      "(checkpointed), row for row") {
    val a = TextAnalysis.pruneBottomQuantile(docs, "text", 0.25,
        Seq("doc_id", "lang"))
      .orderBy("doc_id").as[(Long, String, Double)].collect().toSeq
    val b = TextAnalysis.pruneBottomQuantile(docs, "text", 0.25,
        Seq("doc_id", "lang"), materialize = false)
      .orderBy("doc_id").as[(Long, String, Double)].collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("rescore strategy: the corpus never shuffles (no Exchange outside " +
      "the threshold subquery)") {
    val df = TextAnalysis.pruneBottomQuantileKeep(docs, "text", 0.25, "doc_id")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the main tree is scan -> score -> filter; the threshold subquery
    // (inlined in the tree string under AQE) may merge its partial
    // percentile buffers through a one-row-per-partition SinglePartition
    // exchange, but NO hash/range exchange — the shapes a corpus
    // repartition would take — may appear anywhere
    assert(!plan.contains("Exchange hashpartitioning")
        && !plan.contains("Exchange rangepartitioning"),
      s"rescore strategy leaked a corpus shuffle:\n$plan")
    assert(plan.contains("Subquery subquery"),
      s"rescore threshold is no longer a scalar subquery:\n$plan")
  }

  test("join strategy: one scoring pass (the checkpointed frame), none in " +
      "the final plan") {
    val df = TextAnalysis.pruneBottomQuantileKeep(docs, "text", 0.25, "doc_id",
      strategy = "join")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // scoring lives once inside the checkpointed lineage: the final plan
    // joins the corpus to a materialized RDD and contains no scoring
    // expression
    assert(!plan.contains("regexp_count"),
      s"join strategy re-scores the corpus:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"join strategy lost its materialized score frame:\n$plan")
  }

  test("unknown strategy is rejected") {
    val e = intercept[IllegalArgumentException](
      TextAnalysis.pruneBottomQuantileKeep(docs, "text", 0.25, "doc_id",
        strategy = "bloom"))
    assert(e.getMessage.contains("rescore"))
  }

  test("per-group prune == per-group driver model; single group == " +
      "the global prune") {
    val full = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = TextAnalysis.pruneBottomQuantilePerGroup(
        full, "text", 0.25, "source", Seq("doc_id", "lang"))
      .select("doc_id").as[Long].collect().toSet
    // driver model: exact interpolated percentile per source over the
    // same scores the operator computes
    val scores = TextAnalysis.qualityFeatures(full, "text")
      .select(col("doc_id"), col("source"), col("quality_score"))
      .as[(Long, String, Double)].collect()
    def pct(xs: Seq[Double], q: Double): Double = {
      val s = xs.sorted
      val pos = q * (s.size - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      if (lo == hi) s(lo) else s(lo) + (pos - lo) * (s(hi) - s(lo))
    }
    val want = scores.groupBy(_._2).values.toSeq.flatMap { rows =>
      val thr = pct(rows.map(_._3).toSeq, 0.25)
      rows.filter(_._3 >= thr).map(_._1).toSeq
    }.toSet
    assert(got == want && got.nonEmpty)
    // one constant group degenerates to the global prune
    val one = TextAnalysis.pruneBottomQuantilePerGroup(
        full.withColumn("g", lit("all")), "text", 0.25, "g",
        Seq("doc_id", "lang"))
      .select("doc_id").as[Long].collect().toSet
    val global = TextAnalysis.pruneBottomQuantile(
        full, "text", 0.25, Seq("doc_id", "lang"))
      .select("doc_id").as[Long].collect().toSet
    assert(one == global)
  }
}
