package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Sampling

/** Deterministic shard assignment (Sampling.shardByHash): position/order
  * correctness against an independently recomputed priority, balance,
  * partition-independence, and seed behavior. */
class ShardingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "lang")

  private def assigned = Sampling.shardByHash(docs, "doc_id", 8)
    .select("doc_id", "shard", "pos")

  test("per-shard positions are a 1..n dense sequence in hash order") {
    val rows = assigned.as[(Long, Int, Long)].collect()
    // recompute the priority independently and check pos == rank by
    // (md5(id:42), id) within each shard
    val pri = docs.select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":42")).cast("binary"))
          .as("pri"))
      .as[(Long, String)].collect().toMap
    rows.groupBy(_._2).foreach { case (shard, members) =>
      val byPos = members.sortBy(_._3)
      assert(byPos.map(_._3).toSeq == (1L to members.length).toSeq,
        s"shard $shard positions are not dense 1..n")
      val expectedOrder = members.map(_._1).sortBy(id => (pri(id), id)).toSeq
      assert(byPos.map(_._1).toSeq == expectedOrder,
        s"shard $shard positions disagree with hash order")
    }
  }

  test("shards are balanced and cover all rows exactly once") {
    val sizes = assigned.groupBy("shard").count()
      .as[(Int, Long)].collect().toMap
    assert(sizes.keySet == (0 until 8).toSet, s"missing shards: $sizes")
    assert(sizes.values.sum == docs.count())
    val (mx, mn) = (sizes.values.max, sizes.values.min)
    assert(mx <= 2 * mn, s"shards badly unbalanced: $sizes")
    assert(assigned.select("doc_id").distinct().count() == docs.count())
  }

  test("partition-independent and rerun-stable; a different seed reshuffles") {
    val base = assigned.as[(Long, Int, Long)].collect().toSet
    val repartitioned = Sampling.shardByHash(docs.repartition(13), "doc_id", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    assert(base == repartitioned,
      "shard assignment changed under a different input partitioning")
    val reseeded = Sampling.shardByHash(docs, "doc_id", 8, seed = "43")
      .select("doc_id", "shard", "pos").as[(Long, Int, Long)].collect().toSet
    assert(base != reseeded,
      "different seeds produced an identical reshuffle (astronomically unlikely)")
  }

  test("writeShards round-trip: one file per shard, pos-ordered, complete") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toFile
    dir.deleteOnExit()
    val out = dir.getAbsolutePath
    val sharded = Sampling.writeShards(docs, "doc_id", 8, out)
    val expect = sharded.select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().toSet

    // layout: a shard=N directory per shard, exactly ONE data file each —
    // the plan's one-task-per-shard claim made observable on disk
    val shardDirs = dir.listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.map(_.getName).sorted.toSeq ==
      (0 until 8).map(i => s"shard=$i"))
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName} has ${files.length} files")
    }

    // completeness: the re-read equals the assigned frame value-for-value
    val back = spark.read.parquet(out)
    assert(back.select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().toSet == expect)

    // within-file order IS pos order: read each shard's single file alone
    // (one file, one partition -> collect preserves parquet row order)
    (0 until 8).foreach { s =>
      val pos = spark.read.parquet(s"$out/shard=$s")
        .select("pos").as[Long].collect().toSeq
      assert(pos == pos.sorted && pos == (1L to pos.length).toSeq,
        s"shard $s file rows not in dense pos order")
    }

    // the write adds no exchange beyond the assignment's own: the sort
    // before the writer is WITHIN partitions (no rangepartitioning)
    val plan = sharded.sortWithinPartitions(col("shard"), col("pos"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange rangepartitioning"),
      s"writer path must not global-sort:\n$plan")
    assert(plan.split("Exchange").length - 1 == 1,
      s"writer path must reuse the single shard exchange:\n$plan")
  }

  test("weightedSample: inclusion tracks weight, deterministic, excludes w <= 0") {
    // 500 groups, each {one weight-50 row, one weight-1 row, one w=0 row,
    // one null-w row}; k=1. E-S: P(heavy wins) = 50/51 ≈ 0.98 over many
    // independent groups — and the zero/null rows can never be drawn.
    val rows = (0 until 500).flatMap { g =>
      Seq((g * 10L + 0, g, Some(50.0)), (g * 10L + 1, g, Some(1.0)),
        (g * 10L + 2, g, Some(0.0)), (g * 10L + 3, g, None))
    }
    val df = rows.toDF("id", "grp", "w")
    val picked = Sampling.weightedSample(df, "id", "w", Seq("grp"), 1)
      .select("id").as[Long].collect().toSet
    assert(picked.size == 500) // one winner per group
    assert(picked.forall(id => id % 10 <= 1), "a non-positive-weight row won")
    val heavyShare = picked.count(_ % 10 == 0) / 500.0
    assert(heavyShare > 0.93 && heavyShare <= 1.0,
      s"heavy-row share $heavyShare far from E-S expectation ~0.98")
    // deterministic replay; a different seed redraws
    val again = Sampling.weightedSample(df, "id", "w", Seq("grp"), 1)
      .select("id").as[Long].collect().toSet
    assert(again == picked)
    val reseeded = Sampling.weightedSample(df, "id", "w", Seq("grp"), 1,
        seed = "7")
      .select("id").as[Long].collect().toSet
    assert(reseeded != picked)
  }

  test("plan: one hash exchange on the shard, no global sort") {
    val df = assigned
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning(shard"),
      s"shard window lost its hash exchange:\n$plan")
    // the only range exchange allowed is none — a global sort would mean
    // the reshuffle stopped being per-shard
    assert(!plan.contains("Exchange rangepartitioning"),
      s"unexpected global sort in shard assignment:\n$plan")
  }
}
