package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ForecastPrep
import graft.sources.Tables

class ForecastPrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AutoGluon transform: F-5 golden (tests/test_univariate_metrics.py:52-87)") {
    val df = Seq(
      (1, "2020-01-04", Some(1.0), 0L),
      (1, "2020-01-04", Some(1.0), 1L), // duplicate index row -> dropped
      (1, "2020-01-06", Some(2.0), 2L),
      (2, "2020-01-04", Some(3.0), 3L),
      (2, "2020-01-06", None, 4L))     // null -> 0.0
      .toDF("item_ids", "timestamps", "metric", "src")
      .withColumn("timestamps", to_timestamp(col("timestamps")))
    val got = ForecastPrep.autoGluonTransform(df, "item_ids", "timestamps", "metric", "src")
      .orderBy("item_id", "timestamp")
    assert(got.count() == 6) // 2 items x 3 calendar days (gap 01-05 created)
    assert(got.select("target").as[Double].collect().toSeq
      == Seq(1.0, 0.0, 2.0, 3.0, 0.0, 0.0))
    assert(got.select("is_weekend").as[Double].collect().toSeq
      == Seq(1.0, 1.0, 0.0, 1.0, 1.0, 0.0)) // Jan 4/5 2020 = Sat/Sun
  }

  test("drop items without inferable frequency (univariate_metrics.py:81-95)") {
    val df = Seq((1, "2020-01-01"), (1, "2020-01-02"), (2, "2020-01-01"))
      .toDF("item", "ts")
    val kept = ForecastPrep.dropItemsWithoutFrequency(df, "item", "ts")
      .select("item").distinct().as[Int].collect().toSeq
    assert(kept == Seq(1)) // item 2 has a single observation
  }

  test("synthcity sequence bundle: F-6 golden (test_synthcity_adapter.py:257-304)") {
    val df = Seq(
      ("B7C3B9", "01/02/2024", Some(4.520580), 0L),
      ("B7C3B9", "02/02/2024", Some(3.345429), 1L),
      ("B7C3B9", "03/02/2024", Some(4.223980), 2L),
      ("B7C3B9", "04/02/2024", None, 3L),
      ("C02981", "01/02/2024", Some(4.774060), 4L),
      ("C02981", "02/02/2024", Some(5.311364), 5L),
      ("C02981", "03/02/2024", Some(4.360277), 6L),
      ("C02981", "04/02/2024", Some(0.0), 7L))
      .toDF("id", "time_point", "temp_b", "src")
      .withColumn("ts", to_timestamp(col("time_point"), "dd/MM/yyyy"))
    val b = ForecastPrep.sequenceBundle(
      df, Seq("id"), "ts", Seq("temp_b"), Nil, "src")
    assert(b.static.count() == 2) // A1: two distinct entities
    assert(b.outcome.select("outcome").as[Int].collect().toSeq == Seq(0, 0))
    val firstSeq = b.temporal.filter(col("surrogate_item_id") === 0)
      .orderBy("ts").select("temp_b").as[Double].collect().toSeq
    assert(firstSeq == Seq(4.520580, 3.345429, 4.223980, 0.0)) // P6 null -> 0
  }

  test("bucketed tables join without a shuffle exchange") {
    // in-memory catalog forgets tables across JVMs but their warehouse
    // directories persist — clear both before writing
    Seq("graft_bucket_a", "graft_bucket_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    val a = (0L until 200L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (0L until 200L).map(i => (i, i * 2.0)).toDF("k", "vb")
    Tables.writeBucketed(a, "graft_bucket_a", Seq("k"), 4)
    Tables.writeBucketed(b, "graft_bucket_b", Seq("k"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucket_a").join(spark.table("graft_bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(joined.count() == 200)
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
