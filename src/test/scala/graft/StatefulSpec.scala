package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulOps

class StatefulSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("flatMapGroupsWithState running mean accumulates across micro-batches") {
    val dir = Files.createTempDirectory("graft-stateful").toFile
    dir.deleteOnExit()
    Seq(("a", 2.0), ("a", 4.0), ("b", 10.0))
      .toDF("itemId", "value")
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val schema = StructType(Seq(
      StructField("itemId", StringType), StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
      .as[StatefulOps.Obs]
    val q = StatefulOps.runningMean(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("graft_running").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT itemId, n, total, mean FROM graft_running ORDER BY itemId")
        .as[(String, Long, Double, Double)].collect().toSeq
      assert(got == Seq(("a", 2L, 6.0, 3.0), ("b", 1L, 10.0, 10.0)))
    } finally q.stop()
  }

  test("transformWithState running mean matches the fMGWS form (RocksDB store)") {
    val dir = Files.createTempDirectory("graft-tws").toFile
    dir.deleteOnExit()
    Seq(("a", 2.0), ("a", 4.0), ("b", 10.0))
      .toDF("itemId", "value")
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val schema = StructType(Seq(
      StructField("itemId", StringType), StructField("value", DoubleType)))
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
        .as[StatefulOps.Obs]
      val q = StatefulOps.runningMeanTws(stream)
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_running_tws").start()
      try {
        q.processAllAvailable()
        val got = spark.sql(
          "SELECT itemId, n, total, mean FROM graft_running_tws ORDER BY itemId")
          .as[(String, Long, Double, Double)].collect().toSeq
        assert(got == Seq(("a", 2L, 6.0, 3.0), ("b", 1L, 10.0, 10.0)))
      } finally q.stop()
    } finally prev match {
      case Some(v) =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None =>
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("GraftExtensions injects native functions at session build time") {
    // the shared session wasn't built with the extension; apply it manually
    // through the registry path and confirm SQL-level resolution
    graft.functions.VectorFunctions.register(spark)
    val d = spark.sql(
      "SELECT fvec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .as[Double].head()
    assert(d == 11.0)
  }
}
