package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Par

/** [[graft.ops.Par.fanOutSmallScan]] trigger discipline (round-13 advice):
  * the round-robin exchange may fire ONLY for plain file-scan inputs whose
  * ACTUAL file bytes fit one scan partition — never for derived frames
  * whose optimizer estimate undershoots, and never past the byte budget.
  */
class ParSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpParquet(name: String, n: Int): String = {
    val path = new java.io.File(s"target/par-spec/$name").getAbsolutePath
    (0 until n).map(i => (i.toLong, s"doc $i text payload"))
      .toDF("id", "text").coalesce(1)
      .write.mode("overwrite").parquet(path)
    path
  }

  test("plain small parquet scan fans out to defaultParallelism") {
    val df = spark.read.parquet(tmpParquet("small", 200))
    val out = Par.fanOutSmallScan(df)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.count() == 200)
  }

  test("Project/Filter chain over a small scan still fans out") {
    val df = spark.read.parquet(tmpParquet("chain", 100))
      .filter(col("id") < 50).select(col("id"), col("text"))
    val out = Par.fanOutSmallScan(df)
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.count() == 50)
  }

  test("derived (joined/aggregated) inputs are identity even when the " +
      "optimizer estimate is tiny") {
    val a = spark.read.parquet(tmpParquet("join-a", 100))
    val b = spark.read.parquet(tmpParquet("join-b", 100))
    val joined = a.join(b.withColumnRenamed("text", "t2"), "id")
    assert(Par.fanOutSmallScan(joined) eq joined)
    val agged = a.groupBy(col("id") % 7 as "g").agg(count(lit(1)).as("n"))
    assert(Par.fanOutSmallScan(agged) eq agged)
    // RDD-backed (checkpoint-class) inputs: estimate untrusted -> identity
    val rddBacked = spark.createDataFrame(
      a.select("id", "text").rdd, a.select("id", "text").schema)
    assert(Par.fanOutSmallScan(rddBacked) eq rddBacked)
  }

  test("a file-scan past the one-partition byte budget is identity") {
    val path = tmpParquet("big", 5000)
    val before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      val df = spark.read.parquet(path)
      assert(Par.fanOutSmallScan(df) eq df)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", before)
  }

  test("streaming frames are identity (probing a stream's batch plan throws)") {
    val dir = tmpParquet("stream", 10)
    val schema = spark.read.parquet(dir).schema
    val df = spark.readStream.schema(schema).parquet(dir)
    assert(Par.fanOutSmallScan(df) eq df)
  }

  test("the probe executes nothing driver-side (analysis only, round-19)") {
    // probing the OPTIMIZED plan used to run ConvertToLocalRelation, which
    // eagerly evaluates Project/Filter over a LocalRelation on the driver —
    // a UDF filter ticked once per row at probe time (the phantom "second
    // corpus scan" UnigramLmSpec's counting filter caught). The analyzed-
    // plan probe must evaluate nothing.
    val acc = spark.sparkContext.longAccumulator("probe-ticks")
    val tick = udf { (_: String) => { acc.add(1); true } }
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
      .filter(tick(col("text")))
    val out = Par.fanOutSmallScan(df) // probe + (possibly) a fan-out; no action
    assert(acc.value == 0,
      s"the probe evaluated the filter ${acc.value} times driver-side")
    assert(out.count() == 3) // the plan itself still executes correctly once
    assert(acc.value == 3)
  }

  test("serving-cache base is keyed by source content, not path hash") {
    val dir = new java.io.File("target/par-spec/servedir")
    dir.mkdirs()
    val tbl = s"${dir.getAbsolutePath}/documents.parquet"
    Seq((1L, "a")).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(tbl)
    val base1 = SparkEntry.servingBase(spark, dir.getAbsolutePath, "documents")
    val base1again = SparkEntry.servingBase(spark, dir.getAbsolutePath, "documents")
    assert(base1 == base1again) // stable while the data is unchanged
    // regenerate the table at the SAME path: fingerprint must move so the
    // serve queries rebuild instead of silently serving stale models
    Thread.sleep(1100) // parquet mtime granularity can be 1s
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(tbl)
    val base2 = SparkEntry.servingBase(spark, dir.getAbsolutePath, "documents")
    assert(base1 != base2)
  }
}
