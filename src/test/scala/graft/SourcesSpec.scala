package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("entry() survives a driver-default session (ANSI mode on)") {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "true")
      assert(SparkEntry.entry(spark).count() > 0)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("JSON-lines sink -> scan round-trips, with and without schema") {
    import graft.sources.Tables
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val df = Seq((0L, "alpha", 1.5), (1L, "beta", -2.25))
      .toDF("doc_id", "text", "score")
    Tables.writeJson(df, dir)
    val inferred = Tables.loadJson(spark, dir)
      .select("doc_id", "text", "score").orderBy("doc_id")
      .as[(Long, String, Double)].collect().toSeq
    assert(inferred == Seq((0L, "alpha", 1.5), (1L, "beta", -2.25)))
    val explicit = Tables.loadJson(spark, dir, Some(df.schema))
      .orderBy("doc_id").as[(Long, String, Double)].collect().toSeq
    assert(explicit == inferred)
  }

  test("date-partitioned writes prune partitions at scan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toFile
    dir.deleteOnExit()
    val df = Seq(
      ("2024-01-01", 1L, 5.0), ("2024-01-02", 2L, 6.0), ("2024-01-03", 3L, 7.0))
      .toDF("day", "id", "v")
    df.write.mode("overwrite").partitionBy("day").parquet(dir.getAbsolutePath)
    val q = spark.read.parquet(dir.getAbsolutePath).filter(col("day") === "2024-01-02")
    val plan = q.queryExecution.executedPlan.toString
    assert(q.count() == 1)
    assert(plan.contains("PartitionFilters") && plan.contains("isnotnull(day"),
      s"partition filter should prune:\n$plan")

    // writePartitioned: multi-column hive layout + bounded file size; a
    // two-level filter prunes directories, and maxRecordsPerFile splits
    // the skewed partition into multiple part files
    val dir2 = java.nio.file.Files.createTempDirectory("graft-part2").toFile
    dir2.deleteOnExit()
    val skewed = (0 until 90).map(i =>
        (if (i < 80) "en" else "de", s"2024-01-0${i % 3 + 1}", i.toLong))
      .toDF("lang", "day", "doc_id")
    graft.sources.Tables.writePartitioned(
      skewed.repartition(1), dir2.getAbsolutePath, Seq("lang", "day"),
      maxRecordsPerFile = 10L)
    val back = spark.read.parquet(dir2.getAbsolutePath)
      .filter(col("lang") === "en" && col("day") === "2024-01-01")
    assert(back.count() == skewed.filter(col("lang") === "en" &&
      col("day") === "2024-01-01").count())
    val plan2 = back.queryExecution.executedPlan.toString
    assert(plan2.contains("PartitionFilters") && plan2.contains("isnotnull(lang"),
      s"two-level partition filter should prune:\n$plan2")
    // the 80-row en partitions were split into <=10-record files
    val enFiles = new java.io.File(dir2, "lang=en/day=2024-01-01")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(enFiles >= 2, s"maxRecordsPerFile did not split: $enFiles files")
  }

  test("HLL++ approx distinct within 5% of exact (a14 sketch query)") {
    val rows = SparkEntry.queries("a14_approx_distinct")(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"approx=$approx exact=$exact")
    }
  }

  test("parquet scans prune columns and push predicates (q1 shape)") {
    val q = SparkEntry.queries("q1_agg")(spark, "/root/testdata/sf0.001")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"shipdate predicate must reach parquet:\n$plan")
    assert(!plan.contains("l_orderkey"), "unused columns must be pruned")
  }

  test("S6: blob-store layout round-trips through explicit file: URIs") {
    // the cloud_trainer.py:56-78 layout: a bucket prefix holding
    // training-<n> CSV objects, consumed back through ONE wildcard URI.
    // `file:` exercises the same Hadoop FileSystem resolution path an
    // object store (`gs://`, `s3a://`) goes through — scheme parsing,
    // FS-based globbing, multi-file scan — with no store in the sandbox.
    import graft.sources.Tables
    val bucket = java.nio.file.Files.createTempDirectory("graft-bucket")
    val prefix = s"file:${bucket.toAbsolutePath}"
    val splits = (0 until 3).map(i =>
      (0 until 20).map(j => (i * 20 + j, s"item_${i * 20 + j}", j * 1.5))
        .toDF("id", "item_id", "value"))
    splits.zipWithIndex.foreach { case (df, i) =>
      Tables.writeCsv(df, s"$prefix/training-$i.csv")
    }
    // each object is a directory of part files (Spark's sink layout);
    // the wildcard resolves all of them in one scan
    val back = Tables.loadCsv(spark, s"$prefix/training-*.csv")
    assert(back.count() == 60)
    assert(back.columns.toSeq == Seq("id", "item_id", "value"))
    assert(back.agg(org.apache.spark.sql.functions.countDistinct($"id"))
      .head().getLong(0) == 60)
    // JSON interchange through the same scheme + glob
    Tables.writeJson(splits(0), s"$prefix/docs-0.json")
    Tables.writeJson(splits(1), s"$prefix/docs-1.json")
    val js = Tables.loadJson(spark, s"$prefix/docs-*.json")
    assert(js.count() == 40)
  }

  test("audited JSONL ingest quarantines malformed lines with evidence") {
    import graft.sources.Tables
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toFile
    dir.deleteOnExit()
    val f = new java.io.File(dir, "part-0.jsonl")
    val w = new java.io.PrintWriter(f, "UTF-8")
    w.println("""{"doc_id": 1, "text": "clean line one"}""")
    w.println("""{"doc_id": 2}""") // missing field: parses, text=null
    w.println("""{"doc_id": 3, "text": "truncated""") // corrupt
    w.println("""not json at all""") // corrupt
    w.println("""{"doc_id": 4, "text": "clean line two"}""")
    w.close()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val df = Tables.loadJsonAudited(spark, f.getAbsolutePath, schema)
    val (clean, bad) = Tables.splitCorrupt(df)
    // NOTE: keep data columns in every projection — Spark disallows raw
    // JSON scans whose pruned schema is ONLY the internal corrupt-record
    // column (a bare clean.count() trips it; see loadJsonAudited doc)
    val cleanRows = clean.select(col("doc_id"), col("text"))
      .as[(Option[Long], Option[String])].collect().toSeq
    assert(cleanRows.size == 3)
    assert(clean.columns.toSeq == Seq("doc_id", "text"))
    // the missing-field line is CLEAN (null text), not quarantined
    assert(cleanRows.contains((Some(2L), None)))
    // keep a data column in the projection: Spark disallows scans whose
    // only referenced column is the internal corrupt-record column
    val badLines = bad.select(col("doc_id"), col("_corrupt_record"))
      .as[(Option[Long], String)].collect().map(_._2).toSet
    assert(badLines == Set("""{"doc_id": 3, "text": "truncated""",
      "not json at all"))
    // declared _corrupt_record collides loudly
    intercept[IllegalArgumentException] {
      Tables.loadJsonAudited(spark, f.getAbsolutePath,
        schema.add("_corrupt_record", StringType))
    }
  }
}
