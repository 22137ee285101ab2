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

  test("WARC source: committed python-gzip fixture parses (per-record " +
      "members, headers, HTTP split); binaryFile read; loud failures") {
    import graft.sources.Warc
    val in = getClass.getResourceAsStream("/graft/tiny.warc.gz")
    assert(in != null, "missing tiny.warc.gz")
    val gz = try in.readAllBytes() finally in.close()
    // the fixture's three records are each their own gzip member,
    // written by python's gzip (an independent DEFLATE implementation
    // at level 9 — real dynamic-huffman content for our inflater)
    val recs = Warc.parseArchive(gz)
    assert(recs.map(_.warc_type) == Vector("warcinfo", "response", "request"))
    val resp = recs(1)
    assert(resp.target_uri == "https://example.org/page")
    assert(resp.warc_date == "2024-03-04T05:06:07Z")
    assert(resp.record_id == "<urn:uuid:resp-1>")
    assert(resp.content_type == "application/http; msgtype=response")
    assert(resp.content_length == 144L && resp.payload.length == 144)
    val (status, body) = Warc.httpBody(resp.payload)
    assert(status == "HTTP/1.1 200 OK")
    assert(new String(body, "UTF-8") ==
      "<html><head><title>t</title></head><body>Hello WARC corpus" +
        "</body></html>")
    // plain-WARC round-trip: build -> parse is the identity on fields
    val rt = Warc.parseRecords(Warc.build(recs))
    assert(rt.map(r => (r.warc_type, r.target_uri, r.content_length)) ==
      recs.map(r => (r.warc_type, r.target_uri, r.content_length)))
    assert(rt(1).payload.toSeq == resp.payload.toSeq)
    // gzip-per-record round-trip through our OWN members
    val rtGz = Warc.parseArchive(Warc.build(recs, gzipPerRecord = true))
    assert(rtGz.map(_.record_id) == recs.map(_.record_id))
    // distributed read path: one task per file via binaryFile — both a
    // plain and a gzipped archive in one directory
    val dir = java.nio.file.Files.createTempDirectory("graft-warc")
    java.nio.file.Files.write(dir.resolve("a.warc.gz"), gz)
    java.nio.file.Files.write(dir.resolve("b.warc"), Warc.build(recs))
    val df = Warc.read(spark, dir.toString + "/*")
    val got = df.select(col("warc_type"), col("target_uri"),
        col("content_length"))
      .as[(String, String, Long)].collect().sorted.toSeq
    assert(got.size == 6) // 3 records x 2 archives
    assert(got.count(_._1 == "response") == 2)
    // payload pruning: dropping the binary column before any action
    // keeps the scan but the projected schema is thin
    assert(df.drop("payload").columns.length == 7)
    // loud failures: truncated block, missing Content-Length, chunked
    val e1 = intercept[IllegalArgumentException](
      Warc.parseRecords(Warc.build(recs).dropRight(60)))
    assert(e1.getMessage.toLowerCase.contains("truncated") ||
      e1.getMessage.contains("unterminated"))
    val noLen = ("WARC/1.0\r\nWARC-Type: response\r\n\r\nbody\r\n\r\n")
      .getBytes("UTF-8")
    val e2 = intercept[IllegalArgumentException](Warc.parseRecords(noLen))
    assert(e2.getMessage.contains("Content-Length"))
    val chunked = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "5\r\nhello\r\n0\r\n\r\n").getBytes("UTF-8")
    val e3 = intercept[IllegalArgumentException](Warc.httpBody(chunked))
    assert(e3.getMessage.contains("chunked"))
    // a corrupt gzip member CRC errors, never silently truncates
    val badGz = gz.clone()
    badGz(badGz.length - 10) = (badGz(badGz.length - 10) ^ 0x7f).toByte
    intercept[IllegalArgumentException](Warc.parseArchive(badGz))
  }
}
