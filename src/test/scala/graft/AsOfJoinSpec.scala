package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asOf attaches the latest right row at-or-before each left row") {
    val left = Seq(
      ("u1", 5L, "q1"), ("u1", 10L, "q2"), ("u1", 20L, "q3"),
      ("u2", 7L, "q4"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      ("u1", 4L, 100.0), ("u1", 10L, 200.0), ("u1", 30L, 300.0),
      ("u2", 9L, 400.0)) // after u2's only left row
      .toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .orderBy("tag")
      .select("tag", "asof_v")
      .as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("q1", Some(100.0)), // 4 <= 5
      ("q2", Some(200.0)), // equal timestamps match (>= semantics)
      ("q3", Some(200.0)), // 30 is in the future
      ("q4", None)))       // no preceding right row
  }

  test("asOfForward attaches the earliest right row at-or-after each left row") {
    val left = Seq(
      ("u1", 5L, "q1"), ("u1", 10L, "q2"), ("u1", 40L, "q3"),
      ("u2", 7L, "q4"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      ("u1", 4L, 100.0), ("u1", 10L, 200.0), ("u1", 30L, 300.0),
      ("u2", 3L, 400.0)) // before u2's only left row
      .toDF("k", "ts", "v")
    val got = AsOfJoin.asOfForward(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .orderBy("tag")
      .select("tag", "asof_v")
      .as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("q1", Some(200.0)), // next at-or-after 5 is ts=10
      ("q2", Some(200.0)), // equal timestamps match (<= semantics)
      ("q3", None),        // nothing after 40
      ("q4", None)))       // u2's right row is in the past
  }

  test("asOfTolerance nulls matches older than the bound, keeps the rest") {
    val left = Seq(("u1", 100L, "near"), ("u1", 500L, "far"))
      .toDF("k", "ts", "tag")
    val right = Seq(("u1", 90L, 1.5)).toDF("k", "ts", "v")
    val got = AsOfJoin.asOfTolerance(
        left.withColumn("ts", expr("timestamp_seconds(ts)")),
        right.withColumn("ts", expr("timestamp_seconds(ts)")),
        Seq("k"), "ts", "ts", Seq("v"), toleranceSeconds = 60L)
      .orderBy("tag")
      .select("tag", "asof_v")
      .as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("far", None),        // 500-90 = 410s > 60s tolerance
      ("near", Some(1.5)))) // 100-90 = 10s within tolerance
  }

  test("asOfTolerance on TIMESTAMP_NTZ diffs in the NTZ domain (DST-safe)") {
    // Regression (advisor round-7): the old NTZ→LTZ→double hop was only
    // difference-exact under fixed-offset session zones. With a
    // DST-observing zone, two NTZ operands straddling a transition picked
    // up different offsets: the 2h wall-clock gaps below measured 3600 s
    // (spring-forward) / 10800 s (fall-back) instead of 7200 s.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val left = Seq(
        ("u1", "2024-03-10 03:30:00", "spring"),
        ("u2", "2024-11-03 02:30:00", "fall"))
        .toDF("k", "s", "tag")
        .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
      val right = Seq(
        ("u1", "2024-03-10 01:30:00", 1.0),
        ("u2", "2024-11-03 00:30:00", 2.0))
        .toDF("k", "s", "v")
        .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
      def run(tol: Long): Seq[(String, Option[Double])] =
        AsOfJoin.asOfTolerance(
            left, right, Seq("k"), "ts", "ts", Seq("v"), tol)
          .orderBy("tag").select("tag", "asof_v")
          .as[(String, Option[Double])].collect().toSeq
      // both gaps are exactly 7200 s in the NTZ domain
      assert(run(7200L) == Seq(("fall", Some(2.0)), ("spring", Some(1.0))))
      // a bound between the phantom 3600 s and the true 7200 s excludes
      // BOTH (the old hop wrongly kept the spring-forward pair)
      assert(run(5000L) == Seq(("fall", None), ("spring", None)))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("null timestamps never match: null-ts right ignored, null-ts left unmatched") {
    val left = Seq(("u1", Some(10L), "has-ts"), ("u1", None, "no-ts"))
      .toDF("k", "ts", "tag")
    val right = Seq(("u1", Some(5L), 1.0), ("u1", None, 99.0))
      .toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .orderBy("tag").select("tag", "asof_v")
      .as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("has-ts", Some(1.0)), // matches the real ts=5 row, never the null-ts one
      ("no-ts", None)))      // a left row without a position matches nothing
    val fwd = AsOfJoin.asOfForward(left, right, Seq("k"), "ts", "ts", Seq("v"))
      .orderBy("tag").select("asof_v")
      .as[Option[Double]].collect().toSeq
    assert(fwd == Seq(None, None)) // ts=5 is in the past; null rows excluded
  }

  test("asOf with no matching key yields nulls, not dropped rows") {
    val left = Seq(("solo", 1L)).toDF("k", "ts")
    val right = Seq(("other", 1L, 9.9)).toDF("k", "ts", "v")
    val got = AsOfJoin.asOf(left, right, Seq("k"), "ts", "ts", Seq("v"))
    assert(got.count() == 1)
    assert(got.select("asof_v").head().isNullAt(0))
  }

  test("asOf carries the matched row ATOMICALLY when a payload field is null") {
    val left = Seq(("k", 10L)).toDF("g", "ts")
    val right = Seq(("k", 1L, Some(1L), Some(1.5)), ("k", 2L, Some(2L), None))
      .toDF("g", "ts", "rid", "rv")
    // latest row (ts=2) has rv=null; per-column carry would stitch
    // rid=2 with rv=1.5 from the OLDER row — must be (2, null)
    val row = AsOfJoin.asOf(left, right, Seq("g"), "ts", "ts", Seq("rid", "rv"))
      .select("asof_rid", "asof_rv").head()
    assert(row.getLong(0) == 2L && row.isNullAt(1))
  }

  test("asOf carries multiple payload columns from the same matched row") {
    val left = Seq(("k", 10L)).toDF("g", "ts")
    val right = Seq(("k", 3L, 1L, 1.5), ("k", 8L, 2L, 2.5), ("k", 11L, 3L, 3.5))
      .toDF("g", "ts", "rid", "rv")
    val row = AsOfJoin.asOf(left, right, Seq("g"), "ts", "ts", Seq("rid", "rv"))
      .select("asof_rid", "asof_rv").head()
    assert(row.getLong(0) == 2L && row.getDouble(1) == 2.5)
  }
}
