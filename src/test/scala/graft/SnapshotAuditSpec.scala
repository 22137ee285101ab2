package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.SnapshotAudit

/** [[graft.ext.SnapshotAudit]] — classification differential vs a
  * driver-side brute force (incl. null-text edges), fingerprint-choice
  * transparency, and JS-divergence reference values.
  */
class SnapshotAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def diffMap(
      old: Seq[(Long, String)], nw: Seq[(Long, String)],
      fp: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] =
        None) = {
    val o = old.toDF("doc_id", "text")
    val n = nw.toDF("doc_id", "text")
    val d = fp match {
      case Some(f) => SnapshotAudit.snapshotDiff(o, n, "doc_id", "text",
        fingerprint = f)
      case None => SnapshotAudit.snapshotDiff(o, n, "doc_id", "text")
    }
    d.as[(Long, String)].collect().toMap
  }

  test("snapshotDiff == brute-force classification (incl. null text)") {
    val old = Seq(1L -> "a", 2L -> "b", 3L -> "c", 4L -> (null: String),
      5L -> (null: String), 6L -> "same")
    val nw = Seq(2L -> "b", 3L -> "CHANGED", 4L -> (null: String),
      5L -> "now set", 6L -> "same", 7L -> "new doc")
    val got = diffMap(old, nw)
    val oldM = old.toMap
    val nwM = nw.toMap
    val want = (oldM.keySet ++ nwM.keySet).map { id =>
      id -> ((oldM.contains(id), nwM.contains(id)) match {
        case (false, true) => "added"
        case (true, false) => "removed"
        case _ => if (oldM(id) == nwM(id)) "unchanged" else "changed"
      })
    }.toMap
    assert(got == want)
    // explicit pins for the subtle rows: null==null is unchanged,
    // null vs value is changed
    assert(got(4L) == "unchanged" && got(5L) == "changed")
    assert(got(1L) == "removed" && got(7L) == "added")
  }

  test("default fingerprint128 and md5 classify identically") {
    val r = new scala.util.Random(0x5a5a)
    val old = (0L until 60L).map(i => i -> s"doc $i body ${r.nextInt(3)}")
    val nw = (20L until 80L).map(i => i -> s"doc $i body ${r.nextInt(3)}")
    assert(diffMap(old, nw) == diffMap(old, nw, Some(c => md5(c))))
  }

  test("snapshotDiff carries metadata columns, new side wins") {
    val o = Seq((1L, "x", "srcOld"), (2L, "y", "srcOld"))
      .toDF("doc_id", "text", "source")
    val n = Seq((2L, "y", "srcNew"), (3L, "z", "srcNew"))
      .toDF("doc_id", "text", "source")
    val got = SnapshotAudit.snapshotDiff(o, n, "doc_id", "text",
        carryCols = Seq("source"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, "removed", "srcOld"), (2L, "unchanged", "srcNew"),
      (3L, "added", "srcNew")))
  }

  private def drift(
      old: Seq[(String, Long)], nw: Seq[(String, Long)]) =
    SnapshotAudit.distributionDrift(
        old.toDF("g", "v"), nw.toDF("g", "v"), "g",
        least(col("v"), lit(9)).cast("int"))
      .as[(String, Double, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("distributionDrift: identical snapshots diverge 0; disjoint = ln 2") {
    val a = Seq("s" -> 1L, "s" -> 1L, "s" -> 2L, "s" -> 5L)
    val same = drift(a, a)
    assert(same("s")._1 == 0.0 && same("s")._2 == 4L && same("s")._3 == 4L)
    // disjoint bucket support: JS = ln 2
    val d = drift(Seq("s" -> 1L, "s" -> 2L), Seq("s" -> 7L, "s" -> 8L))
    assert(math.abs(d("s")._1 - math.log(2.0)) < 2e-6)
  }

  test("distributionDrift: a NULL bucket is ONE cell equal to itself " +
      "across snapshots (identical null-holding snapshots diverge 0)") {
    def driftNullable(old: Seq[(String, java.lang.Long)],
        nw: Seq[(String, java.lang.Long)]) =
      SnapshotAudit.distributionDrift(
          old.toDF("g", "v"), nw.toDF("g", "v"), "g",
          least(col("v"), lit(9)).cast("int"))
        .as[(String, Double, Long, Long)].collect()
        .map(r => r._1 -> r._2).toMap
    val withNulls: Seq[(String, java.lang.Long)] =
      Seq("s" -> 1L, "s" -> null, "s" -> null, "s" -> 5L)
    // the pre-r15 per-side-join form never matched null keys and
    // reported phantom drift here
    assert(driftNullable(withNulls, withNulls)("s") == 0.0)
    // and a genuine null-share shift IS drift
    val shifted: Seq[(String, java.lang.Long)] =
      Seq("s" -> 1L, "s" -> 1L, "s" -> 1L, "s" -> 5L)
    assert(driftNullable(withNulls, shifted)("s") > 0.0)
  }

  test("distributionDrift == driver-side reference on random data; " +
      "one-sided group is finite with n=0") {
    val r = new scala.util.Random(0xd21f7)
    val old = (0 until 400).map(_ =>
      (s"s${r.nextInt(3)}", r.nextInt(12).toLong)) :+ ("only_old" -> 3L)
    val nw = (0 until 500).map(_ =>
      (s"s${r.nextInt(3)}", r.nextInt(12).toLong)) :+ ("only_new" -> 4L)
    val got = drift(old, nw)
    def histOf(xs: Seq[(String, Long)], g: String): Map[Int, Long] =
      xs.filter(_._1 == g).groupBy(x => math.min(x._2, 9L).toInt)
        .map { case (b, rows) => b -> rows.size.toLong }
    val groups = (old ++ nw).map(_._1).distinct
    groups.foreach { g =>
      val ho = histOf(old, g); val hn = histOf(nw, g)
      val to = ho.values.sum.toDouble; val tn = hn.values.sum.toDouble
      val js = (ho.keySet ++ hn.keySet).toSeq.map { b =>
        val p = if (to > 0) ho.getOrElse(b, 0L) / to else 0.0
        val q = if (tn > 0) hn.getOrElse(b, 0L) / tn else 0.0
        val m = (p + q) / 2
        val t = (if (p > 0) p * math.log(p / m) / 2 else 0.0) +
          (if (q > 0) q * math.log(q / m) / 2 else 0.0)
        BigDecimal(t).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.sum
      val want = BigDecimal(js).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      assert(math.abs(got(g)._1 - want) < 2e-6, s"group $g")
      assert(got(g)._2 == to.toLong && got(g)._3 == tn.toLong, s"group $g ns")
    }
    assert(got("only_old")._3 == 0L && got("only_new")._2 == 0L)
    assert(got("only_old")._1 <= math.log(2.0) + 1e-9)
  }

  test("persisted histogram states: merged increments == direct drift " +
      "over the unioned slices (exact)") {
    val r = new scala.util.Random(0x9157a7e)
    def slice(n: Int) = (0 until n).map(_ =>
      (s"s${r.nextInt(3)}", r.nextInt(12).toLong))
    val (day1o, day2o) = (slice(300), slice(80))
    val (day1n, day2n) = (slice(320), slice(90))
    val base = java.nio.file.Files
      .createTempDirectory("histstate").toString
    val bucket = least(col("v"), lit(9)).cast("int")
    Seq(("o1", day1o), ("o2", day2o), ("n1", day1n), ("n2", day2n))
      .foreach { case (tag, rows) =>
        SnapshotAudit.writeHistogramState(
          rows.toDF("g", "v"), "g", bucket, s"$base/$tag") }
    val fromStates = SnapshotAudit.distributionDriftFromStates(
        spark, Seq(s"$base/o1", s"$base/o2"), Seq(s"$base/n1", s"$base/n2"),
        "g")
      .as[(String, Double, Long, Long)].collect().sortBy(_._1).toSeq
    val direct = SnapshotAudit.distributionDrift(
        (day1o ++ day2o).toDF("g", "v"), (day1n ++ day2n).toDF("g", "v"),
        "g", bucket)
      .as[(String, Double, Long, Long)].collect().sortBy(_._1).toSeq
    assert(fromStates == direct)
  }

  test("plan contracts: diff is one join, no window; drift windows " +
      "only the histogram frame") {
    val o = (0L until 50L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val n = (25L until 75L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val diffPlan = SnapshotAudit.snapshotDiff(o, n, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!diffPlan.contains("Window"), s"unexpected window:\n$diffPlan")
    assert("Join".r.findAllIn(diffPlan).size >= 1)
    val driftQ = SnapshotAudit.distributionDrift(
      o.withColumn("g", lit("s")), n.withColumn("g", lit("s")), "g",
      (col("doc_id") % 10).cast("int"))
    driftQ.collect()
    val driftPlan = driftQ.queryExecution.executedPlan.toString
    // the window must sit above the histogram aggregate, never the scan:
    // every Window in the plan partitions by the group column
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(driftPlan).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.startsWith("g")),
      s"window not group-partitioned:\n$driftPlan")
  }
}
