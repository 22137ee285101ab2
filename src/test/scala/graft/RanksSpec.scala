package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Ranks

/** [[graft.ops.Ranks.globalValueRanks]] — exact-equality differential vs
  * the naive global window, tie/null/degenerate handling, and the
  * no-single-partition-window plan property.
  */
class RanksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("globalValueRanks == naive rank()/percent_rank() window, with ties") {
    val rnd = new scala.util.Random(11)
    // heavy ties: values drawn from a small domain
    val df = (0 until 500)
      .map(i => (i.toLong, (rnd.nextInt(40) / 7.0)))
      .toDF("id", "v")
    val got = Ranks.globalValueRanks(df, "v")
      .select("id", "rank", "percent_rank")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val w = Window.orderBy(col("v"))
    val want = df
      .withColumn("rank", rank().over(w).cast("long"))
      .withColumn("percent_rank", round(percent_rank().over(w), 6))
      .select("id", "rank", "percent_rank")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == want)
  }

  test("null values keep null rank; non-null ranks unaffected") {
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(1.0)), (4L, Some(2.0)))
      .toDF("id", "v")
    val got = Ranks.globalValueRanks(df, "v")
      .orderBy("id").collect()
    assert(got.find(_.getLong(0) == 2L).get.isNullAt(2))
    val ranks = got.filter(!_.isNullAt(2)).map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(ranks == Map(1L -> 2L, 3L -> 1L, 4L -> 2L))
  }

  test("single row: rank 1, percent_rank 0") {
    val got = Ranks.globalValueRanks(Seq((9L, 5.0)).toDF("id", "v"), "v")
      .select("rank", "percent_rank").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 0.0)))
  }

  test("reserved output names rejected") {
    val e = intercept[IllegalArgumentException](
      Ranks.globalValueRanks(Seq((1L, 1.0, 5L)).toDF("id", "v", "rank"), "v"))
    assert(e.getMessage.contains("rank"))
  }

  test("boundedDomain variant == general form == naive window, with ties") {
    val rnd = new scala.util.Random(23)
    val df = (0 until 400)
      .map(i => (i.toLong, (rnd.nextInt(25) / 4.0)))
      .toDF("id", "v")
    val got = Ranks.globalValueRanksBoundedDomain(df, "v")
      .select("id", "rank", "percent_rank")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val w = Window.orderBy(col("v"))
    val want = df
      .withColumn("rank", rank().over(w).cast("long"))
      .withColumn("percent_rank", round(percent_rank().over(w), 6))
      .select("id", "rank", "percent_rank")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == want)
    val gotGeneral = Ranks.globalValueRanks(df, "v")
      .select("id", "rank", "percent_rank")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got == gotGeneral)
  }

  test("boundedDomain: nulls keep null rank; single row; degenerate all-tie") {
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(1.0)), (4L, Some(2.0)))
      .toDF("id", "v")
    val got = Ranks.globalValueRanksBoundedDomain(df, "v").orderBy("id").collect()
    assert(got.find(_.getLong(0) == 2L).get.isNullAt(2))
    assert(got.filter(!_.isNullAt(2)).map(r => r.getLong(0) -> r.getLong(2)).toMap
      == Map(1L -> 2L, 3L -> 1L, 4L -> 2L))
    val one = Ranks.globalValueRanksBoundedDomain(
        Seq((9L, 5.0)).toDF("id", "v"), "v")
      .select("rank", "percent_rank").as[(Long, Double)].collect().toSeq
    assert(one == Seq((1L, 0.0)))
    // all rows tie: rank 1 everywhere, percent_rank 0 (rank-1 == 0)
    val ties = Ranks.globalValueRanksBoundedDomain(
        Seq((1L, 7.0), (2L, 7.0), (3L, 7.0)).toDF("id", "v"), "v")
      .select("rank", "percent_rank").as[(Long, Double)].collect().toSeq
    assert(ties == Seq((1L, 0.0), (1L, 0.0), (1L, 0.0)))
  }

  test("boundedDomain plan: rank table joins back via broadcast") {
    val df = (0 until 100).map(i => (i.toLong, i / 9.0)).toDF("id", "v")
    val q = Ranks.globalValueRanksBoundedDomain(df, "v")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"rank table should broadcast:\n$plan")
  }

  test("quantileNormalize == driver-side reference (randomized, ties); " +
      "group max maps to global max; nulls stay null") {
    val r = new scala.util.Random(0x9a27)
    for (trial <- 0 until 10) {
      val rows = (0 until 300).map { i =>
        (i.toLong, s"g${r.nextInt(4)}",
          if (r.nextInt(20) == 0) None else Some(r.nextInt(15) / 4.0))
      }
      val df = rows.toDF("id", "g", "v")
      val got = Ranks.quantileNormalizeBoundedDomain(df, "g", "v")
        .select("id", "normalized")
        .as[(Long, Option[Double])].collect().toMap
      // reference: right-continuous inverse global CDF of the in-group CDF
      val present = rows.collect { case (id, g, Some(v)) => (id, g, v) }
      val globalSorted = present.map(_._3).sorted
      val n = globalSorted.size.toDouble
      def fGlobal(u: Double) = globalSorted.count(_ <= u) / n
      val domain = globalSorted.distinct
      present.foreach { case (id, g, v) =>
        val grp = present.filter(_._2 == g).map(_._3)
        val fg = BigDecimal(grp.count(_ <= v) / grp.size.toDouble)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
        val want = domain.find(u =>
          BigDecimal(fGlobal(u)).setScale(9,
            BigDecimal.RoundingMode.HALF_UP).toDouble >= fg).get
        assert(got(id).contains(want), s"trial $trial id $id (g=$g v=$v)")
      }
      rows.collect { case (id, _, None) => id }
        .foreach(id => assert(got(id).isEmpty, s"null row $id"))
    }
  }

  test("plan: every Window is partitioned (no single-partition sort)") {
    val df = (0 until 100).map(i => (i.toLong, i / 9.0)).toDF("id", "v")
    val q = Ranks.globalValueRanks(df, "v")
    q.collect()
    // string form (the AQE-safe route the other plan specs use): every
    // windowspecdefinition must lead with the __pid partition column
    val plan = q.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty, s"no window in plan:\n$plan")
    assert(specs.forall(_.startsWith("__pid")),
      s"found a window not partitioned by __pid: $specs")
  }
}
