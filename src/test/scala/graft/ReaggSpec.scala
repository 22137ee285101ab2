package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Reagg

/** Two-phase hierarchical aggregation (ops.Reagg): value identity with
  * the native rollup/cube/grouping-sets operators — null grouping keys
  * included, where grouping_id is what disambiguates — and the plan
  * shape the operator exists for: the Expand consumes the finest-grain
  * aggregate, never the corpus. */
class ReaggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // null keys on purpose: (null, x) data rows must stay distinct from
  // rollup-null subtotal rows via grouping_id
  private def fixture = Seq(
    (Some("a"), Some("x"), 1L, 10.0),
    (Some("a"), Some("y"), 2L, 20.0),
    (Some("b"), Some("x"), 3L, 30.0),
    (Some("b"), None, 4L, 40.0),
    (None, Some("x"), 5L, 50.0),
    (None, None, 6L, 60.0)
  ).toDF("k1", "k2", "n", "v")

  private def sortedRows(df: DataFrame) =
    df.select("gid", "k1", "k2", "total_n", "sum_v")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))

  private val partials =
    Seq(sum(col("n")).as("__n"), sum(col("v")).as("__v"))
  private val finals = Seq(
    grouping_id().cast("long").as("gid"),
    sum(col("__n")).as("total_n"),
    round(sum(col("__v")), 6).as("sum_v"))

  test("rollup == native rollup on null-key data") {
    val native = fixture.rollup(col("k1"), col("k2"))
      .agg(grouping_id().cast("long").as("gid"),
        sum(col("n")).as("total_n"), round(sum(col("v")), 6).as("sum_v"))
    val twoPhase = Reagg.rollup(fixture, Seq("k1", "k2"), partials, finals)
    assert(sortedRows(twoPhase).toSeq == sortedRows(native).toSeq)
  }

  test("cube == native cube on null-key data") {
    val native = fixture.cube(col("k1"), col("k2"))
      .agg(grouping_id().cast("long").as("gid"),
        sum(col("n")).as("total_n"), round(sum(col("v")), 6).as("sum_v"))
    val twoPhase = Reagg.cube(fixture, Seq("k1", "k2"), partials, finals)
    assert(sortedRows(twoPhase).toSeq == sortedRows(native).toSeq)
  }

  test("groupingSets == native GROUPING SETS on null-key data") {
    fixture.createOrReplaceTempView("__reagg_fx")
    val native = spark.sql(
      """SELECT grouping_id(k1, k2) AS gid, k1, k2,
        | sum(n) AS total_n, round(sum(v), 6) AS sum_v
        |FROM __reagg_fx
        |GROUP BY GROUPING SETS ((k1, k2), (k2), ())""".stripMargin)
      .select(col("gid").cast("long").as("gid"), col("k1"), col("k2"),
        col("total_n"), col("sum_v"))
    val twoPhase = Reagg.groupingSets(fixture, Seq("k1", "k2"),
      Seq(Seq("k1", "k2"), Seq("k2"), Nil), partials, finals)
    assert(sortedRows(twoPhase).toSeq == sortedRows(native).toSeq)
  }

  test("groupingSets rejects a set drawing outside the keys") {
    intercept[IllegalArgumentException] {
      Reagg.groupingSets(fixture, Seq("k1"), Seq(Seq("k2")), partials, finals)
    }
  }

  test("plan: Expand consumes the finest-grain aggregate, not the corpus") {
    val df = Reagg.cube(fixture, Seq("k1", "k2"), partials, finals)
    df.collect()
    val lines = df.queryExecution.executedPlan.toString.linesIterator.toVector
    val expandIdx = lines.indexWhere(_.contains("Expand"))
    assert(expandIdx >= 0, s"no Expand in plan:\n${lines.mkString("\n")}")
    // below the Expand (its input subtree) there must be a HashAggregate —
    // the finest-grain phase-1 aggregate; native cube has the scan directly
    // under the Expand
    assert(lines.drop(expandIdx + 1).exists(_.contains("HashAggregate")),
      "Expand reads the corpus directly — the two-phase shape regressed:\n" +
        lines.mkString("\n"))
  }
}
