package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TopK

/** Custom LogicalPlan/Strategy/SparkPlan operator (TopKPerGroup). */
class PlansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample = {
    val rnd = new scala.util.Random(17)
    (0 until 5000).map(i =>
      (s"g${rnd.nextInt(20)}", i.toLong, rnd.nextDouble() * 1000))
      .toDF("grp", "id", "score")
  }

  test("TopKPerGroup row set == window row_number filter (total ordering)") {
    val df = sample
    val got = TopK.perGroup(df, Seq("grp"), Seq(col("score").desc, col("id")), 3)
      .select("grp", "id", "score").as[(String, Long, Double)].collect().toSet
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
      .as[(String, Long, Double)].collect().toSet
    assert(got == want)
    assert(got.size == 60) // 20 groups x 3
  }

  test("TopKPerGroup handles k larger than the group size") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 2.0), ("b", 3L, 3.0))
      .toDF("grp", "id", "score")
    val got = TopK.perGroup(df, Seq("grp"), Seq(col("score").desc, col("id")), 10)
      .as[(String, Long, Double)].collect().toSet
    assert(got.size == 3) // everything survives
  }

  test("TopKPerGroup plans partial and final heaps around one exchange") {
    val df = sample
    val plan = TopK.perGroup(df, Seq("grp"), Seq(col("score").desc, col("id")), 3)
      .queryExecution.executedPlan.toString
    // a partial (pre-shuffle, flag true) and a final (flag false) phase
    assert("TopKPerGroup \\[".r.findAllIn(plan).size == 2)
    assert(plan.contains(", true") && plan.contains(", false"))
    assert(plan.contains("Exchange hashpartitioning"))
    // never a full Sort of the input
    assert(!plan.contains("Sort ["))
  }

  test("TopKPerGroup fuses into WholeStageCodegen on both sides of the exchange") {
    // '*(n) TopKPerGroup' in the tree string = the phase is inside a
    // codegen span: the child pipeline feeds the heaps without the
    // iterator bridge, the hottest path of every ANN tail. Partial fuses
    // with the scan pipeline (stage 1), final with the post-shuffle
    // pipeline (stage 2).
    val df = TopK.perGroup(sample, Seq("grp"), Seq(col("score").desc, col("id")), 3)
    df.collect() // under AQE the codegen collapse happens per materialized stage
    val plan = df.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) TopKPerGroup".r.findAllIn(plan).size == 2,
      s"a TopKPerGroup phase fell out of whole-stage codegen:\n$plan")
  }

  test("TopKPerGroup codegen and iterator paths are row-identical (fallback off)") {
    // with spark.sql.codegen.fallback=false a generated-code defect FAILS
    // instead of silently reverting to doExecute — so this equality is
    // between the real codegen path and the forced iterator path
    val conf = spark.conf
    val oldWhole = conf.get("spark.sql.codegen.wholeStage")
    val oldFallback = conf.get("spark.sql.codegen.fallback")
    try {
      conf.set("spark.sql.codegen.fallback", "false")
      conf.set("spark.sql.codegen.wholeStage", "true")
      val gen = TopK.perGroupRanked(sample, Seq("grp"),
        Seq(col("score").desc, col("id")), 5, "rank")
        .as[(String, Long, Double, Int)].collect().toSet
      conf.set("spark.sql.codegen.wholeStage", "false")
      val iter = TopK.perGroupRanked(sample, Seq("grp"),
        Seq(col("score").desc, col("id")), 5, "rank")
        .as[(String, Long, Double, Int)].collect().toSet
      assert(gen == iter)
      assert(gen.size == 100) // 20 groups x 5, ranks included
    } finally {
      conf.set("spark.sql.codegen.wholeStage", oldWhole)
      conf.set("spark.sql.codegen.fallback", oldFallback)
    }
  }

  test("pipeline_curate's host-cap stage compiles under whole-stage codegen " +
      "(fallback off — the TopKPerGroup usedInputs regression)") {
    // Regression for the round-19 find: without `usedInputs = empty` on
    // TopKPerGroupExec (the SortExec row-consumer contract), consume()
    // ALSO pre-evaluated the child's output vars, and the curate DAG's
    // host-cap stage — whose child Project chain shares subexpression-
    // elimination state through the `nullif` `_common_expr` With-rewrite
    // of UrlOps.host, stacked kernel/struct projections and a pushed-down
    // host-notnull Filter — had the shared block spliced TWICE into one
    // generated scope: janino "Redefinition of local variable
    // project_isNull_N", silently dropping the hottest custom-operator
    // stage (every ANN tail / host cap / retrieval top-k — 18 fallback
    // sites per bench run) to interpreted execution. A reduced synthetic
    // (nullif + md5 + struct-field child) does NOT reproduce — only the
    // full curate shape does — so the regression pin runs the real query
    // with codegen.fallback=false, where the defect FAILS instead of
    // hiding behind the fallback.
    val conf = spark.conf
    val oldFallback = conf.get("spark.sql.codegen.fallback")
    try {
      conf.set("spark.sql.codegen.fallback", "false")
      val n = SparkEntry.queries("pipeline_curate")(
        spark, "/root/testdata/sf0.001").count()
      assert(n > 0)
    } finally conf.set("spark.sql.codegen.fallback", oldFallback)
  }

  test("TopKPerGroup matches the window form with null groups and null sort values") {
    val df = Seq(
      (Some("a"), 1L, Some(5.0)), (Some("a"), 2L, None),
      (Some("a"), 3L, Some(9.0)), (Some("a"), 4L, Some(1.0)),
      (None, 5L, Some(7.0)), (None, 6L, Some(2.0)), (None, 7L, None))
      .toDF("grp", "id", "score")
    val got = TopK.perGroup(df, Seq("grp"), Seq(col("score").desc, col("id")), 2)
      .as[(Option[String], Long, Option[Double])].collect().toSet
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
      .as[(Option[String], Long, Option[Double])].collect().toSet
    assert(got == want)
    assert(got.exists(_._1.isEmpty)) // the null group is a real group
  }

  test("TopKPerGroup normalizes -0.0/0.0 group keys like the window form") {
    val df = Seq((0.0, 1L), (-0.0, 2L), (1.5, 3L)).toDF("gkey", "id")
    val got = TopK.perGroup(df, Seq("gkey"), Seq(col("id")), 1)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L)) // 0.0 and -0.0 are ONE group; id=1 wins it
  }

  test("TopKPerGroup rejects an empty group list with a clear message") {
    val df = Seq((1L, 2.0)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      TopK.perGroup(df, Seq(), Seq(col("v")), 1)
    }
    assert(e.getMessage.contains("orderBy(...).limit(k)"))
  }

  test("TopKPerGroup survives repartitioned input (partial phase merges)") {
    val df = sample.repartition(13)
    val got = TopK.perGroup(df, Seq("grp"), Seq(col("score").desc, col("id")), 5)
      .select("grp").groupBy("grp").count()
      .select("count").as[Long].collect().toSeq
    assert(got.forall(_ == 5))
  }

  test("perGroupRanked == window row_number, with NO Window node in the plan") {
    val df = sample
    val ranked = TopK.perGroupRanked(
      df, Seq("grp"), Seq(col("score").desc, col("id")), 3)
    val got = ranked.select("grp", "rank", "id", "score")
      .as[(String, Int, Long, Double)].collect().toSet
    val w = Window.partitionBy(col("grp")).orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("grp", "rank", "id", "score")
      .as[(String, Int, Long, Double)].collect().toSet
    assert(got == want) // ranks themselves match, not just the row set
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank must come from the heap drain:\n$plan")
    assert(plan.contains("TopKPerGroup"))
  }

  test("perGroupRanked ranks survive a repartitioned partial merge") {
    val df = sample.repartition(13)
    val got = TopK.perGroupRanked(
        df, Seq("grp"), Seq(col("score").desc, col("id")), 4)
      .groupBy("grp").agg(collect_set(col("rank")).as("ranks"))
      .select("ranks").as[Seq[Int]].collect()
    assert(got.forall(_.sorted == Seq(1, 2, 3, 4)))
  }

  test("perGroupRanked refuses a colliding rank column name") {
    val df = Seq(("a", 1L)).toDF("grp", "rank")
    val e = intercept[IllegalArgumentException] {
      TopK.perGroupRanked(df, Seq("grp"), Seq(col("rank")), 1)
    }
    assert(e.getMessage.contains("already exists"))
  }
}
