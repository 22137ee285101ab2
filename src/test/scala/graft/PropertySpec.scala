package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeSeriesOps

/** Property tests over seeded random frames (SURVEY §5.2 item 2). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randomSeries(seed: Int, entities: Int, maxLen: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until entities).flatMap { e =>
      val n = 1 + rnd.nextInt(maxLen)
      (0 until n).map(t => (s"e$e", t.toLong, rnd.nextDouble() * 100))
    }.toDF("id", "pos", "v")
  }

  test("property: window count == sum over entities of max(0, n_e - L + 1)") {
    (1 to 3).foreach { seed =>
      val df = randomSeries(seed, 6, 30).cache()
      val L = 2 + seed
      val expected = df.groupBy("id").count()
        .as[(String, Long)].collect()
        .map { case (_, n) => math.max(0L, n - L + 1) }.sum
      val got = TimeSeriesOps.slidingWindows(df, "id", "pos", Seq("v"), L).count()
      assert(got == expected, s"seed=$seed L=$L")
      df.unpersist()
    }
  }

  test("property: resample-sum preserves per-entity totals") {
    val rnd = new scala.util.Random(4)
    val df = (0 until 500).map { i =>
      (s"e${i % 7}",
        java.sql.Timestamp.valueOf(
          f"2024-01-${1 + rnd.nextInt(28)}%02d ${rnd.nextInt(24)}%02d:00:00"),
        rnd.nextInt(1000).toDouble) // integral values: sums exact
    }.toDF("id", "ts", "v")
    val before = df.groupBy("id").agg(sum("v")).orderBy("id")
      .as[(String, Double)].collect().toSeq
    val after = TimeSeriesOps.resampleSum(df, "id", "ts", Seq("v"))
      .groupBy("id").agg(sum("v")).orderBy("id")
      .as[(String, Double)].collect().toSeq
    assert(before == after)
  }

  test("property: surrogate keys are a dense bijection on distinct entity tuples") {
    val rnd = new scala.util.Random(8)
    val df = (0L until 400L).map(i =>
      (s"g${rnd.nextInt(13)}", rnd.nextInt(3), i)).toDF("k1", "k2", "ord")
    val keyed = TimeSeriesOps.addSurrogateKey(df, Seq("k1", "k2"), "ord").cache()
    val nDistinct = df.select("k1", "k2").distinct().count()
    val ids = keyed.select("surrogate_item_id").distinct()
      .as[Int].collect().sorted.toSeq
    assert(ids == (0 until nDistinct.toInt)) // dense 0..k-1
    // bijective: every (k1,k2) maps to exactly one id and vice versa
    assert(keyed.select("k1", "k2", "surrogate_item_id").distinct().count() == nDistinct)
    keyed.unpersist()
  }

  test("property: calendarFill emits entities x days rows and preserves sums") {
    val df = Seq(("a", "2024-01-01", 5.0), ("a", "2024-01-04", 7.0),
      ("b", "2024-01-02", 11.0))
      .toDF("id", "d", "v")
      .withColumn("bucket", to_timestamp(col("d")))
    val filled = TimeSeriesOps.calendarFill(df.select("id", "bucket", "v"),
      "id", "bucket", Seq("v"))
    assert(filled.count() == 2 * 4) // 2 entities x [Jan 1, Jan 4]
    val total = filled.agg(sum("v")).head().getDouble(0)
    assert(total == 23.0) // zero fill adds nothing
  }
}
