package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Scaling

/** F6 golden values (F-3: sklearn-doc example, tests/test_doppleganger.py:42-57,
  * tests/test_timegan.py:39-57) + round-trip property. */
class ScalingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F6 min-max scaling matches the sklearn-doc golden frame") {
    val df = Seq((-1.0, 2.0), (-0.5, 6.0), (0.0, 10.0), (1.0, 18.0))
      .toDF("feature_1", "feature_2")
    val stats = Scaling.fit(df, Seq("feature_1", "feature_2"))
    val scaled = stats.transform(df).orderBy("feature_1")
    val f1 = scaled.select("feature_1").as[Double].collect().toSeq
    val f2 = scaled.select("feature_2").as[Double].collect().toSeq
    assert(f1 == Seq(0.0, 0.25, 0.5, 1.0))
    assert(f2 == Seq(0.0, 0.25, 0.5, 1.0))
  }

  test("F6 inverse transform round-trips exactly on the golden frame") {
    val df = Seq((-1.0, 2.0), (-0.5, 6.0), (0.0, 10.0), (1.0, 18.0))
      .toDF("feature_1", "feature_2")
    val stats = Scaling.fit(df, Seq("feature_1", "feature_2"))
    val back = stats.inverse(stats.transform(df)).orderBy("feature_1")
    assert(back.select("feature_1").as[Double].collect().toSeq
      == Seq(-1.0, -0.5, 0.0, 1.0))
    assert(back.select("feature_2").as[Double].collect().toSeq
      == Seq(2.0, 6.0, 10.0, 18.0))
  }

  test("property: inverse(transform(x)) ≈ x over seeded random frames") {
    val rnd = new scala.util.Random(7)
    (1 to 5).foreach { _ =>
      val xs = List.fill(50)(rnd.nextDouble() * 2e6 - 1e6)
      val df = xs.toDF("v")
      val stats = Scaling.fit(df, Seq("v"))
      val back = stats.inverse(stats.transform(df)).as[Double].collect()
      assert(back.sorted.zip(xs.sorted).forall { case (b, a) =>
        math.abs(b - a) <= math.max(1e-9, math.abs(a) * 1e-9) })
    }
  }

  test("constant column scales to 0.0 (zero-range guard)") {
    val df = Seq(5.0, 5.0, 5.0).toDF("v")
    val stats = Scaling.fit(df, Seq("v"))
    assert(stats.transform(df).as[Double].collect().forall(_ == 0.0))
  }

  test("scaleWithinGroups: per-group window variant matches per-group fit") {
    val df = Seq(("a", 0.0), ("a", 10.0), ("b", 5.0), ("b", 15.0))
      .toDF("g", "v")
    val got = Scaling.scaleWithinGroups(df, Seq("g"), "v", "s")
      .orderBy("g", "v").select("s").as[Double].collect().toSeq
    assert(got == Seq(0.0, 1.0, 0.0, 1.0))
  }
}
