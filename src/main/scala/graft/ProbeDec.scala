package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway probe: decimal-arithmetic tax on the revenue aggregates.
  * Variants: (a) decimal mult + decimal sum (current), (b) scaled-long
  * mult + long sum (overflows at extreme scale), (c) scaled-long mult +
  * decimal(38) sum (scale-safe, multiply stays in long). */
object ProbeDec {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = sources.Tables.load(spark, "/root/testdata/sf0.1", "lineitem")
    def bench(name: String, df: DataFrame): Unit = {
      val planned = df.groupBy().count().queryExecution.executedPlan
      planned.clone().execute().count()
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); planned.clone().execute().count()
        (System.nanoTime() - t0) / 1e6
      }
      println(f"$name%-22s ${ts.sorted.apply(1)}%8.1f ms")
      df.orderBy("l_returnflag").show(3, false)
    }
    bench("decimal", li.groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_extendedprice").cast("decimal(18,2)")
        * (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))), 2)
        .cast("double").as("revenue")))
    bench("long-long", li.groupBy(col("l_returnflag"))
      .agg((sum(round(col("l_extendedprice") * 100).cast("long")
        * (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
        .cast("decimal(38,0)") / 1000000).cast("decimal(38,2)").cast("double").as("revenue")))
    bench("long-dec38", li.groupBy(col("l_returnflag"))
      .agg((sum((round(col("l_extendedprice") * 100).cast("long")
        * (lit(10000L) - round(col("l_discount") * 10000).cast("long")))
        .cast("decimal(30,0)"))
        / 1000000).cast("decimal(38,2)").cast("double").as("revenue")))
    spark.stop()
  }
}
