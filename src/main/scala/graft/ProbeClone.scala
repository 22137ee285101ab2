package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: per-rep cost of (a) fresh QueryExecution from the cached
  * optimized plan vs (b) executedPlan.clone() — both re-execute every stage
  * (fresh exchange instances = fresh shuffle deps); (b) additionally skips
  * re-optimization + physical planning + codegen source generation. */
object ProbeClone {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val sfDir = "/root/testdata/sf0.1"
    val names = Seq("f16_regex", "a5_bounds", "w6_weekend", "u1_union",
      "j6_q5_region", "dedup_ngram_jaccard", "dedup_simhash_pairs_portable")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.count()
      val qe = df.groupBy().count().queryExecution
      val opt = qe.optimizedPlan
      val freshT = {
        new org.apache.spark.sql.execution.QueryExecution(classic, opt).toRdd.count()
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          new org.apache.spark.sql.execution.QueryExecution(classic, opt).toRdd.count()
          (System.nanoTime() - t0) / 1e6
        }.sorted.apply(1)
      }
      val planned = qe.executedPlan
      val cloneT = {
        planned.clone().execute().count()
        (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          planned.clone().execute().count()
          (System.nanoTime() - t0) / 1e6
        }.sorted.apply(1)
      }
      println(f"$n%-30s freshQE=$freshT%7.1f ms  clone=$cloneT%7.1f ms")
    }
    spark.stop()
  }
}
