package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution

/** Throwaway probe: decompose Dataset.count()'s per-rep cost — analysis,
  * optimization, physical planning, execution — and measure a
  * fresh-QueryExecution-from-cached-optimized-plan rep (re-executes every
  * stage: new exchange nodes = new shuffle deps, no map-output reuse). */
object ProbeCount {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("dedup_bloom_cross", "j6_q5_region", "dedup_simhash_pairs_portable",
        "q3_star_join", "f16_regex", "a5_bounds", "w6_weekend", "dedup_ngram_jaccard")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def ms(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.count() // warm: codegen cache, JIT, parquet footers
      val t1 = (1 to 3).map(_ => ms(df.count())).sorted.apply(1)
      val cnt = df.groupBy().count()
      val qe0 = cnt.queryExecution
      val tAna = ms(qe0.analyzed)
      val tOpt = ms(qe0.optimizedPlan)
      val tPhy = ms(qe0.executedPlan)
      val opt = qe0.optimizedPlan
      val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      // fresh QE from the cached optimized plan per rep
      val t2 = {
        new QueryExecution(classic, opt).toRdd.count() // warm this path
        (1 to 3).map { _ =>
          ms(new QueryExecution(classic, opt).toRdd.count())
        }.sorted.apply(1)
      }
      println(f"$n%-30s count()=$t1%7.1f  ana=$tAna%6.1f opt=$tOpt%6.1f phy=$tPhy%6.1f  freshQE=$t2%7.1f ms")
    }
    spark.stop()
  }
}
