package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway floor-decomposition probe: where do the ~100 ms per tiny
  * query go in local mode? Times trivial plans in a warm session. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.explainMode",
        sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_MODE", "formatted"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(name: String)(f: => Unit): Unit = {
      f // warmup
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$name%-40s median=${times.sorted.apply(2)}%8.1f ms")
    }
    {
      val rdd = spark.sparkContext.parallelize(Seq(1), 1)
      rdd.count()
      val xs = (1 to 30).map { _ =>
        val t0 = System.nanoTime(); rdd.count(); (System.nanoTime() - t0) / 1e6
      }
      println("rdd count distribution: " +
        xs.map(x => f"$x%.0f").mkString(" "))
    }
    t("rdd parallelize(1).count")(
      spark.sparkContext.parallelize(Seq(1), 1).count())
    t("rdd parallelize(1,32).count")(
      spark.sparkContext.parallelize(1 to 32, 32).count())
    val one = spark.range(1); one.count()
    t("prebuilt range(1).count")(one.count())
    t("range(1).queryExecution only") {
      val df = spark.range(1).toDF()
      df.queryExecution.executedPlan
    }
    t("range(1).count")(spark.range(1).count())
    t("range(1) executeCollect direct") {
      val qe = spark.range(1).toDF().queryExecution
      qe.executedPlan.executeCollect()
    }
    t("range(1) agg-count executeCollect direct") {
      val qe = spark.range(1).groupBy().count().queryExecution
      qe.executedPlan.executeCollect()
    }
    t("range(1).count AQE off") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try spark.range(1).count()
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    t("range(1e6).count")(spark.range(1000000).count())
    t("range groupBy(id%10).count")(
      spark.range(1000000).groupBy(expr("id % 10")).count().count())
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    t("events scan count")(ev.count())
    t("events fresh-read count")(
      spark.read.parquet(s"$sfDir/events.parquet").count())
    t("events agg min/max")(
      ev.agg(min(col("event_id")), max(col("event_id"))).count())
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    t("lineitem scan count")(li.count())
    t("lineitem groupBy flag sum(qty)")(
      li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity"))).count())
    t("a5_bounds via SparkEntry")(
      SparkEntry.queries("a5_bounds")(spark, sfDir).count())
    t("f13_list_hof via SparkEntry")(
      SparkEntry.queries("f13_list_hof")(spark, sfDir).count())

    t("spark.read.parquet(events) relation") {
      spark.read.parquet(s"$sfDir/events.parquet"); ()
    }
    locally {
      val df = SparkEntry.queries("j6_q5_region")(spark, sfDir)
      df.queryExecution.executedPlan
      val t0 = System.nanoTime()
      val qe = SparkEntry.queries("j6_q5_region")(spark, sfDir).queryExecution
      val ta = System.nanoTime(); qe.analyzed
      val tb = System.nanoTime(); qe.optimizedPlan
      val tc = System.nanoTime(); qe.executedPlan
      val td = System.nanoTime()
      println(f"j6 construct=${(ta-t0)/1e6}%.1f analyze=${(tb-ta)/1e6}%.1f " +
        f"optimize=${(tc-tb)/1e6}%.1f physical=${(td-tc)/1e6}%.1f ms")
    }

    // planning cost alone (construct + analyze + optimize + physical):
    for (q <- Seq("a5_bounds", "w6_weekend", "dedup_ngram_jaccard",
        "dedup_minhash_pairs_portable", "j6_q5_region", "dedup_bloom_cross")) {
      SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
        (System.nanoTime() - t0) / 1e6
      }
      println(f"plan-only $q%-30s median=${times.sorted.apply(2)}%7.1f ms")
    }

    // stage anatomy of one tiny query: where do the ms go?
    import org.apache.spark.scheduler._
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val lst = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        events.add(f"job${j.jobId} start t=${j.time}")
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        events.add(f"job${j.jobId} end   t=${j.time}")
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val run = i.completionTime.get - i.submissionTime.get
        events.add(f"  stage${i.stageId} tasks=${i.numTasks} wall=${run}ms")
      }
    }
    spark.sparkContext.addSparkListener(lst)
    val q = SparkEntry.queries("w6_weekend")(spark, sfDir)
    q.count()
    events.clear()
    val t0 = System.nanoTime()
    q.count()
    val wall = (System.nanoTime() - t0) / 1e6
    Thread.sleep(500)
    println(f"w6_weekend wall=${wall}%.1f ms")
    events.forEach(e => println("  " + e))
    spark.stop()
  }
}
