package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: stage-level breakdown of one query's warm clone rep. */
object ProbeJ6 {
  def main(args: Array[String]): Unit = {
    val name = if (args.length > 0) args(0) else "j6_q5_region"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var show = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (show) {
          val m = s.stageInfo.taskMetrics
          println(f"  stage ${s.stageInfo.stageId}%3d tasks=${s.stageInfo.numTasks}" +
            f" run=${m.executorRunTime}%5d cpu=${m.executorCpuTime / 1000000}%5d" +
            f" deser=${m.executorDeserializeTime}%4d gc=${m.jvmGCTime}%4d" +
            f" ser=${m.resultSerializationTime}%3d  ${s.stageInfo.name.takeWhile(_ != '\n').take(50)}")
        }
    })
    val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.1")
    df.count()
    val planned = df.groupBy().count().queryExecution.executedPlan
    planned.clone().execute().count()
    Thread.sleep(400)
    (1 to 2).foreach { i =>
      show = true
      val t0 = System.nanoTime()
      planned.clone().execute().count()
      val wall = (System.nanoTime() - t0) / 1e6
      Thread.sleep(400)
      show = false
      println(f"rep$i wall=$wall%7.1f ms")
    }
    spark.stop()
  }
}
