package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE OFF for the local microbenchmark: its value — runtime re-plans
      // under stats uncertainty, partition coalescing, skew splitting — is
      // a cluster-scale property, while locally every adaptive stage is a
      // separate job whose materialization barrier (~15-40 ms) dominates
      // sub-second queries. Plans are AQE-safe either way (broadcast and
      // shuffle_hash hints are explicit where misestimates bite; see
      // ext/Dedup.scala); at-scale sessions should run AQE on, and
      // SPARK_GRAFT_AQE=true measures that posture here.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      // 78 queries × ~5 codegen fragments overflow the default 100-entry
      // compile cache across the run (static conf, must be set pre-session)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // steady-state timing: one untimed warmup run (JIT, codegen cache,
    // parquet footers), then the median of 3 timed runs — single runs at
    // this scale are dominated by scheduler jitter (±30% observed)
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    // focused A/B runs: SPARK_GRAFT_BENCH_ONLY=q1,q2 benches a subset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    only.foreach(_.diff(SparkEntry.queries.keySet).foreach(n =>
      System.err.println(s"[bench] WARNING: unknown query '$n' in " +
        "SPARK_GRAFT_BENCH_ONLY (typo would silently bench nothing)")))
    val selected = only.fold(SparkEntry.queries)(s =>
      SparkEntry.queries.filter { case (n, _) => s.contains(n) })
    val results = selected.map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      // drain warmup garbage OUTSIDE the timed region: 77 other queries'
      // allocation pressure otherwise lands GC pauses inside someone
      // else's timing (observed ~2× inflation on heavy queries in-bench
      // vs isolated)
      System.gc()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
        // failures are reported as -1, never as a plausible timing
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val median =
        if (times.contains(-1.0)) -1.0
        else {
          val s = times.sorted
          // true median: average the middle two when reps is even
          if (reps % 2 == 1) s(reps / 2) else (s(reps / 2 - 1) + s(reps / 2)) / 2.0
        }
      name -> median
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // also land the result as a file: the driver's log tail truncates long
    // lines, which made BENCH_r02.json unparseable mid-JSON
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (line + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $out: ${e.getMessage}")
    }
    spark.stop()
  }
}
