ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "paqarinspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ——— parallel forked test groups ———
// One sequential JVM ran the 545-test suite in 9.5-17 min depending on the
// machine phase; the round-19 harness run aborted mid-suite (a parquet
// fixture write died when the SparkContext was shut down under it — the
// signature of an external wall-clock kill). Suites are independent (each
// has its own fixtures; shared state is only the per-JVM TestSpark
// session), so run them as N forked JVMs in parallel, each with its own
// SparkContext — no shared-session conf races by construction. Weights
// are measured suite seconds (slow-phase run); LPT greedy keeps the bins
// level. GRAFT_TEST_FORKS=1 restores the old single-JVM posture.
val testForks = math.max(1, sys.env.getOrElse("GRAFT_TEST_FORKS", "4").toInt)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value
  val base = baseDirectory.value
  val w: Map[String, Int] = Map(
    "DifferentialFuzzSpec" -> 250, "StatefulSpec" -> 200,
    "MixtureSpec" -> 115, "FrameOpsSpec" -> 77, "StreamingSpec" -> 67,
    "ExtSpec" -> 34, "ApiSpec" -> 27, "PropertySpec" -> 23, "PqSpec" -> 22,
    "PlanContractSpec" -> 20, "RuleGatesSpec" -> 15)
  def weight(t: TestDefinition): Int =
    w.getOrElse(t.name.split('.').last, 8)
  val bins = Vector.fill(testForks)(
    scala.collection.mutable.ListBuffer.empty[TestDefinition])
  val loads = scala.collection.mutable.ArrayBuffer.fill(testForks)(0)
  tests.sortBy(t => (-weight(t), t.name)).foreach { t =>
    val i = loads.indexOf(loads.min)
    bins(i) += t
    loads(i) += weight(t)
  }
  bins.zipWithIndex.filter(_._1.nonEmpty).map { case (b, i) =>
    Tests.Group(s"graft-tests-g$i", b.toVector,
      Tests.SubProcess(ForkOptions()
        .withWorkingDirectory(base)
        .withRunJVMOptions(opts.toVector)))
  }
}
// sbt's default restrictions cap ForkedTestGroup at 1; allow N, keep the
// overall task cap at the core count
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testForks),
  Tags.limitAll(math.max(testForks + 1,
    java.lang.Runtime.getRuntime.availableProcessors)))
