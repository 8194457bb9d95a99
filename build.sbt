ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "insightpatentsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Suites share one SparkSession WITHIN a JVM, and the iterative graph
// loops pin session-global conf (AQE, shuffle width) for their
// duration — parallel suites in one JVM could race those pins against
// the plan-shape assertions in PlanAuditSpec. Serialize within each
// forked JVM: Spark jobs queue on that JVM's scheduler anyway.
Test / parallelExecution := false

// r15 (VERDICT r14 next-round #1): the serial suite was 46:44 wall and
// the driver's `sbt test` capture expired mid-run (tests_ok: false
// with zero failing assertions). Suites are independent across JVMs —
// each forked group builds its own SparkSession on local[4] — so run
// them as 4 CONCURRENT forked JVMs (4 × local[4] = 16 of 32 cores,
// 4 × 8g heap in the 128 GiB box), suites serialized inside each
// group as before. Grouping is LPT bin-packing over measured suite
// seconds (the r15 `-oD` timing run); unlisted/new suites default
// small. Only BucketingSpec writes catalog tables (one group, no
// cross-JVM table clash); all other suites use per-test tempDir()
// fixtures. `sbt test` output and the final pass/fail summary are
// unchanged — only the wall clock moves (~46 → ~12 min).
val testGroupCount = 4
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector)
  val weight: Map[String, Long] = Map(
    "graft.SqlSweepSpec" -> 473L, "graft.PlanAuditSpec" -> 189L,
    "graft.OperatorSmokeSpec" -> 176L, "graft.Round4fSpec" -> 77L,
    "graft.Round4eSpec" -> 57L, "graft.Round4cSpec" -> 50L,
    "graft.Round3bSpec" -> 47L, "graft.Round4Spec" -> 45L,
    "graft.Round5Spec" -> 45L, "graft.StreamPortSpec" -> 43L,
    "graft.Round8Spec" -> 39L, "graft.Round6Spec" -> 34L,
    "graft.Round4dSpec" -> 33L, "graft.Round13Spec" -> 33L,
    "graft.Round9Spec" -> 30L, "graft.Round15Spec" -> 26L,
    "graft.RocksDbStateSpec" -> 21L)
  val buckets = Array.fill(testGroupCount)(
    scala.collection.mutable.ListBuffer.empty[TestDefinition])
  val load = Array.fill(testGroupCount)(0L)
  // LPT: heaviest first, each into the currently lightest bucket —
  // deterministic (ties break by suite name via the stable sort)
  tests.sortBy(t => (-weight.getOrElse(t.name, 15L), t.name)).foreach { t =>
    val i = load.zipWithIndex.minBy(_._1)._2
    buckets(i) += t
    load(i) += weight.getOrElse(t.name, 15L)
  }
  buckets.zipWithIndex.toSeq.map { case (ts, i) =>
    Tests.Group(s"g$i", ts.toSeq, Tests.SubProcess(opts))
  }
}
// sbt's default concurrentRestrictions cap forked test groups at 1 —
// lift it so the groups actually run concurrently
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(java.lang.Runtime.getRuntime.availableProcessors, 4)),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
run / fork := true
// Pass the forked main's stdout straight through (no "[info] " log
// prefix): the driver parses Bench/Verify stdout lines as bare JSON,
// and a LoggedOutput prefix breaks that (BENCH_r02 "parsed": null).
run / outputStrategy := Some(StdoutOutput)
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
