ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streamloaderspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Per-test durations in the report (round 16): the r15 driver run was
// killed mid-suite on wall time — without -oD the suite's time sinks
// are invisible, so every budget fix would be a guess.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
Test / logBuffered := false
// Round 16 (r15 verdict item 1 — the driver killed the r15 gate on test
// wall): the 37 suites ran sequentially in ONE forked JVM, 92.5 min in
// this round's baseline run. The suites are independent (each owns its
// SparkSession over immutable sf0.001 fixtures and private temp dirs),
// so they now fork as round-robin groups of parallel JVMs. Heap per
// test JVM is 6g, not the bench's 48g: these are local[2..4] sessions
// over sf0.001 — the big heap exists for the local[32] sf0.1 bench and
// would overcommit the box 37-fold here.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.filterNot(_.startsWith("-Xmx")) :+ "-Xmx6g"
  val fork = ForkOptions().withRunJVMOptions(opts.toVector)
  val n = 8
  tests.sortBy(_.name).zipWithIndex
    .groupBy(_._2 % n).toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"group$i", ts.map(_._1), Tests.SubProcess(fork))
    }
}
run / fork := true
// Forked run output goes straight to stdout/stderr WITHOUT sbt's
// "[info] " line prefix, so Bench's single JSON line stays parseable by
// anything doing json.loads per line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // local[32] + 145 sequential queries + streaming epochs churn enough
  // to GC-bind an 8g heap (measured: 71 s total / 43k rows/s at 8g vs
  // 61 s / 61k rows/s at 24g on the sf0.1 bench; the slow-query spikes
  // move between runs — classic GC pressure, not per-query cost). At the
  // round-5 query count 48g shaves another ~20-30% off the ex-spike
  // session total vs 24g. The bench box has 128 GiB; give the
  // single-JVM driver+executors room.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
// sbt serializes forked test groups by default (ForkedTestGroup limit
// 1) — lift it so the groups above actually run concurrently.
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 8),
  Tags.limitAll(16))
