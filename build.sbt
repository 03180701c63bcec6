ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "oem_gatewayspark"
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
// The bench/driver contract requires the one-line JSON printed by
// graft.Bench to be the LAST stdout line (VERDICT r20 #1: the driver
// could not parse BENCH_r19/r20 because output followed the JSON).
// Two sbt behaviours broke that under `sbt "runMain graft.Bench"`:
//  - forked run output is routed through sbt's logger by default
//    (stdout tagged per-line, stderr re-logged as [error] AFTER the
//    program's stdout) — StdoutOutput passes both streams through raw
//    and in order instead;
//  - sbt prints "[success] Total time: ..." after the run returns —
//    showSuccess=false drops that epilogue (exit codes are unchanged).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// both keys are consumed by sbt itself, not by a task in this build —
// exclude them from the unused-setting lint so its [warn] lines don't
// land on stdout ahead of the bench contract line
Global / excludeLintKeys ++= Set(run / outputStrategy, showSuccess)
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
