ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "intelligencepipelinespark"
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
// `runMain` is a separate task key from `run` — without these, a driver
// invoking `sbt "runMain graft.Bench"` runs INSIDE the sbt JVM (default
// 240m JIT code cache, no add-opens), which measured 5-12x slower on the
// codegen-heavy dedup queries than the same code in a properly-flagged JVM.
Compile / runMain / fork := true
Test / runMain / fork := true
// Pipe the forked child's stdout/stderr straight through instead of
// re-logging with [info]/[error] prefixes: the driver parses Bench's final
// stdout line as JSON, and a "[info] " prefix breaks that (BENCH_r01/r02
// both show "parsed": null with the JSON visible but prefixed in the tail).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and suppress sbt's trailing "[success] Total time: ..." epilogue so the
// bench JSON is the LAST stdout line, whether the harness parses the last
// line or scans for one.
Global / showSuccess := false
Global / showTiming := false
Global / excludeLintKeys ++= Set(
  Compile / runMain / fork, Test / runMain / fork,
  run / outputStrategy, Compile / runMain / outputStrategy)
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
  // whole-stage codegen across many queries exhausts the default 240m
  // JIT code cache -> everything silently degrades to interpreted
  "-XX:ReservedCodeCacheSize=1g",
)
