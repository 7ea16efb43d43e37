ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "scalabledataingestionspark"
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
// Pass the forked JVM's stdout through RAW (no "[info] " logger prefix):
// the round driver tail-captures stdout and parses the benchmark's final
// JSON line, which must start with '{' at column 0 to be machine-readable.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and sbt's closing "[success] Total time: ..." line would land AFTER
// that JSON line, eating ~60 chars of the driver's ~2000-char stdout tail
// (the compact bench line sits at ~1886 chars at 191 queries). Suppress it
// so the JSON line IS the last stdout line.
Global / showSuccess := false
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
  // With the codegen class cache raised (Bench.scala), ~2-3k generated
  // classes stay live and JIT-compiled across the suite; the JVM's
  // default 240 MB code cache would silently stop JIT compilation when
  // full, flipping late-suite queries to interpreted generated code.
  "-XX:ReservedCodeCacheSize=512m",
)
