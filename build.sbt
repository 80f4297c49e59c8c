ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "telemetrystreamingspark"
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
// Forked run output passes through RAW (no "[info] " logger prefix):
// Bench prints one machine-parsed JSON line to stdout, and the prefix
// breaks downstream parsers.
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
// Single source of truth for the driver heap: -Xmx always uses it, and
// the SPARK_GRAFT_PRETOUCH branch reuses the same value for -Xms so the
// two can never diverge into -Xms > -Xmx (which the JVM refuses).
val driverMem = sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
  // Bench/Verify run 150+ distinct codegen'd queries in one JVM; the
  // default 240 MB code cache fills and flips hot paths back to the
  // interpreter (multi-second stalls on decimal-heavy aggregates).
  "-XX:ReservedCodeCacheSize=512m",
) ++ (
  // A lazily-grown heap pays one minor page fault per fresh 4 KB page;
  // on a host where fault servicing degrades (measured on this eval
  // box: ~130 MB/s fault-in vs 7.5 GB/s pre-touched writes — a ~50×
  // swing that slowed every scan-heavy query ~3.5×), that tax lands
  // INSIDE query timings. SPARK_GRAFT_PRETOUCH=1 fronts the whole
  // cost at JVM start: commit the full heap (-Xms=-Xmx) and touch it
  // (AlwaysPreTouch) before any query runs.
  if (sys.env.getOrElse("SPARK_GRAFT_PRETOUCH", "0") == "1")
    Seq(s"-Xms$driverMem", "-XX:+AlwaysPreTouch")
  else Seq.empty
)
