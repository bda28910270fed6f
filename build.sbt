ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dais2021imageprocessingondeltalakespark"
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
// Pass the forked program's stdout through verbatim: the default logged
// strategy prefixes every line with "[info] ", which breaks consumers that
// parse Bench's single JSON output line (BENCH_r01.json: "parsed": null).
outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
// The bench driver keeps only the last ~2000 chars of output and parses a
// JSON line from that window: sbt's "[success] Total time ..." trailer
// would otherwise sit between Bench's final JSON line and the window edge.
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
  // pin the JVM default locale: locale-sensitive lowercasing (tr/az
  // dotted/dotless i) would otherwise make Catalyst lower() and the JVM
  // scoring kernels disagree on such JVMs
  "-Duser.language=en", "-Duser.country=US",
  // 16g default: at 232 bench queries in one local[32] JVM, 8g spends a
  // measurable share of wall in GC (48g measured ~4% faster end-to-end);
  // 16g captures most of that on any host with the 128 GiB this target has
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // pin the heap: G1 gives memory back after full GCs (and the bench's
  // untimed between-query drain triggers those deliberately) — an unpinned
  // heap then shrinks to ~min and the NEXT timed query pays re-expansion
  // and allocation-stall GCs; with Xms=Xmx the drain compacts in place
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
