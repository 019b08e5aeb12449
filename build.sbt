ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "distributed_graph_database_systemspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// suites share one SparkSession in the forked JVM; run them serially
Test / parallelExecution := false
run / fork := true
// forked run output passes through UNPREFIXED: the driver parses Bench's
// final JSON line from stdout, and sbt's default logger would wrap it in
// "[info] " (BENCH_r01/r02 both came back "parsed": null because of that)
run / outputStrategy := Some(StdoutOutput)
// ...and the trailing "[success] Total time: ..." line sbt prints after a
// run eats ~70 chars of the driver's 2000-char stdout tail window that
// Bench's JSON line must fit inside — suppress it (exit codes still flow)
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
  // 32 executor threads churn through an 8g heap fast enough that full GCs
  // dominate bench variance (d3 measured 8s..41s across runs); 16g on the
  // 128 GiB harness keeps timings stable
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
