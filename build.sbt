ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "covid19flspark"
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
// Forked run output goes straight to this process's stdout instead of
// through sbt's logger: the logger prefixes every line with "[info] ",
// which breaks machine parsing of Bench's single-line JSON metric (the
// driver's parser has recorded `parsed: null` in every round because of
// that prefix). StdoutOutput emits the line byte-for-byte.
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
  // 32g default on the 128 GiB harness machine: the full bench holds
  // memoized corpora/cells/stores for two SFs plus per-rep pipeline
  // checkpoints, and under the old 8g default (~4.6 GiB block store)
  // eviction churn inflated every query sharing the JVM — the r13 local
  // bench measured q87 at 4.7 s in-bench vs 1.7 s solo from exactly
  // this pressure. Override with SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
