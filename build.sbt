ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dariadbspark"
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
// Driver bench contract: the bench must end with ONE bare JSON line on
// stdout. sbt's default LoggedOutput routes the forked JVM's stdout
// through the logger (every line prefixed "[info] ") and then prints
// its own "[success] Total time" trailer — the driver's JSON parser
// never saw a bare line in 12 rounds (BENCH_r01..r12 all parsed:null).
// StdoutOutput passes the child's stdout through raw; showSuccess=false
// drops the trailer, so the process's LAST stdout line is Bench's
// total_compact JSON.
run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — lint
// can't see that
Global / excludeLintKeys += showSuccess
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
  // 16g default: the bench JVM holds cached intermediates for the whole
  // query registry; a larger heap keeps GC pauses out of the timings
  // (the machine has 128 GiB). SPARK_DRIVER_MEM still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// Dev diagnostics hook (e.g. GC logging for the 32-thread variance
// investigation): SPARK_GRAFT_JVM_EXTRA="-Xlog:gc*:file=/tmp/gc.log"
javaOptions ++= sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.trim.split("\\s+").toSeq)
