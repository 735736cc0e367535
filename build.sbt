ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lucenespark"
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
// forward sbt's stdin to the forked app (graft.Cli serve reads queries)
run / connectInput := true
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
  // G1 with a pause target for the DRIVER/serving JVM: the catalog and
  // latency phases are pause-sensitive, and measured ParallelGC runs
  // showed 2-3 s stop-the-world pauses landing on random query rows
  // (34 pauses / 10.1 s total over one catalog pass vs G1's 71 / 1.0 s,
  // max 33 ms; catalog median sum 41.4 s -> 35.0 s). The scaling-phase
  // child JVMs (IndexBenchChild) keep their own ParallelGC flags — bulk
  // index-build throughput stays on the batch collector, like a real
  // deployment that runs executors and driver with different GCs.
  "-XX:+UseG1GC", "-XX:MaxGCPauseMillis=100",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
