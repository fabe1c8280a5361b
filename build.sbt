ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "logsuckspark"
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
// Forked process output goes RAW to this process's stdout/stderr — no
// per-line "[info] " decoration. The driver parses the bench's one-line JSON
// from a bounded tail of stdout; an sbt-prefixed line doesn't parse.
outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and drop the trailing "[success] Total time: …" logger line so the
// bench JSON is literally the final stdout line of `sbt "runMain graft.Bench"`.
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not by another setting —
// exclude it from the unused-key lint so the warning doesn't precede the
// bench's stdout JSON.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// local-cluster[...] masters (the N-vs-4N scaling bench) spawn executor JVMs
// through the Spark launcher, which needs these to locate the distribution.
run / envVars ++= Map(
  "SPARK_HOME" -> sys.env.getOrElse("SPARK_HOME", "/opt/spark"),
  "SPARK_SCALA_VERSION" -> "2.13",
) ++ {
  // Shuffle/local dirs on tmpfs: executor JVMs spawned by local-cluster
  // workers read SPARK_LOCAL_DIRS from the worker env (Spark mkdirs the
  // roots itself). Disk writeback of shuffle files was the round-1 scaling
  // bench's main noise source.
  val shm = new java.io.File("/dev/shm")
  if (shm.isDirectory && shm.canWrite)
    Map("SPARK_LOCAL_DIRS" -> "/dev/shm/graft-spark-local") else Map.empty[String, String]
}
// ...and a current app jar (spark.jars) so executors can load graft classes.
Compile / run := (Compile / run).dependsOn(Compile / packageBin).evaluated
Compile / runMain := (Compile / runMain).dependsOn(Compile / packageBin).evaluated
