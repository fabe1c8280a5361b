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
  // 20g default (was 8g): the bench JVM is driver + 32 in-process executor
  // threads + per-job persisted result caches across a 126-query sweep; at
  // 8g the old gen ran 85-99% full mid-sweep with repeated full GCs —
  // single-sample bench runs then carry multi-second GC-pause outliers
  // (guide §5 memory pressure; BENCH_r05's driver re-bench showed 10-50x
  // per-query outliers of exactly this shape). The box is 128 GiB; worst
  // concurrent case (scaling phase: driver 20g + 4 executor JVMs x 8g)
  // stays under half of it.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  // Xms=Xmx + pre-touch: without it the heap grows lazily and the run pays
  // first-touch page faults spread across the TIMED queries (measured:
  // an Xmx-20g lazy heap added +0.1-0.5 s to sub-second queries vs 8g;
  // pre-touching moves that cost into JVM startup, which nothing times).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
  "-XX:+AlwaysPreTouch",
) ++ {
  // Executor-JVM sizing for the local-cluster scaling runs (read from the
  // driver's system properties by every SparkSession this JVM creates).
  // A containerized cluster executor sees ITS OWN cpu/memory limits;
  // local-cluster executor JVMs instead size GC/JIT thread pools by the
  // whole host (32 cpus -> ~23 GC + ~16 C2 threads per 4-core executor)
  // and grow their heaps lazily, paying first-touch page faults inside the
  // first timed reps. ActiveProcessorCount pins pool sizing to the
  // executor's core entitlement exactly as a cgroup-limited container
  // does, and Xms=Xmx + AlwaysPreTouch moves the page-fault cost into
  // executor startup (untimed) — measured on the 16M-row protocol:
  // n=1 90.5->72.5 s, n=4 best 28.9->16.5 s, efficiency 0.57->1.10, and
  // the 4x cold-rep outliers (119 s first reps) disappear. Parameterized
  // by the same env vars Bench reads, so a different scale configuration
  // stays consistent.
  val execMemMb = sys.env.getOrElse("SPARK_GRAFT_SCALE_MEM_MB", "8192")
  val execCores = sys.env.getOrElse("SPARK_GRAFT_SCALE_CORES", "4")
  Seq(s"-Dspark.executor.extraJavaOptions=-Xms${execMemMb}m -XX:+AlwaysPreTouch -XX:ActiveProcessorCount=$execCores")
}
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
