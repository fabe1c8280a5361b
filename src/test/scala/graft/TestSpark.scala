package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Test scratch dirs that do not outlive the test JVM: every suite's
  * temp dirs hang off ONE per-process root that a shutdown hook deletes.
  * Before this, each `sbt test` run left ~50 MB of graft-* dirs in /tmp
  * forever (the bench's sweeper only knows the handful of pid-tagged
  * production prefixes) — repeated CI/driver cycles grew /tmp without
  * bound. Same drop-in shape as `Files.createTempDirectory(prefix)`.
  */
object TestDirs {
  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory(
      s"graft-test-${ProcessHandle.current().pid()}-")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      graft.util.Dirs.deleteRecursively(r.toFile)))
    r
  }
  def tmp(prefix: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(root, prefix)
}
