package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.ProbeSupport.time

/** Scaling probe for the near-dup CLUSTERING operator's distributed path
  * (label propagation over the LSH pair graph): the oracle corpora are small
  * enough that `nearDupClusters` always takes the driver union-find branch,
  * so this probe measures the label-propagation fixpoint at a size where the
  * DataFrame path is forced (`smallGraphEdges = 0`) — the number BASELINE.md
  * records for the clustering row.
  *
  * Corpus: deterministic template families of `famSize` near-duplicate docs
  * (40 shared family words + 3 per-variant words -> within-family Jaccard
  * ~0.8, cross-family ~0). Families are 4-doc near-cliques in the pair
  * graph, matching the real shape (banded LSH components are near-cliques,
  * VERDICT r2): n docs -> ~n/famSize * C(famSize,2) verified edges.
  *
  * Env: PROBE_DOCS (default 1,000,000), PROBE_CPUS (default 32),
  * PROBE_FAM (default 4).
  */
object ScaleProbeCluster {
  private def deleteRecursively(f: File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }

  def corpus(spark: SparkSession, nDocs: Long, famSize: Int): DataFrame = {
    val fam = (col("id") / famSize).cast("long")
    val family = (0 until 40).map(k =>
      concat(lit("w"), pmod(xxhash64(fam, lit(k)), lit(50000L))))
    val variant = (0 until 3).map(j => concat(lit("v"), col("id"), lit("x"), lit(j)))
    spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", family ++ variant: _*).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("PROBE_DOCS", "1000000").toLong
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    val famSize = sys.env.getOrElse("PROBE_FAM", "4").toInt
    val shm = new File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) "/dev/shm" else System.getProperty("java.io.tmpdir")
    val root = Files.createDirectory(
      Paths.get(base, s"probe3-cluster-${ProcessHandle.current().pid()}")).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cluster-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", s"$root/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val in = s"$root/docs"
      corpus(spark, nDocs, famSize).write.mode("overwrite").parquet(in)
      val docs = spark.read.parquet(in)

      // warmup at quarter size: JIT the codegen paths, not a measurement
      graft.ml.TextDedup.nearDupClusters(
        docs.filter(col("doc_id") < nDocs / 4), 0.5, smallGraphEdges = 0L)
        .agg(count(lit(1))).collect()

      val (edges, pairSecs) = time {
        graft.ml.TextDedup.minhashLshPairs(docs, 0.5).count()
      }
      val ((nRows, nClusters), clusterSecs) = time {
        val labels = graft.ml.TextDedup.nearDupClusters(docs, 0.5, smallGraphEdges = 0L)
        val r = labels.agg(count(lit(1)), count_distinct(col("cluster_id"))).head()
        (r.getLong(0), r.getLong(1))
      }
      // chunk-level dedup on the same corpus (PROBE_CHUNK=0 skips): same
      // families -> later family members' chunks all drop to the first
      val chunkJson = if (sys.env.getOrElse("PROBE_CHUNK", "1") == "1") {
        val ((kept, total), chunkSecs) = time {
          val r = graft.ml.TextDedup.chunkDedup(docs)
            .agg(sum(col("n_kept")), sum(col("n_chunks"))).head()
          (r.getLong(0), r.getLong(1))
        }
        f""","chunk_secs":$chunkSecs%.2f,"chunks_total":$total,"chunks_kept":$kept""" +
          f""","chunk_docs_per_sec":${nDocs / chunkSecs}%.0f"""
      } else ""
      println(f"""{"probe":"cluster","docs":$nDocs,"fam":$famSize,"edges":$edges,""" +
        f""""pair_secs":$pairSecs%.2f,"cluster_secs":$clusterSecs%.2f,""" +
        f""""rows":$nRows,"clusters":$nClusters,""" +
        f""""docs_per_sec":${nDocs / clusterSecs}%.0f""" + chunkJson + "}")
    } finally {
      spark.stop()
      deleteRecursively(new File(root))
    }
  }
}
