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

  /** Text of corpus doc `id` as a column expression — factored so the
    * incremental phase can mint EXACT copies of history docs under new ids.
    */
  def textOf(id: org.apache.spark.sql.Column, famSize: Int): org.apache.spark.sql.Column = {
    val fam = (id / famSize).cast("long")
    val family = (0 until 40).map(k =>
      concat(lit("w"), pmod(xxhash64(fam, lit(k)), lit(50000L))))
    val variant = (0 until 3).map(j => concat(lit("v"), id, lit("x"), lit(j)))
    concat_ws(" ", family ++ variant: _*)
  }

  def corpus(spark: SparkSession, nDocs: Long, famSize: Int): DataFrame =
    spark.range(nDocs).select(col("id").as("doc_id"),
      textOf(col("id"), famSize).as("text"))

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

      // ---- incremental near-dup: a small batch probes the PERSISTED band
      // index; the 1M-doc history must neither re-shingle nor cross an
      // exchange (PROBE_INCR=0 skips). Batch = exact copies of every
      // stride-th history doc (sig-identical -> detection GUARANTEED, the
      // closed form) + fresh disjoint docs (any match would be a false
      // positive — band hash collisions are jac-filtered to zero).
      if (sys.env.getOrElse("PROBE_INCR", "1") == "1") {
        import graft.util.ProbeSupport.withStageSum
        val idxDir = s"$root/bandidx"
        val (idxRows, idxSecs) = time {
          graft.ml.TextDedup.bandSigs(docs).write.mode("overwrite").parquet(idxDir)
          spark.read.parquet(idxDir).count()
        }
        val nBatch = 10000L
        val half = nBatch / 2
        val stride = nDocs / half
        val batchDir = s"$root/batch"
        spark.range(half).select((lit(nDocs) + col("id")).as("doc_id"),
            textOf(col("id") * stride, famSize).as("text"))
          .unionByName(spark.range(half).select(
            (lit(nDocs) + lit(half) + col("id")).as("doc_id"),
            concat_ws(" ", (0 until 10).map(k =>
              concat(lit("fresh"), col("id"), lit("q"), lit(k))): _*).as("text")))
          .write.mode("overwrite").parquet(batchDir)
        val batch = spark.read.parquet(batchDir)
        val idx = spark.read.parquet(idxDir)
        graft.ml.TextDedup.incrementalNearDups(
          batch.filter(col("doc_id") < nDocs + 100), docs, 0.5,
          Some(idx)).count() // JIT warmup
        val ((chk, incrSecs), incrShuffle) =
          withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
            time {
              graft.ml.TextDedup.incrementalNearDups(batch, docs, 0.5, Some(idx))
                .agg(count(lit(1)).as("rows"),
                  sum(when(col("dup_of") === (col("new_doc") - nDocs) * stride &&
                    col("jac") === 1.0, 1L).otherwise(0L)).as("exact"),
                  sum(when(col("new_doc") >= nDocs + half, 1L).otherwise(0L))
                    .as("fresh_fp"),
                  sum(when(expr(s"dup_of div $famSize") =!=
                    expr(s"((new_doc - $nDocs) * $stride) div $famSize"), 1L)
                    .otherwise(0L)).as("off_family")).head()
            }
          }
        require(idxRows == nDocs * graft.ml.TextDedup.BANDS,
          s"index rows $idxRows != ${nDocs * graft.ml.TextDedup.BANDS}")
        require(chk.getLong(1) == half,
          s"exact self-matches ${chk.getLong(1)} != $half (guaranteed by sig identity)")
        require(chk.getLong(2) == 0L,
          s"${chk.getLong(2)} fresh-doc false positives")
        require(chk.getLong(3) == 0L,
          s"${chk.getLong(3)} matches outside the copied doc's family")
        // what crosses is BATCH-scale: batch bands + the candidate sliver
        // (self + family matches × bands) — a bound in nBatch, independent
        // of history size. The 8M-row index / 1M-doc history crossing an
        // exchange would add millions and trip this immediately.
        require(incrShuffle <= nBatch * 40,
          s"incremental probe shuffled $incrShuffle records — the index/history crossed")
        println(f"""{"probe":"incr_minhash","history":$nDocs,"batch":$nBatch,""" +
          f""""index_rows":$idxRows,"index_secs":$idxSecs%.2f,""" +
          f""""matches":${chk.getLong(0)},"exact":${chk.getLong(1)},""" +
          f""""shuffle_records":$incrShuffle,"secs":$incrSecs%.2f,""" +
          f""""batch_docs_per_sec":${nBatch / incrSecs}%.0f}""")
      }
    } finally {
      spark.stop()
      deleteRecursively(new File(root))
    }
  }
}
