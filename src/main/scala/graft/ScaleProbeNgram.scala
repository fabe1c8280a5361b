package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.ProbeSupport.time

/** Scaling probe for the exact n-gram Jaccard dedup path (PPJoin prefix
  * filter + the round-4 length bound): the oracle corpora are uniform in
  * length, so the length bound never fires there — this corpus mixes full
  * documents with short excerpts of the same families, the shape where
  * lopsided candidate pairs survive the rare-first prefix filter and only
  * the length bound prunes them before the exact verify join.
  *
  * Corpus geometry (t = 0.5, 3-word shingles): at threshold t the prefix
  * is the rarest n - ceil(t*n) + 1 ~ n/2 shingles of each doc, so for
  * lopsided pairs to survive the prefix filter the shared rare content
  * must fill half the LONG doc. Families of `famSize` docs share a
  * 12-word family-unique run; even members (long) append a globally
  * CONSTANT 11-word boilerplate tail (shingles corpus-frequent -> sorted
  * past the prefix boundary, never joined on) plus one per-doc variant
  * word (22 shingles); odd members (short) are the family run alone
  * (10 shingles). Every short-prefix shingle is also in the long
  * sibling's prefix, so long-short candidates FORM at the prefix join —
  * and 10 < t*22 = 11, so only the length bound prunes them before the
  * exact verify (true J = 10/22 = 0.45 < t: pruning is lossless).
  * Long-long siblings differ in one variant shingle (J = 21/23) and
  * short-short are identical (J = 1): real verified pairs come out, one
  * of each per family.
  *
  * Env: PROBE_DOCS (default 200,000), PROBE_CPUS (default 32),
  * PROBE_FAM (default 4).
  */
object ScaleProbeNgram {
  def corpus(spark: SparkSession, nDocs: Long, famSize: Int): DataFrame = {
    val fam = (col("id") / famSize).cast("long")
    val rare = (0 until 12).map(k => concat(lit("f"), fam, lit("r"), lit(k)))
    val boiler = (0 until 11).map(k => lit(s"b$k"))
    val variant = concat(lit("v"), col("id"))
    val full = concat_ws(" ", (rare ++ boiler :+ variant): _*)
    val short = concat_ws(" ", rare: _*)
    spark.range(nDocs).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(2)) === 0, full).otherwise(short).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("PROBE_DOCS", "200000").toLong
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    val famSize = sys.env.getOrElse("PROBE_FAM", "4").toInt
    val shm = new File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) "/dev/shm" else System.getProperty("java.io.tmpdir")
    val root = Files.createDirectory(
      Paths.get(base, s"probe3-ngram-${ProcessHandle.current().pid()}")).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ngram-probe")
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

      // warmup at small size: JIT the codegen paths, not a measurement
      graft.ml.TextDedup.ngramJaccardPairs(
        docs.filter(col("doc_id") < nDocs / 8), 0.5).count()

      val (candWith, candWithSecs) = time {
        graft.ml.TextDedup.ngramCandidates(docs, 0.5).count()
      }
      val (candWithout, candWithoutSecs) = time {
        graft.ml.TextDedup.ngramCandidates(docs, 0.5, lengthFilter = false).count()
      }
      val (pairs, pairSecs) = time {
        graft.ml.TextDedup.ngramJaccardPairs(docs, 0.5).count()
      }
      val cut = 100.0 * (candWithout - candWith) / math.max(candWithout, 1L)
      println(f"""{"probe":"ngram","docs":$nDocs,"fam":$famSize,""" +
        f""""cand_with_bound":$candWith,"cand_without":$candWithout,""" +
        f""""pruned_pct":$cut%.1f,""" +
        f""""cand_secs":$candWithSecs%.2f,"cand_nobound_secs":$candWithoutSecs%.2f,""" +
        f""""pairs":$pairs,"pairs_secs":$pairSecs%.2f,""" +
        f""""docs_per_sec":${nDocs / pairSecs}%.0f}""")
    } finally {
      spark.stop()
      graft.util.Dirs.deleteRecursively(new File(root))
    }
  }
}
