package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.util.ProbeSupport.{time, withStageSum}

/** Scaling probe for the per-document text scorers (TF-IDF keywords and the
  * bigram LM score) at corpus shapes the 500-doc oracle cannot exercise.
  * Both probes assert a CLOSED FORM — the corpus geometry makes the exact
  * per-rank / per-family answer computable without running the operator —
  * plus a listener-read shuffle bound proving the plan's cost model, in the
  * ScaleProbeOps style.
  *
  *   - keywords: doc i = "u_i u_i m_(i mod 1000) common" — every doc emits
  *     exactly three ranked rows with scores 2N (its unique word, df=1),
  *     1000 (its mod-family word, df=N/1000) and 1 (the corpus-wide word,
  *     df=N): the linear idf makes each score an exact double. The plan is
  *     one (doc,word) combine exchange, a df aggregate, a word-keyed join
  *     and the doc-keyed WindowGroupLimit window — all occurrence-scale;
  *     the failure mode (postings re-derived per doc, or the window seeing
  *     raw tokens) scales past the bound.
  *
  *   - bigramLmScore: half the docs are "u_i v_i" (doc-unique bigram, so
  *     bigram and word vocab are CORPUS-scale — the model joins cannot
  *     broadcast), half are "aaa bbb" (one hot bigram). V = N+2 and both
  *     family scores collapse to one log10 each.
  *
  * Env: PROBE_DOCS (default 1,000,000 — must be a multiple of 2000 so the
  * mod-1000 keyword families and the half/half bigram split are exact),
  * PROBE_CPUS (default 32).
  */
object ScaleProbeText {

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("PROBE_DOCS", "1000000").toLong
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    require(nDocs % 2000 == 0,
      "PROBE_DOCS must be a multiple of 2000 — the keyword mod-1000 " +
        "families and the bigram half/half split need exact integer counts")
    val shm = new File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val root = Files.createDirectory(
      Paths.get(base, s"probe3-text-${ProcessHandle.current().pid()}")).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-text-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", s"$root/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // ---- TF-IDF keywords over 4M occurrences ---------------------------
      spark.range(nDocs).select(col("id").as("doc_id"),
          concat_ws(" ",
            format_string("u%07d", col("id")),
            format_string("u%07d", col("id")),
            format_string("m%03d", pmod(col("id"), lit(1000L))),
            lit("common")).as("text"))
        .write.mode("overwrite").parquet(s"$root/kwdocs")
      val kwDocs = spark.read.parquet(s"$root/kwdocs")
      val ((kw, kwSecs), kwShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.ml.TextAnalysis.keywords(kwDocs)
              .groupBy("rn").agg(count(lit(1)).as("c"),
                min(col("tfidf")).as("lo"), max(col("tfidf")).as("hi"))
              .collect().map(r => (r.getInt(0), r.getLong(1),
                r.getDouble(2), r.getDouble(3))).sortBy(_._1)
          }
        }
      // per doc: u_i cnt=2 df=1 -> 2N; m_j cnt=1 df=N/1000 -> 1000; common
      // cnt=1 df=N -> 1 — three exact doubles, one row of each rank per doc
      val expKw = Seq(
        (1, nDocs, 2.0 * nDocs, 2.0 * nDocs),
        (2, nDocs, 1000.0, 1000.0),
        (3, nDocs, 1.0, 1.0))
      require(kw.toSeq == expKw,
        s"keywords closed form violated: got ${kw.toSeq}, expected $expKw")
      // occ combine (3N) + df partials (~N uniques + hot-family partials) +
      // word-keyed join of occ (3N) with df (N+1001) + the doc window (3N),
      // with occ possibly recomputed rather than exchange-reused
      val kwBound = 14 * nDocs + 2000000
      require(kwShuffle <= kwBound,
        s"keywords shuffled $kwShuffle records (bound $kwBound) — all " +
          "stages must stay occurrence-scale with map-side combine")
      println(f"""{"probe":"keywords","docs":$nDocs,"occurrences":${4 * nDocs},""" +
        f""""shuffle_records":$kwShuffle,"secs":$kwSecs%.2f,""" +
        f""""docs_per_sec":${nDocs / kwSecs}%.0f}""")

      // ---- bigram LM score with a corpus-scale bigram vocab --------------
      spark.range(nDocs).select(col("id").as("doc_id"),
          when(col("id") < nDocs / 2,
            format_string("u%07d v%07d", col("id"), col("id")))
            .otherwise(lit("aaa bbb")).as("text"))
        .write.mode("overwrite").parquet(s"$root/lmdocs")
      val lmDocs = spark.read.parquet(s"$root/lmdocs")
      // V = N doc-unique words + {aaa, bbb}; each family doc has ONE bigram:
      //   unique: p = (1+1)/(1+V);  hot: p = (N/2+1)/(N/2+V)
      val v = nDocs + 2
      def r4(x: Double): Double = math.round(x * 1e4) / 1e4
      val expUnique = r4(math.log10(2.0 / (1 + v).toDouble))
      val expHot = r4(math.log10((nDocs / 2 + 1).toDouble / (nDocs / 2 + v).toDouble))
      val ((lm, lmSecs), lmShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.ml.TextAnalysis.bigramLmScore(lmDocs)
              .groupBy("bi_score").agg(count(lit(1)).as("c"),
                min(col("n_bigrams")).as("lo"), max(col("n_bigrams")).as("hi"))
              .collect().map(r => (r.getDouble(0), r.getLong(1),
                r.getLong(2), r.getLong(3))).sortBy(_._1)
          }
        }
      val expLm = Seq((expUnique, nDocs / 2, 1L, 1L), (expHot, nDocs / 2, 1L, 1L))
        .sortBy(_._1)
      require(lm.toSeq == expLm,
        s"bigram LM closed form violated: got ${lm.toSeq}, expected $expLm")
      // occ (N) + bigram-model partials (~N/2 uniques) + unigram partials
      // (~N uniques) + occ⋈big (N + N/2) + ⋈uni (N + N) + doc agg (N)
      val lmBound = 8 * nDocs + 2000000
      require(lmShuffle <= lmBound,
        s"bigram LM shuffled $lmShuffle records (bound $lmBound) — model " +
          "and scorer must share the one (doc,a,b,cnt) exchange")
      println(f"""{"probe":"bigram_lm","docs":$nDocs,"vocab":$v,""" +
        f""""shuffle_records":$lmShuffle,"secs":$lmSecs%.2f,""" +
        f""""docs_per_sec":${nDocs / lmSecs}%.0f}""")
    } finally {
      spark.stop()
      graft.util.Dirs.deleteRecursively(new File(root))
    }
  }
}
