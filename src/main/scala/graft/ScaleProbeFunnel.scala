package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.ProbeSupport.time

/** Scale probe for the ONE-PASS composed curation funnel
  * ([[graft.ml.Funnel.curationFunnelOnePass]]) — the flagship composition —
  * at forced corpus scale with CLOSED-FORM stage expectations.
  *
  * The synthetic crawl plants one failure mode per id%10 class, so every
  * stage's survivor set is pure id arithmetic and the probe can assert the
  * funnel's (count, xor-signature) per stage EXACTLY at any corpus size:
  *
  *   - class 0/1: same page behind two URLs (class 0 carries a
  *     `?utm_source` tracking variant of class 1's URL) — URL dedup keeps
  *     the lower doc_id, dropping every class-1 doc;
  *   - class 2: a `{` in the body text — C4 drops it;
  *   - class 3: a 5-word page — Gopher word-count (and C4 sentence-count)
  *     drops it;
  *   - class 4/5: the same text re-hosted at two distinct URLs — chunk
  *     dedup awards every chunk to the lower doc_id, dropping class 5;
  *   - class 6: unique-gibberish words (two stopwords keep Gopher happy)
  *     — the LM score lands ~5 points below the standard docs, so the
  *     cutoff drops it;
  *   - classes 7/8/9 and the 0/1 survivor and class 4: survive everything
  *     (group+class-tagged marker words in every 20-word window keep their
  *     chunks globally unique).
  *
  * Expected survivors: N, 0.9N, 0.7N, 0.6N, 0.5N; the expected xor sigs
  * are computed from the same id arithmetic. Because the funnel's stage
  * counters are CollectMetrics observations, a diamond re-execution
  * anywhere in the one-pass plan would double a count / cancel a sig —
  * this probe is also the at-scale single-execution proof.
  *
  * Env: PROBE_DOCS (default 1,000,000; must be a multiple of 10),
  * PROBE_CPUS (default 32), PROBE_LM_CUTOFF (default -5.0 — between the
  * standard ~-2.5 and gibberish ~-7.3 bands).
  */
object ScaleProbeFunnel {
  /** Synthetic crawl corpus: (doc_id, url, html) with the class layout
    * above. Text is 3 lines x 20 words, each line "."-terminated (C4: 3
    * sentences, every line kept), with stopwords at fixed positions
    * (Gopher: 2+ distinct) and a group+class marker word every 10th slot
    * (chunks unique per (group, content-tag); LM: 6 rare words per doc).
    */
  def corpus(spark: SparkSession, nDocs: Long): DataFrame = {
    val g = floor(col("id") / 10).cast("long")
    val c = pmod(col("id"), lit(10))
    // content tag: classes 0/1 share text, classes 4/5 share text
    val cTag = when(c.isin(0, 1), lit("01"))
      .when(c.isin(4, 5), lit("45"))
      .otherwise(c.cast("string"))
    def word(pos: Int) =
      if (pos % 10 == 5) concat(lit("g"), g, lit("c"), cTag, lit("w"), lit(pos))
      else if (pos % 7 == 0) lit(Seq("the", "and", "of", "with")(pos / 7 % 4))
      else lit(s"word$pos")
    def line(l: Int) =
      concat(concat_ws(" ", (0 until 20).map(k => word(l * 20 + k)): _*), lit("."))
    val standardLines = (0 until 3).map(line)
    def gibWord(pos: Int) =
      if (pos == 0) lit("the") else if (pos == 1) lit("and")
      else concat(lit("z"), g, lit("x"), lit(pos))
    def gibLine(l: Int) =
      concat(concat_ws(" ", (0 until 20).map(k => gibWord(l * 20 + k)): _*), lit("."))
    val bodyLines = when(c === 2,
        concat_ws("<br>", (standardLines :+ lit("bad brace { here.")): _*))
      .when(c === 3, lit("alpha beta the and gamma."))
      .when(c === 6, concat_ws("<br>", (0 until 3).map(gibLine): _*))
      .otherwise(concat_ws("<br>", standardLines: _*))
    val html = concat(
      lit("<html><head><title>t</title></head><body><script>var x = 1</script><p>"),
      bodyLines, lit("</p></body></html>"))
    val url = when(c === 0,
        concat(lit("https://ex.org/p"), col("id") + 1, lit("?utm_source=x")))
      .when(c === 1, concat(lit("https://ex.org/p"), col("id")))
      .otherwise(concat(lit("https://ex.org/q"), col("id")))
    spark.range(nDocs).select(col("id").as("doc_id"), url.as("url"), html.as("html"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("PROBE_DOCS", "1000000").toLong
    require(nDocs % 10 == 0, "PROBE_DOCS must be a multiple of 10")
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    val lmCutoff = sys.env.getOrElse("PROBE_LM_CUTOFF", "-5.0").toDouble
    val shm = new File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) "/dev/shm" else System.getProperty("java.io.tmpdir")
    val root = Files.createDirectory(
      Paths.get(base, s"probe3-funnel-${ProcessHandle.current().pid()}")).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-funnel-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", s"$root/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val in = s"$root/docs"
      corpus(spark, nDocs).write.mode("overwrite").parquet(in)
      val docs = spark.read.parquet(in)

      // closed-form expected (count, sig) per stage from the id layout
      val c = pmod(col("id"), lit(10))
      val stagePred = Seq(
        "0_input" -> lit(true),
        "1_url_dedup" -> (c =!= 1),
        "2_quality" -> !c.isin(1, 2, 3),
        "3_chunk_dedup" -> !c.isin(1, 2, 3, 5),
        "4_lm_cutoff" -> !c.isin(1, 2, 3, 5, 6))
      val expAggs = stagePred.flatMap { case (name, p) => Seq(
        count(when(p, 1)).as(s"n_$name"),
        bit_xor(when(p, graft.ml.TextDedup.hash64Col(col("id").cast("string"))))
          .as(s"sig_$name"))
      }
      val expRow = spark.range(nDocs).agg(expAggs.head, expAggs.tail: _*).head()
      val expected = stagePred.zipWithIndex.map { case ((name, _), i) =>
        name -> ((expRow.getLong(2 * i), expRow.getLong(2 * i + 1)))
      }.toMap

      // warmup at 1/8 size (JIT the regex/codegen paths), then measure
      graft.ml.Funnel.curationFunnelOnePass(
        docs.filter(col("doc_id") < nDocs / 8), lmCutoff).collect()
      val (got, secs) = time {
        graft.ml.Funnel.curationFunnelOnePass(docs, lmCutoff).collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      }
      for ((name, exp) <- expected)
        require(got(name) == exp,
          s"stage $name: got ${got(name)}, expected $exp (a re-executed " +
            "observed segment would double the count / cancel the sig)")
      println(f"""{"probe":"funnel","docs":$nDocs,"lm_cutoff":$lmCutoff,""" +
        got.toSeq.sortBy(_._1).map { case (n, (cnt, _)) => s""""$n":$cnt""" }.mkString(",") +
        f""","secs":$secs%.2f,"docs_per_sec":${nDocs / secs}%.0f}""")
    } finally {
      spark.stop()
      graft.util.Dirs.deleteRecursively(new File(root))
    }
  }
}
