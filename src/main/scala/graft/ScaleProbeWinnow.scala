package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.TextDedup
import graft.util.ProbeSupport.{time, withStageSum}

/** Scaling probe for winnowing fingerprints (q_winnow) at a corpus shape the
  * 500-doc oracle cannot exercise, asserting a CLOSED FORM built from the
  * winnowing guarantee itself (Schleimer SIGMOD'03 §4):
  *
  * Every doc embeds one fixed run R of exactly `WINNOW_W + SHINGLE_K - 1`
  * words. R contributes exactly `WINNOW_W` consecutive shingles, so exactly
  * ONE window lies fully inside R — and a window minimum is position-free,
  * so EVERY document's fingerprint set must contain `fp_R = min(hash(R's
  * shingles))`, computable driver-side from four constant strings. Even ids
  * are one shared 50-word template (identical text ⇒ identical
  * (n_fps, fp_sig, fp_min) triple — distinct count must be 1); odd ids wrap
  * R in 22 doc-unique prefix and 22 doc-unique suffix words.
  *
  * The plan claim: winnowing is ENTIRELY row-local (normalize → shingle →
  * hash → window-min → distinct are array expressions in one projection), so
  * the only shuffle in the verification job is the final aggregate's
  * partial rows — the listener-read shuffle-write record count must stay at
  * partition scale (bound 12×cpus), never document scale. A failure mode
  * where the fingerprint arrays or text cross an exchange blows the bound
  * by 5 orders of magnitude at 1M docs.
  *
  * A second phase probes the DETECTION JOIN ([[graft.ml.TextDedup
  * .winnowPairs]]) on 500k planted pairs with disjoint cross-pair vocab:
  * the result must be exactly the planted pair set, each pair sharing at
  * least ceil(25/w) fingerprints (the guarantee lifted to pairs), with the
  * (doc, fp) rows crossing ONE fp-keyed exchange.
  *
  * Env: PROBE_DOCS (default 1,000,000, must be even), PROBE_PAIR_DOCS
  * (default PROBE_DOCS, even), PROBE_CPUS (32).
  */
object ScaleProbeWinnow {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("PROBE_DOCS", "1000000").toLong
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    require(nDocs % 2 == 0, "PROBE_DOCS must be even (template/mixed halves)")
    val shm = new File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val root = Files.createDirectory(
      Paths.get(base, s"probe3-winnow-${ProcessHandle.current().pid()}")).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-winnow-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", s"$root/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val w = TextDedup.WINNOW_W
      val k = TextDedup.SHINGLE_K
      val runWords = (10 until (10 + w + k - 1)).map(i => s"t$i") // inside T
      // fp_R: the minimum shingle hash of the guaranteed run — four constant
      // strings, hashed through the same compiled expression
      val fpR = spark.range(1).select(array_min(array(
          runWords.sliding(k).map(s => TextDedup.hash64Col(lit(s.mkString(" "))))
            .toSeq: _*)).as("fp"))
        .head().getLong(0)

      val template = (0 until 50).map(i => s"t$i").mkString(" ")
      val prefix = (0 until 22).map(j => format_string(s"p%07dx$j", col("id")))
      val suffix = (0 until 22).map(j => format_string(s"q%07dy$j", col("id")))
      val mixed = concat_ws(" ",
        (prefix ++ runWords.map(lit(_)) ++ suffix): _*)
      spark.range(nDocs).select(col("id").as("doc_id"),
          when(pmod(col("id"), lit(2L)) === 0, lit(template))
            .otherwise(mixed).as("text"))
        .write.mode("overwrite").parquet(s"$root/docs")
      val docs = spark.read.parquet(s"$root/docs")

      val ((row, secs), shuffled) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            val f = docs.select(col("doc_id"),
                TextDedup.winnowFpsCol(col("text")).as("fps"))
              .select(col("doc_id"),
                size(col("fps")).as("n_fps"),
                aggregate(col("fps"), lit(0L), (a, x) => a.bitwiseXOR(x)).as("fp_sig"),
                array_min(col("fps")).as("fp_min"),
                array_contains(col("fps"), lit(fpR)).as("has_r"))
            f.agg(
                count(lit(1)).as("n"),
                sum(when(col("has_r"), 1L).otherwise(0L)).as("n_has_r"),
                countDistinct(when(pmod(col("doc_id"), lit(2L)) === 0,
                  struct(col("n_fps"), col("fp_sig"), col("fp_min")))).as("n_tpl"),
                max(col("fp_min")).as("max_min"),
                max(col("n_fps")).as("max_fps"),
                min(col("n_fps")).as("min_fps"))
              .head()
          }
        }
      require(row.getLong(0) == nDocs, s"count: ${row.getLong(0)}")
      require(row.getLong(1) == nDocs,
        s"winnowing guarantee violated at scale: only ${row.getLong(1)} of " +
          s"$nDocs docs carry fp_R=$fpR")
      require(row.getLong(2) == 1L,
        s"template docs must share ONE scalar triple, got ${row.getLong(2)}")
      require(row.getLong(3) <= fpR, "fp_min must never exceed the shared fp_R")
      // 50 words -> 48 shingles -> 45 windows; distinct can only shrink
      require(row.getInt(5) >= 1 && row.getInt(4) <= 45,
        s"n_fps out of [1,45]: [${row.getInt(5)}, ${row.getInt(4)}]")
      val bound = 12L * cpus
      require(shuffled <= bound,
        s"winnow verification shuffled $shuffled records (bound $bound) — " +
          "the operator must stay row-local; only aggregate partials may cross")
      println(f"""{"probe":"winnow","docs":$nDocs,"fp_r":$fpR,""" +
        f""""shuffle_records":$shuffled,"secs":$secs%.2f,""" +
        f""""docs_per_sec":${nDocs / secs}%.0f}""")

      // ---- detection join: planted pairs, closed-form exact ---------------
      // doc 2j and 2j+1 share a 30-word pair-unique body and differ in a
      // 20-word doc-unique tail; cross-pair vocab is disjoint, so the pair
      // set is EXACTLY {(2j, 2j+1)}. The body's 28 interior shingles give 25
      // windows whose minima are position-free and identical in both docs;
      // a value can be the min of at most w consecutive windows, so every
      // pair shares >= ceil(25/w) = 7 fingerprints.
      val nPairDocs = sys.env.getOrElse("PROBE_PAIR_DOCS", nDocs.toString).toLong
      require(nPairDocs % 2 == 0, "PROBE_PAIR_DOCS must be even")
      val pairId = (col("id") / 2).cast("long")
      val bodyW = (0 until 30).map(j => format_string(s"c%07dw$j", pairId))
      val tailW = (0 until 20).map(j =>
        when(pmod(col("id"), lit(2L)) === 0, format_string(s"a%07dw$j", pairId))
          .otherwise(format_string(s"b%07dw$j", pairId)))
      spark.range(nPairDocs).select(col("id").as("doc_id"),
          concat_ws(" ", (bodyW ++ tailW): _*).as("text"))
        .write.mode("overwrite").parquet(s"$root/pairdocs")
      val pairDocs = spark.read.parquet(s"$root/pairdocs")
      val ((prow, psecs), pshuffled) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            TextDedup.winnowPairs(pairDocs)
              .agg(count(lit(1)).as("n_pairs"),
                sum(when(col("doc_b") === col("doc_a") + 1 &&
                  pmod(col("doc_a"), lit(2L)) === 0, 1L).otherwise(0L)).as("n_adjacent"),
                min(col("n_shared")).as("min_shared"),
                max(col("n_shared")).as("max_shared"))
              .head()
          }
        }
      require(prow.getLong(0) == nPairDocs / 2 && prow.getLong(1) == nPairDocs / 2,
        s"pairs must be exactly the planted (2j, 2j+1) set: $prow")
      require(prow.getLong(2) >= 7L,
        s"every pair shares >= 7 fingerprints (25 shared windows / w): $prow")
      require(prow.getLong(3) <= 45L, s"n_shared bounded by the window count: $prow")
      // one fp-keyed exchange of the (doc, fp) rows (n_fps <= 45 per doc,
      // self-join side AQE-reused) + the pair-aggregate partials; the
      // quadratic failure mode (a hot fp fanning out) adds pairs^2 records
      val pBound = 3L * 45L * nPairDocs
      require(pshuffled <= pBound,
        s"winnowPairs shuffled $pshuffled records (bound $pBound)")
      println(f"""{"probe":"winnow_pairs","docs":$nPairDocs,""" +
        f""""pairs":${prow.getLong(0)},"shuffle_records":$pshuffled,""" +
        f""""secs":$psecs%.2f,"docs_per_sec":${nPairDocs / psecs}%.0f}""")

      // ---- source overlap matrix: 100 sources, one planted pair ----------
      // Docs carry their source's private 50-word template (disjoint vocab
      // across sources) EXCEPT sources s00/s01, which both embed run R.
      // Closed form: the matrix is exactly ONE row (s00, s01) — every
      // other pair shares nothing. The shuffle bound proves the distinct
      // collapses map-side: (source, fp) distincts ≈ sources × fps-per-
      // template per partition, never the ~45M occurrence scale.
      val soTpl = (0 until 50).map(j =>
        concat(lit("v"), pmod(col("id"), lit(100L)), lit(s"w$j")))
      val soText = when(pmod(col("id"), lit(100L)) < 2,
          concat_ws(" ",
            (0 until 22).map(j => concat(lit("v"), pmod(col("id"), lit(100L)),
              lit(s"w$j"))) ++ runWords.map(lit(_)) ++
            (28 until 50).map(j => concat(lit("v"), pmod(col("id"), lit(100L)),
              lit(s"w$j"))): _*))
        .otherwise(concat_ws(" ", soTpl: _*))
      spark.range(nDocs).select(
          concat(lit("s"), pmod(col("id"), lit(100L))).as("source"),
          soText.as("text"))
        .write.mode("overwrite").parquet(s"$root/sodocs")
      val soDocs = spark.read.parquet(s"$root/sodocs")
      val ((soRows, soSecs), soShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            TextDedup.sourceOverlap(soDocs).collect()
          }
        }
      require(soRows.length == 1 &&
        soRows(0).getString(0) == "s0" && soRows(0).getString(1) == "s1" &&
        soRows(0).getLong(2) >= 1L,
        s"overlap matrix must be exactly the planted (s0, s1) row: " +
          soRows.mkString("; "))
      val soBound = 100L * 50L * cpus * 4
      require(soShuffle <= soBound,
        s"sourceOverlap shuffled $soShuffle records (bound $soBound) — the " +
          "(source, fp) distinct must collapse map-side, never occurrence-scale")
      println(f"""{"probe":"source_overlap","docs":$nDocs,"sources":100,""" +
        f""""shuffle_records":$soShuffle,"secs":$soSecs%.2f,""" +
        f""""docs_per_sec":${nDocs / soSecs}%.0f}""")

      // ---- token run trim: planted 20-run per doc, closed-form cut -------
      // Every doc: 100 tokens, positions 40..59 all equal (a 20-run) and
      // every other adjacent pair distinct (base steps by 7 mod big). Trim
      // at maxRun=3 cuts exactly 17 per doc; the position-weighted sig is
      // order-sensitive, so the count AND placement both verify via the
      // n_after sum. Map-only: only aggregate partials may shuffle.
      spark.range(nDocs).select(col("id").as("doc_id"),
          transform(sequence(lit(0), lit(99)),
            i => when(i >= 40 && i < 60, lit(77))
              .otherwise((pmod(col("id") * 131 + i.cast("long") * 7,
                lit(1000000L)) + lit(100L)).cast("int"))).as("tokens"))
        .write.mode("overwrite").parquet(s"$root/trseqs")
      val trSeqs = spark.read.parquet(s"$root/trseqs")
      val ((trRow, trSecs), trShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.ml.Packing.tokenRunTrim(trSeqs)
              .agg(count(lit(1)).as("n"),
                sum(col("n_before") - col("n_after")).as("cut"),
                min(col("n_after")).as("lo"), max(col("n_after")).as("hi"))
              .head()
          }
        }
      require(trRow.getLong(0) == nDocs && trRow.getLong(1) == 17L * nDocs &&
        trRow.getLong(2) == 83L && trRow.getLong(3) == 83L,
        s"run trim closed form violated: $trRow")
      require(trShuffle <= 12L * cpus,
        s"tokenRunTrim shuffled $trShuffle records — must be map-only")
      println(f"""{"probe":"token_runs","docs":$nDocs,"tokens":${100 * nDocs},""" +
        f""""shuffle_records":$trShuffle,"secs":$trSecs%.2f,""" +
        f""""docs_per_sec":${nDocs / trSecs}%.0f}""")
    } finally {
      spark.stop()
      graft.util.Dirs.deleteRecursively(new File(root))
    }
  }
}
