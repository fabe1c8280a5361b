package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.util.ProbeSupport.{time, withStageSum}

/** Scaling probe for the corpus-statistics / graph operators, at shapes the
  * tiny oracle corpora cannot exercise. Every probe asserts a CLOSED FORM —
  * the geometry is engineered so the exact answer is computable without
  * running the operator — plus a listener-read shuffle bound proving the
  * plan's cost model, in the ScaleProbeOps style.
  *
  *   - pagerank: a 3-regular ring over `PROBE_HOSTS` hosts (h → h+1, h+2,
  *     h+3 mod H). The graph is vertex-transitive, so the fixed-point
  *     recurrence collapses to ONE scalar per iteration:
  *     p_{i+1} = base + (3·(p_i div 3))·85 div 100 — every host must hold
  *     exactly that BIGINT after 3 iterations. Shuffle must stay
  *     ~ iterations × (edges + rank/degree tables), never edges × hosts.
  *
  *   - vocabCoverage: 50 tokens/doc — 40 "hot" drawn so each of 10k token
  *     ids occurs exactly 4·nDocs/1000 times, 10 "cold" so each of 1M ids
  *     occurs exactly 10·nDocs/1M times (block-residue construction; exact
  *     by divisibility). Coverage targets then have closed-form vocab
  *     sizes. The occurrence exchange must combine map-side: shuffled
  *     records ~ per-partition distinct partials, never the 50·nDocs
  *     occurrence stream.
  *
  * Env: PROBE_DOCS (default 1,000,000 — must be a multiple of 1,000,000
  * for the vocab closed form), PROBE_HOSTS (default 1,000,000),
  * PROBE_CPUS (default 32).
  */
object ScaleProbeCorpus {

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("PROBE_DOCS", "1000000").toLong
    val nHosts = sys.env.getOrElse("PROBE_HOSTS", "1000000").toInt
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    require(nDocs % 1000000 == 0,
      "PROBE_DOCS must be a multiple of 1,000,000 — the vocab closed form " +
        "needs every hot/cold residue hit an exact integer count")
    val shm = new File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val root = Files.createDirectory(
      Paths.get(base, s"probe3-corpus-${ProcessHandle.current().pid()}")).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-corpus-probe")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", s"$root/spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      // ---- PageRank over a 3-regular ring --------------------------------
      val h = lit(nHosts.toLong)
      spark.range(nHosts.toLong).select(col("id").as("src"),
          explode(array(lit(1L), lit(2L), lit(3L))).as("d"))
        .select(col("src"), pmod(col("src") + col("d"), h).as("dst"))
        .write.mode("overwrite").parquet(s"$root/edges")
      val edges = spark.read.parquet(s"$root/edges")
      val iters = 3
      // the scalar twin of the vertex-transitive recurrence
      val FP = graft.plans.LinkGraph.FP
      val prBase = FP * 15 / 100 / nHosts
      var expect = FP / nHosts
      for (_ <- 1 to iters) expect = prBase + (3 * (expect / 3)) * 85 / 100
      val ((prAgg, prSecs), prShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.plans.LinkGraph.pagerank(edges, nHosts, iters)
              .agg(count(lit(1)), min(col("pr")), max(col("pr"))).head()
          }
        }
      require(prAgg.getLong(0) == nHosts &&
        prAgg.getLong(1) == expect && prAgg.getLong(2) == expect,
        s"vertex-transitive closed form violated (expected $expect): $prAgg")
      val nEdges = 3L * nHosts
      // per iteration the edge list crosses at most twice (src-keyed join,
      // dst-keyed partials) plus host-cardinality rank/degree tables — the
      // failure mode (re-deriving contributions per host, or a cartesian
      // rank broadcast rebuilt as rows) scales edges × hosts
      val prBound = iters * (2 * nEdges + 5L * nHosts) + 2000000
      require(prShuffle <= prBound,
        s"pagerank shuffled $prShuffle records (bound $prBound) — each " +
          "iteration must cost edge passes + host-cardinality tables")
      println(f"""{"probe":"pagerank","hosts":$nHosts,"edges":$nEdges,"iters":$iters,""" +
        f""""fixed_point_rank":$expect,"shuffle_records":$prShuffle,""" +
        f""""secs":$prSecs%.2f,"edges_per_sec":${iters * nEdges / prSecs}%.0f}""")

      // ---- vocabulary coverage at 50M occurrences ------------------------
      // hot: j<40 -> (doc_id*40+j) % 10000, each id exactly 40*nDocs/10000
      // cold: j>=40 -> 10000 + (doc_id*10+j-40) % 1000000, each exactly
      // 10*nDocs/1000000 (consecutive-block residue cover, exact by
      // divisibility of nDocs)
      spark.range(nDocs).select(col("id").as("doc_id"),
          transform(sequence(lit(0), lit(49)), j =>
            when(j < 40, pmod(col("id") * 40 + j, lit(10000L)))
              .otherwise(lit(10000L) + pmod(col("id") * 10 + j - 40, lit(1000000L)))
              .cast("int")).as("tokens"))
        .write.mode("overwrite").parquet(s"$root/seqs")
      val seqs = spark.read.parquet(s"$root/seqs")
      val cHot = 40L * nDocs / 10000
      val cCold = 10L * nDocs / 1000000
      val total = 50L * nDocs
      // closed-form walk: hot cell first (mass 0.8·total), then cold
      def expectFor(p: Int): (Long, Long) = {
        val target = (p * total + 99) / 100
        val hotMass = 10000L * cHot
        if (target <= hotMass) {
          val k = (target + cHot - 1) / cHot
          (k, k * cHot)
        } else {
          val k = (target - hotMass + cCold - 1) / cCold
          (10000L + k, hotMass + k * cCold)
        }
      }
      val ((vcRows, vcSecs), vcShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.ml.CorpusStats.vocabCoverage(seqs).collect()
              .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
              .sortBy(_._1)
          }
        }
      val expRows = Seq(50, 90, 99).map { p =>
        val (v, cov) = expectFor(p); (p, v, cov, total)
      }
      require(vcRows.toSeq == expRows,
        s"vocab coverage closed form violated: got ${vcRows.toSeq}, expected $expRows")
      // per-partition distinct partials: cold ids occur ~10x spread over
      // the input, so partials ~ occurrences/5 at worst; the raw stream
      // would be 50M
      require(vcShuffle <= total / 2,
        s"vocab coverage shuffled $vcShuffle records — the occurrence " +
          s"exchange must combine map-side (raw stream would be $total)")
      println(f"""{"probe":"vocab_coverage","docs":$nDocs,"occurrences":$total,""" +
        f""""distinct_tokens":${10000 + 1000000},"shuffle_records":$vcShuffle,""" +
        f""""secs":$vcSecs%.2f,"tokens_per_sec":${total / vcSecs}%.0f}""")
    } finally {
      spark.stop()
      graft.util.Dirs.deleteRecursively(new File(root))
    }
  }
}
