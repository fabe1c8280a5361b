package graft

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.ProbeSupport.{time, withStageSum}

/** Scaling probe for the round-4 operator additions whose scale story the
  * tiny oracle corpora cannot exercise:
  *
  *   - BPE: histogram-bounded training (the word-count agg collapses the
  *     corpus; the merge loop cost depends on DISTINCT words only) and
  *     map-only encode throughput with the per-partition word memo.
  *   - domainQuota: the WindowGroupLimit keep-first under a pathologically
  *     HOT domain (75% of the corpus shares one domain). The probe reads
  *     the actual shuffle-write record counts off the listener: map-side
  *     group-limit pruning must forward ~cap rows per (domain, partition),
  *     not the hot domain's population.
  *
  * Corpus: `nDocs` docs of 50 words drawn from a ~10k-word synthetic
  * vocabulary with a product-skewed frequency distribution (hash%100 *
  * hash%100 — many small ids, a long tail), so the BPE histogram is
  * realistic-shaped and the memo hit rate matters.
  *
  *   - semanticDedup: the SemDeDup shape at 1M vectors with 10% planted
  *     exact duplicates. The cost model is explicit: assignment is linear
  *     in nCells (the argmax expression computes every centroid dot
  *     product per row) while the within-cell verify is quadratic in the
  *     MEAN CELL SIZE — so the cell count must scale with the corpus
  *     (n/cells ~ a few hundred), exactly the knob the probe exposes.
  *
  * Env: PROBE_DOCS (default 1,000,000), PROBE_CPUS (default 32),
  * PROBE_MERGES (default 300), PROBE_CAP (default 100),
  * PROBE_VECS (default 1,000,000), PROBE_CELLS (default 1024).
  */
object ScaleProbeOps {

  def corpus(spark: SparkSession, nDocs: Long): DataFrame = {
    val wid = (k: Int) =>
      pmod(xxhash64(col("id"), lit(k)), lit(100L)) *
        pmod(xxhash64(col("id"), lit(k + 1000)), lit(100L))
    val words = (0 until 50).map(k => concat(lit("w"), wid(k)))
    // 75% of docs share ONE domain; the rest spread over 20
    val url = when(pmod(col("id"), lit(4)) =!= 0,
      lit(" see https://hot.example.org/page"))
      .otherwise(concat(lit(" see https://site"), pmod(col("id"), lit(20)),
        lit(".example.org/page")))
    spark.range(nDocs).select(col("id").as("doc_id"),
      concat(concat_ws(" ", words: _*), url).as("text"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("PROBE_DOCS", "1000000").toLong
    val cpus = sys.env.getOrElse("PROBE_CPUS", "32").toInt
    val nMerges = sys.env.getOrElse("PROBE_MERGES", "300").toInt
    val cap = sys.env.getOrElse("PROBE_CAP", "100").toInt
    val shm = new File("/dev/shm")
    val base = if (shm.isDirectory && shm.canWrite) "/dev/shm"
      else System.getProperty("java.io.tmpdir")
    val root = Files.createDirectory(
      Paths.get(base, s"probe3-ops-${ProcessHandle.current().pid()}")).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ops-probe")
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

      // ---- BPE: train on the histogram, encode the corpus -------------
      graft.ml.Bpe.encode(spark,
        docs.filter(col("doc_id") < nDocs / 16), // JIT warmup, not measured
        graft.ml.Bpe.trainOn(docs.filter(col("doc_id") < nDocs / 16), 50)).count()
      val (hist, histSecs) = time {
        graft.ml.Bpe.wordHistogram(docs).collect()
          .map(r => (r.getString(0), r.getLong(1)))
      }
      val (merges, trainSecs) = time { graft.ml.Bpe.train(hist, nMerges) }
      val ((nTokens, nRows), encodeSecs) = time {
        val agg = graft.ml.Bpe.encode(spark, docs, merges)
          .agg(sum(col("n_tok")), count(lit(1))).head()
        (agg.getLong(0), agg.getLong(1))
      }
      println(f"""{"probe":"bpe","docs":$nDocs,"distinct_words":${hist.length},""" +
        f""""hist_secs":$histSecs%.2f,"merges":${merges.size},"train_secs":$trainSecs%.2f,""" +
        f""""encode_secs":$encodeSecs%.2f,"tokens":$nTokens,""" +
        f""""docs_per_sec":${nRows / encodeSecs}%.0f}""")

      // ---- domain quota under a hot domain ----------------------------
      val ((outRows, quotaSecs), quotaShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time { graft.ml.TextCleaning.domainQuota(docs, cap).count() }
        }
      println(f"""{"probe":"quota","docs":$nDocs,"hot_frac":0.75,"cap":$cap,""" +
        f""""out_rows":$outRows,"shuffle_records":$quotaShuffle,""" +
        f""""secs":$quotaSecs%.2f,"docs_per_sec":${nDocs / quotaSecs}%.0f}""")

      // ---- NB quality classifier at forced scale ------------------------
      // The cost model to prove: ONE (doc_id, w, cnt) exchange reused by
      // training and scoring (ReuseExchange), a vocab-sized model join, and
      // the per-doc agg — total shuffle stays a small multiple of the
      // occurrence-pair count, never corpus × passes.
      val clfDocs = docs.withColumn("source",
        concat(lit("src"), pmod(col("doc_id"), lit(20))))
      val clfPos = (0 until 5).map(i => s"src$i")
      val ((clfAgg, clfSecs), clfShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.ml.TextAnalysis.qualityClassifier(clfDocs, clfPos)
              .agg(count(lit(1)), sum(col("n_words")),
                sum(when(col("keep"), 1L).otherwise(0L))).head()
          }
        }
      require(clfAgg.getLong(0) == nDocs,
        s"classifier must score every doc (${clfAgg.getLong(0)} != $nDocs)")
      // ~52 normalized words/doc (50 + the URL tail). Pair-scale exchanges:
      // the occ agg, the freq agg, the score join, the per-doc agg — 4 ×
      // DISTINCT pairs max (occurrences bound pairs from above), + the
      // vocab-sized model side. Anything near occurrences × passes would
      // mean the labels join crept back in.
      val occPairs = clfAgg.getLong(1)
      require(clfShuffle <= 4 * occPairs + nDocs + 2000000,
        s"classifier shuffled $clfShuffle records (bound ${4 * occPairs + nDocs + 2000000})")
      println(f"""{"probe":"classifier","docs":$nDocs,"word_occurrences":$occPairs,""" +
        f""""kept":${clfAgg.getLong(2)},"shuffle_records":$clfShuffle,""" +
        f""""secs":$clfSecs%.2f,"docs_per_sec":${nDocs / clfSecs}%.0f}""")

      // ---- training-shard export at forced scale -------------------------
      // The two-phase prefix sum must ship the corpus rows through ONE
      // block-keyed shuffle (plus the tiny per-block totals); the closed
      // form checks the permutation is gapless: the maximum doc END offset
      // equals the corpus token total, and the shard count is the budget
      // division of that total.
      val shardBudget = 1000000L
      val ((seAgg, seSecs), seShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.ml.Packing.shardExport(docs, shardBudget)
              .agg(count(lit(1)), sum(col("n_tok")),
                max(col("off") + col("n_tok")), max(col("shard_id"))).head()
          }
        }
      val (seRows, seToks, seMaxEnd, seMaxShard) =
        (seAgg.getLong(0), seAgg.getLong(1), seAgg.getLong(2), seAgg.getLong(3))
      require(seRows == nDocs && seMaxEnd == seToks,
        s"shard export must be a gapless permutation prefix sum ($seRows docs, max end $seMaxEnd vs $seToks tokens)")
      require(seMaxShard == (seToks - 1) / shardBudget,
        s"shard ids must be the budget division (${seMaxShard} != ${(seToks - 1) / shardBudget})")
      require(seShuffle <= 3 * nDocs + 2000000,
        s"shard export shuffled $seShuffle records — the corpus must cross one block shuffle, not a global sort")
      println(f"""{"probe":"shardexport","docs":$nDocs,"tokens":$seToks,""" +
        f""""budget":$shardBudget,"shards":${seMaxShard + 1},""" +
        f""""shuffle_records":$seShuffle,"secs":$seSecs%.2f,""" +
        f""""docs_per_sec":${nDocs / seSecs}%.0f}""")

      // ---- boilerplate line scrub at forced scale ------------------------
      // Cost model: records ∝ line count (the (line, doc) distinct agg's
      // two phases + the doc-keyed rebuild), NEVER pairs-of-docs; the hot
      // set (N/4 family lines + 2 universal templates) rides a broadcast
      // back join. Closed form: every doc keeps exactly its unique + pair
      // lines (df 1 and 2) and loses nav/footer (df = N) and the family
      // line (df = 4 > maxDf = 2).
      require(nDocs % 4 == 0,
        "PROBE_DOCS must be a multiple of 4 — a ragged tail family line has df <= maxDf and breaks the closed form")
      val blDocs = spark.range(nDocs).select(col("id").as("doc_id"),
        concat(lit("site navigation menu\nu"), col("id"),
          lit(" unique content line\nfam line "), floor(col("id") / 4).cast("long"),
          lit("\npair line "), floor(col("id") / 2).cast("long"),
          lit("\n(c) footer legal")).as("text"))
      val ((blAgg, blSecs), blShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.ml.TextCleaning.boilerplateScrub(blDocs, maxDf = 2)
              .agg(count(lit(1)), sum(col("n_lines")), sum(col("n_kept"))).head()
          }
        }
      require(blAgg.getLong(0) == nDocs && blAgg.getLong(1) == 5 * nDocs &&
        blAgg.getLong(2) == 2 * nDocs,
        s"boilerplate closed form violated: ${blAgg}")
      require(blShuffle <= 20 * nDocs + 2000000,
        s"boilerplate scrub shuffled $blShuffle records — must stay ∝ lines, never doc pairs")
      println(f"""{"probe":"boilerplate","docs":$nDocs,"lines":${5 * nDocs},""" +
        f""""kept":${blAgg.getLong(2)},"shuffle_records":$blShuffle,""" +
        f""""secs":$blSecs%.2f,"docs_per_sec":${nDocs / blSecs}%.0f}""")

      // ---- semantic dedup (SemDeDup) at forced scale -------------------
      val nVecs = sys.env.getOrElse("PROBE_VECS", "1000000").toLong
      val nCells = sys.env.getOrElse("PROBE_CELLS", "1024").toInt
      val dim = 16
      // every 10th vector is an exact copy of its decade's first -> the
      // copy shares its source's cell and must be dropped
      val seedId = when(pmod(col("id"), lit(10)) === 9, col("id") - 9)
        .otherwise(col("id"))
      spark.range(nVecs).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          d => (pmod(xxhash64(seedId, d), lit(1000)).cast("double") / lit(500.0) - lit(1.0))
            .cast("float")).as("embedding"))
        .write.mode("overwrite").parquet(s"$root/vecs")
      val emb = spark.read.parquet(s"$root/vecs")
      val (cents, buildSecs) = time {
        graft.ml.Similarity.ivfCentroids(emb, nCells, sampleMod = 64)
      }
      val (_, assignSecs) = time { // assignment pass alone (linear in nCells)
        emb.select(graft.ml.Similarity.ivfCell(col("embedding"), cents).as("cell"))
          .agg(max(col("cell"))).head()
      }
      val (survivors, dedupSecs) = time {
        graft.ml.Similarity.semanticDedup(emb, 0.99, centroids = Some(cents)).count()
      }
      val expected = nVecs - nVecs / 10
      println(f"""{"probe":"semdedup","vecs":$nVecs,"dim":$dim,"cells":$nCells,""" +
        f""""build_secs":$buildSecs%.2f,"assign_secs":$assignSecs%.2f,""" +
        f""""dedup_secs":$dedupSecs%.2f,"survivors":$survivors,"expected":$expected,""" +
        f""""vecs_per_sec":${nVecs / dedupSecs}%.0f}""")
      require(survivors == expected,
        s"semantic dedup at scale must drop exactly the planted copies ($survivors != $expected)")

      // ---- incremental ingest dedup at forced scale ---------------------
      // history = the nDocs corpus; incoming = 10% exact dups of it + nDocs
      // fresh docs. The bloom gate must keep the fresh bulk out of the
      // anti-join: shuffled records stay ~ history's hash column + the
      // positive sliver (dups + fpp share), never the whole batch.
      corpus(spark, 2 * nDocs)
        .filter(col("doc_id") % 10 === 0 || col("doc_id") >= nDocs)
        .write.mode("overwrite").parquet(s"$root/incoming")
      val incoming = spark.read.parquet(s"$root/incoming")
      val (bloom, bloomSecs) = time {
        graft.ml.TextDedup.buildHistoryBloom(docs, nDocs, 0.01)
      }
      val ((survivors2, incrSecs), dedupShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.ml.TextDedup.incrementalDedup(incoming, docs, nDocs, 0.01,
              prebuilt = Some(bloom)).count()
          }
        }
      val nIncoming = nDocs + nDocs / 10
      require(survivors2 == nDocs,
        s"incremental dedup must keep exactly the fresh docs ($survivors2 != $nDocs)")
      require(dedupShuffle <= nDocs + nIncoming / 4,
        s"bloom gate failed: $dedupShuffle records shuffled " +
          s"(bound ${nDocs + nIncoming / 4} = history hashes + positive sliver)")
      println(f"""{"probe":"incrdedup","history":$nDocs,"incoming":$nIncoming,""" +
        f""""bloom_secs":$bloomSecs%.2f,"bloom_bits":${bloom.bitSize()},""" +
        f""""dedup_secs":$incrSecs%.2f,"survivors":$survivors2,""" +
        f""""shuffle_records":$dedupShuffle,""" +
        f""""docs_per_sec":${nIncoming / incrSecs}%.0f}""")

      // ---- IVF-PQ ANN at forced scale -----------------------------------
      // Reuses the 1M-vector table + the nCells coarse quantizer. The
      // stored table is the ENCODED one, written partitionBy(cell) — the
      // serving scan must read only probed partitions (listener-checked
      // via input records), and the search wall is compared against the
      // brute-force scan of the same queries.
      val m = 8
      val (books, pqBuildSecs) = time {
        graft.ml.Similarity.ivfPqCodebooks(emb, cents, m = m, sampleMod = 64)
      }
      val (_, pqEncodeSecs) = time {
        graft.ml.Similarity.ivfPqEncode(emb, cents, books)
          .repartition(cpus, col("cell"))
          .write.mode("overwrite").partitionBy("cell").parquet(s"$root/coded")
      }
      val coded = spark.read.parquet(s"$root/coded")
      // (a) pruning evidence at few queries: 8 queries probe <=64 of the
      // 1024 cells, so a partition-pruned scan reads a few % of the store
      val ((annRows8, search8Secs), inputRecords) =
        withStageSum(spark)(_.inputMetrics.recordsRead) {
          time {
            graft.ml.Similarity.ivfPqSearch(coded,
              emb.filter(col("vec_id") < 8), 10, 8, cents, books).collect().length
          }
        }
      require(annRows8 == 8 * 10, s"full top-k expected ($annRows8)")
      require(inputRecords < nVecs / 4,
        s"probe-pruned serve read $inputRecords records — " +
          "the cell-partitioned scan must not read the whole store")
      // (b) throughput comparison at enough queries that the brute scan's
      // per-query cost dominates its fixed overhead — the asymptote, not
      // job-scheduling noise
      val nQ = 64
      val queries = emb.filter(col("vec_id") < nQ)
      val (annRows, searchSecs) = time {
        graft.ml.Similarity.ivfPqSearch(coded, queries, 10, 8, cents, books)
          .collect().length
      }
      val (bfRows, bruteSecs) = time {
        graft.ml.Similarity.bruteForceTopK(emb, nQ, 10).collect().length
      }
      require(annRows == nQ * 10 && bfRows == nQ * 10,
        s"both ANN paths must return full top-k ($annRows, $bfRows)")
      println(f"""{"probe":"ivfpq","vecs":$nVecs,"dim":$dim,"cells":$nCells,"m":$m,""" +
        f""""pq_build_secs":$pqBuildSecs%.2f,"encode_secs":$pqEncodeSecs%.2f,""" +
        f""""encode_vecs_per_sec":${nVecs / pqEncodeSecs}%.0f,""" +
        f""""search8_secs":$search8Secs%.2f,"search8_input_records":$inputRecords,""" +
        f""""queries":$nQ,"search_secs":$searchSecs%.2f,""" +
        f""""brute_secs":$bruteSecs%.2f,"speedup":${bruteSecs / searchSecs}%.1f}""")

      // ---- ExactSubstr dup spans at forced scale ------------------------
      // 56-word docs of globally unique filler; every 10th doc carries a
      // SHARED 16-word boilerplate at positions 10..25. Expected result is
      // closed-form: exactly one span (10, 26) per boilerplate doc — L-grams
      // fully inside the run are corpus-duplicated, every gram touching the
      // unique filler is not. ~49M positioned grams flow through the ONE
      // gram-hash shuffle at the default 1M docs.
      val nSpanDocs = sys.env.getOrElse("PROBE_SPAN_DOCS", "1000000").toLong
      val spanWords = (0 until 56).map { k =>
        val filler = concat(lit("u"), col("id"), lit(s"x$k"))
        if (k >= 10 && k < 26)
          when(pmod(col("id"), lit(10)) === 0, lit(s"b$k")).otherwise(filler)
        else filler
      }
      spark.range(nSpanDocs).select(col("id").as("doc_id"),
        concat_ws(" ", spanWords: _*).as("text"))
        .write.mode("overwrite").parquet(s"$root/spandocs")
      val spanDocs = spark.read.parquet(s"$root/spandocs")
      val (spanRow, spanSecs) = time {
        graft.ml.TextDedup.dupSpans(spanDocs, 8)
          .agg(count(lit(1)), min(col("span_start")), max(col("span_end")),
            countDistinct(col("doc_id"))).head()
      }
      val expSpans = (nSpanDocs + 9) / 10
      require(spanRow.getLong(0) == expSpans && spanRow.getLong(3) == expSpans &&
        spanRow.getLong(1) == 10 && spanRow.getLong(2) == 26,
        s"dup spans must be exactly one (10,26) per boilerplate doc: $spanRow")
      val (droppedWords, scrubSecs) = time {
        graft.ml.TextDedup.scrubDupSpans(spanDocs, 8)
          .agg(sum(col("n_dropped"))).head().getLong(0)
      }
      require(droppedWords == 16 * expSpans,
        s"scrub must cut exactly the boilerplate words ($droppedWords != ${16 * expSpans})")
      println(f"""{"probe":"dupspans","docs":$nSpanDocs,"words_per_doc":56,"L":8,""" +
        f""""spans":${spanRow.getLong(0)},"span_secs":$spanSecs%.2f,""" +
        f""""span_docs_per_sec":${nSpanDocs / spanSecs}%.0f,""" +
        f""""scrub_secs":$scrubSecs%.2f,"dropped_words":$droppedWords,""" +
        f""""scrub_docs_per_sec":${nSpanDocs / scrubSecs}%.0f}""")
      // ---- BM25 ranked retrieval at forced scale ------------------------
      // Terms with engineered selectivity over the product-skew vocabulary:
      // w0 is hot (~63% of docs draw it), w4 is mid (~1.5%), w9801 is the
      // rarest producible word (99×99), w99990 cannot occur. The cost model
      // to prove: the exploded stream filters to the query sliver BEFORE
      // the (doc, dl, term) exchange, so shuffle stays ~ the sliver — the
      // failure mode (aggregate-then-filter) shuffles every occurrence,
      // ~52 × docs.
      val bmTerms = Seq("w0", "w4", "w9801", "w99990")
      val ((bmRows, bmSecs), bmShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time { graft.ml.Retrieval.bm25TopK(docs, bmTerms, 100).collect() }
        }
      require(bmRows.length == 100, s"full top-k expected (${bmRows.length})")
      val bmScores = bmRows.map(_.getDouble(2))
      require(bmScores.zip(bmScores.tail).forall { case (a, b) => a >= b },
        "top-k must arrive score-descending")
      require(bmRows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 3),
        "hit-term counts out of range (w99990 can never match)")
      require(bmShuffle <= 3 * nDocs,
        s"BM25 shuffled $bmShuffle records — the term filter must precede the exchange (occurrence scale would be ~${52 * nDocs})")
      println(f"""{"probe":"bm25","docs":$nDocs,"terms":${bmTerms.size},"k":100,""" +
        f""""shuffle_records":$bmShuffle,"secs":$bmSecs%.2f,""" +
        f""""docs_per_sec":${nDocs / bmSecs}%.0f}""")

      // ---- span decontamination at forced scale -------------------------
      // Every 20th doc carries one planted benchmark sentence (18 words,
      // 11 complete 8-grams) appended after the URL tail; the bench set is
      // the 50-item eval table. Closed form: exactly nDocs/20 docs scrubbed,
      // 18 words dropped each. Shuffle stays ~ the HIT sliver (11 grams ×
      // contaminated docs through the island window + the tiny span set) —
      // the corpus gram stream meets the bench set on a broadcast and the
      // text arrays never shuffle.
      require(nDocs % 20 == 0, "PROBE_DOCS must be a multiple of 20 for the decontam closed form")
      val nContam = nDocs / 20
      corpus(spark, nDocs).withColumn("text",
        when(pmod(col("doc_id"), lit(20)) === 0,
          concat(col("text"), lit(" "), graft.sources.DocsAdapter.benchSentence(
            pmod(col("doc_id"), lit(graft.sources.DocsAdapter.BENCH_ITEMS.toLong)))))
          .otherwise(col("text")))
        .write.mode("overwrite").parquet(s"$root/contam")
      val contam = spark.read.parquet(s"$root/contam")
      val bench = graft.sources.DocsAdapter.benchDocs(spark)
      val ((dcAgg, dcSecs), dcShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.ml.Contamination.scrub(contam, bench, L = 8)
              .agg(count(lit(1)), sum(col("n_dropped")),
                sum(when(col("n_dropped") > 0, 1L).otherwise(0L))).head()
          }
        }
      val sentW = graft.sources.DocsAdapter.BENCH_SENTENCE_WORDS
      require(dcAgg.getLong(0) == nDocs &&
        dcAgg.getLong(1) == sentW.toLong * nContam && dcAgg.getLong(2) == nContam,
        s"decontam closed form violated (docs/dropped/scrubbed): $dcAgg")
      // measured 1.55M at 1M docs (hits cross the island window + the
      // (doc,island) agg, ~2.8 × hitGrams with AQE partials); a doc-keyed
      // corpus-text exchange would add ~nDocs on top and trip the bound
      val hitGrams = (sentW - 8 + 1).toLong * nContam
      require(dcShuffle <= 3 * hitGrams + nDocs / 2,
        s"decontam shuffled $dcShuffle records (bound ${3 * hitGrams + nDocs / 2}) — " +
          "a corpus-text exchange crept in")
      println(f"""{"probe":"decontam","docs":$nDocs,"contaminated":$nContam,""" +
        f""""dropped_words":${dcAgg.getLong(1)},"shuffle_records":$dcShuffle,""" +
        f""""secs":$dcSecs%.2f,"docs_per_sec":${nDocs / dcSecs}%.0f}""")
      // ---- heavy-hitter n-grams: MG sketch vs exact shuffle --------------
      // The web-scale shape: a tiny heavy head (5 template sentences over
      // half the corpus — top trigram counts ~nDocs/10) under a huge
      // near-unique tail (6 × nDocs/2 distinct filler trigrams). The exact
      // aggregate must shuffle the whole distinct-gram table; the sketch
      // path shuffles only the candidate summaries + candidate partials,
      // and its self-check PROVES the answer exact before serving it.
      // 5 variant-specific 7-word templates -> 25 distinct heavy trigrams,
      // each with count nDocs/10 (so the whole top-20 sits in the head)
      val hhWords = (0 until 8).map(j => concat(lit("u"), col("id"), lit(s"x$j")))
      val hhHeavy = concat_ws(" ", (0 until 7).map(j =>
        concat(lit("h"), pmod(col("id"), lit(10)), lit(s"w$j"))): _*)
      val hhDocs0 = spark.range(nDocs).select(col("id").as("doc_id"),
        when(pmod(col("id"), lit(2)) === 0, hhHeavy)
          .otherwise(concat_ws(" ", hhWords: _*)).as("text"))
      hhDocs0.write.mode("overwrite").parquet(s"$root/hh")
      val hhDocs = spark.read.parquet(s"$root/hh")
      val ((hhRes, hhSecs), hhShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            val (df, proven) =
              graft.ml.TextAnalysis.ngramTopKSketchProven(hhDocs, 3, 20, 4096)
            (df.collect().map(r => (r.getString(0), r.getLong(1))), proven)
          }
        }
      require(hhRes._2, "the heavy head clears N/(capacity+1): proof must succeed")
      val ((exRes, exSecs), exShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.ml.TextAnalysis.ngramTopK(hhDocs, 3, 20)
              .collect().map(r => (r.getString(0), r.getLong(1)))
          }
        }
      require(hhRes._1.toSeq == exRes.toSeq,
        "sketch-served top-k must equal the exact aggregate")
      require(hhRes._1.forall(_._2 >= nDocs / 10),
        s"top-k must be the heavy head: ${hhRes._1.take(3).toSeq}")
      require(5 * hhShuffle <= exShuffle,
        s"sketch must cut the shuffle >=5x (sketch $hhShuffle vs exact $exShuffle)")
      println(f"""{"probe":"hh_ngrams","docs":$nDocs,"capacity":4096,"k":20,""" +
        f""""sketch_shuffle":$hhShuffle,"exact_shuffle":$exShuffle,""" +
        f""""shuffle_ratio":${exShuffle.toDouble / math.max(hhShuffle, 1)}%.1f,""" +
        f""""sketch_secs":$hhSecs%.2f,"exact_secs":$exSecs%.2f}""")
      // ---- embedding diversity at forced scale ---------------------------
      // 1M unit vectors over 100 labels; within a label the vectors
      // alternate between TWO orthogonal basis vectors, so the mean
      // pairwise cosine has the closed form (n/2 - 1)/(n - 1) (same-basis
      // pairs contribute 1, cross pairs 0). The linear ||sum||^2 identity
      // must hit it exactly; the exchange carries (label, dim) partial
      // sums — pair enumeration would be ~n^2/labels ≈ 10^10 comparisons.
      val nDiv = sys.env.getOrElse("PROBE_DIV_VECS", "1000000").toLong
      require(nDiv % 200 == 0, "PROBE_DIV_VECS must make even per-label parity splits")
      val dBase = pmod(pmod(col("id"), lit(100L)), lit(8L)) * 2
      val dTarget = (dBase + pmod(floor(col("id") / 100), lit(2L))).cast("int")
      spark.range(nDiv).select(
        col("id").as("vec_id"),
        concat(lit("l"), pmod(col("id"), lit(100L))).as("label"),
        transform(sequence(lit(0), lit(15)),
          d => when(d === dTarget, 1.0f).otherwise(0.0f)).as("embedding"))
        .write.mode("overwrite").parquet(s"$root/divvecs")
      val divEmb = spark.read.parquet(s"$root/divvecs")
      val ((divRows, divSecs), divShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.ml.Similarity.diversityByGroup(divEmb)
              .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
          }
        }
      val nPer = nDiv / 100
      val expCos = {
        val raw = (nPer / 2.0 - 1.0) / (nPer - 1.0)
        math.round(raw * 10000).toDouble / 10000
      }
      require(divRows.length == 100 &&
        divRows.forall(r => r._2 == nPer && r._3 == expCos),
        s"diversity closed form violated (expected ($nPer, $expCos)): ${divRows.take(3).toSeq}")
      require(divShuffle <= nDiv / 10,
        s"diversity shuffled $divShuffle records — the (label, dim) partial " +
          "aggregation must combine map-side, never ship components")
      println(f"""{"probe":"diversity","vecs":$nDiv,"labels":100,"dim":16,""" +
        f""""shuffle_records":$divShuffle,"secs":$divSecs%.2f,""" +
        f""""vecs_per_sec":${nDiv / divSecs}%.0f}""")
      // ---- as-of join at forced scale -------------------------------------
      // nDocs events over 100 keys against 100k versions (1000 generations
      // per key at ord = v*1000): the as-of version of event `ord` is
      // closed-form floor(ord/1000), capped at the last generation. The
      // tag-and-union plan must ship events + versions through ONE keyed
      // exchange — a range-exploded join would blow up ~1000× on the
      // version side.
      val nVer = 100000L
      val aevents = spark.range(nDocs).select(
        col("id").as("event_id"),
        concat(lit("k"), pmod(col("id"), lit(100L))).as("key"),
        pmod(xxhash64(col("id")), lit(nVer * 10)).as("ord"))
      val aversions = spark.range(nVer).select(
        concat(lit("k"), pmod(col("id"), lit(100L))).as("key"),
        (floor(col("id") / 100) * 1000).cast("long").as("ord"),
        floor(col("id") / 100).cast("long").as("ver"))
      aevents.write.mode("overwrite").parquet(s"$root/aev")
      aversions.write.mode("overwrite").parquet(s"$root/aver")
      val (aeD, avD) = (spark.read.parquet(s"$root/aev"), spark.read.parquet(s"$root/aver"))
      val ((aoBad, aoSecs), aoShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.plans.AsOfJoin.enrich(aeD, avD, "key", "ord", Seq("ver"))
              .filter(col("ver") =!= least(floor(col("ord") / 1000),
                lit(nVer / 100 - 1)).cast("long"))
              .count()
          }
        }
      require(aoBad == 0, s"as-of closed form violated on $aoBad events")
      require(aoShuffle <= 2 * (nDocs + nVer),
        s"as-of shuffled $aoShuffle records — events + versions must cross " +
          s"one keyed exchange (bound ${2 * (nDocs + nVer)})")
      println(f"""{"probe":"asof","events":$nDocs,"versions":$nVer,"keys":100,""" +
        f""""shuffle_records":$aoShuffle,"secs":$aoSecs%.2f,""" +
        f""""events_per_sec":${nDocs / aoSecs}%.0f}""")

      // ---- bucket-count anomaly flags (median/MAD Hampel filter) ----------
      // 4 types × 1000 hours, exactly nDocs/(4·1000) events per cell, plus
      // one planted burst on (t0, hour 42). Closed form: every type's
      // median is the uniform cell count and its MAD is 0, so EXACTLY ONE
      // cell flags (strict >), carrying the burst on top of the base. The
      // shuffle bound proves the apparatus is cells-scale: raw events cross
      // only as (window, type) combine partials, so total shuffle records
      // stay far under the event count (a plan that shuffled rows before
      // aggregating would write >= nDocs records).
      require(nDocs % 4000 == 0, "PROBE_DOCS must be a multiple of 4000")
      val anBase = 1767225600L // 2026-01-01 00:00:00 UTC
      val anBurst = 5000L
      val cellN = nDocs / 4000L
      val anH = pmod(floor(col("id") / 4).cast("long"), lit(1000L))
      val uniform = spark.range(nDocs).select(
        concat(lit("t"), pmod(col("id"), lit(4L))).as("event_type"),
        timestamp_seconds(lit(anBase) + anH * 3600L +
          pmod(col("id"), lit(3600L))).as("ts"))
      val burst = spark.range(anBurst).select(
        lit("t0").as("event_type"),
        timestamp_seconds(lit(anBase) + lit(42L * 3600L) +
          pmod(col("id"), lit(3600L))).as("ts"))
      uniform.unionByName(burst).write.mode("overwrite").parquet(s"$root/anev")
      val anEvents = spark.read.parquet(s"$root/anev")
      val ((anRow, anSecs), anShuffle) =
        withStageSum(spark)(_.shuffleWriteMetrics.recordsWritten) {
          time {
            graft.plans.Anomaly.bucketCountAnomalies(anEvents)
              .agg(count(lit(1)).as("cells"),
                sum(when(col("is_anomaly"), 1L).otherwise(0L)).as("n_anom"),
                max(when(col("is_anomaly"), col("n_events"))).as("anom_n"),
                min(col("med")).as("med_lo"), max(col("med")).as("med_hi"),
                max(col("mad")).as("mad_hi"))
              .head()
          }
        }
      require(anRow.getLong(0) == 4000L, s"cells: $anRow")
      require(anRow.getLong(1) == 1L && anRow.getLong(2) == cellN + anBurst,
        s"exactly the planted burst cell must flag: $anRow")
      require(anRow.getLong(3) == cellN && anRow.getLong(4) == cellN &&
        anRow.getLong(5) == 0L,
        s"uniform medians $cellN and zero MAD everywhere: $anRow")
      require(anShuffle <= nDocs / 2,
        s"anomaly apparatus shuffled $anShuffle records — must stay " +
          s"cells-scale, never event-scale (bound ${nDocs / 2})")
      println(f"""{"probe":"anomaly","events":${nDocs + anBurst},"cells":4000,""" +
        f""""shuffle_records":$anShuffle,"secs":$anSecs%.2f,""" +
        f""""events_per_sec":${(nDocs + anBurst) / anSecs}%.0f}""")
    } finally {
      spark.stop()
      graft.util.Dirs.deleteRecursively(new File(root))
    }
  }
}
