package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.compile.QueryEngine

/** Spark-native analog of the reference's inverted full-text index
  * (FTS4 `EventRaws` virtual table, plugins/sqlite_events/
  * SqliteEventRepository.go:64-65 + the MATCH prefilter at :305-352).
  *
  * logsuck's architecture is: narrow candidates through the inverted index
  * (`raw MATCH 'frag …'`), then re-check the full predicate per event
  * (`shouldIncludeEvent`, plugins/steps/Fragments.go:91-135). The rebuild
  * keeps exactly that split:
  *
  *   - **postings**: one row per (word, doc_id), words = the word-boundary
  *     split of the lowercased rendered text — the SAME boundary class
  *     (`\W` = [^a-z0-9_]) that `compileFrag` anchors on, so for a plain
  *     word fragment the posting lookup is not just a prefilter, it is
  *     EXACT. Stored sorted by word so parquet row-group min/max stats
  *     prune lookups to a handful of pages (the scale analog of a B-tree
  *     probe; the reference's `order=DESC` trick plays the same game).
  *   - **lookup**: the rarest queried word's posting list is the candidate
  *     set (a superset suffices — the recheck is total); selective
  *     candidates are collected and pushed into the event scan as an IN
  *     filter BELOW the render projection (the reference's own
  *     `MATCH -> id list -> WHERE id IN (...)` shape), un-selective ones
  *     fall back to a distributed left-semi join.
  *   - **re-check**: the full compiled search predicate runs on the
  *     surviving rows — wildcards, NOT-fragments, field predicates and
  *     time bounds are never trusted to the index.
  *
  * Fragments that are not plain words (wildcards, embedded punctuation)
  * make the index inapplicable for that query -> transparent full scan,
  * same results (IndexSpec asserts scan == indexed on every shape).
  */
object FullTextIndex {
  /** Word-boundary class of compileFrag's `\W`, post-lowercase. */
  private val SPLIT = "[^a-z0-9_]+"

  /** Is this fragment exactly answerable by the index (a plain word)? */
  def indexable(frag: String): Boolean =
    frag.nonEmpty && frag.matches("[a-z0-9_]+")

  /** Build the postings table from an event frame (needs doc_id + raw).
    * One shuffle + sorted write: at 10^12 rows the postings are append-only
    * per ingest batch, like the reference inserts into EventRaws alongside
    * Events.
    *
    * Range partitioning on (word, doc_id) — NOT a hash repartition on
    * word — because posting lists are Zipf-skewed: a stop word that appears
    * in every event would pull the whole corpus into one hash partition.
    * The range partitioner's sampler splits a hot word's postings across
    * consecutive partitions, while the output stays globally word-ordered,
    * so parquet row-group min/max stats still prune a word lookup to a few
    * pages.
    */
  def build(events: DataFrame, outDir: String, numPartitions: Int = 0): Unit = {
    val parts =
      if (numPartitions > 0) numPartitions
      else events.sparkSession.sparkContext.defaultParallelism
    events
      .select(col("doc_id"),
        explode(array_distinct(split(lower(col("raw")), SPLIT))).as("word"))
      .filter(length(col("word")) > 0)
      .repartitionByRange(parts, col("word"), col("doc_id"))
      .sortWithinPartitions("word", "doc_id")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Candidate doc_ids for an AND of words — a SUPERSET is sufficient
    * (searchFrame re-checks the full predicate on survivors), so the
    * lookup takes the RAREST word's posting list alone: it is the smallest
    * available superset and needs no shuffle, where the exact multi-way
    * intersection pays a doc_id-keyed aggregation over EVERY posting list
    * (a corpus-frequent word like a log-format keyword drags the whole
    * table through that shuffle). Selectivity comes from a first cheap
    * per-word count over the pruned scan; a queried word with no postings
    * at all short-circuits to the empty frame (the AND is unsatisfiable).
    */
  def candidates(spark: SparkSession, indexDir: String, words: Seq[String]): DataFrame = {
    val distinctWords = words.distinct
    val postings = spark.read.parquet(indexDir)
    val rarest =
      if (distinctWords.size == 1) distinctWords.head
      else {
        val counts = postings.filter(col("word").isin(distinctWords: _*))
          .groupBy("word").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        if (counts.size < distinctWords.size)
          return postings.filter(lit(false)).select("doc_id")
        counts.minBy(_._2)._1
      }
    // (word, doc_id) rows are unique by construction — no distinct needed
    postings.filter(col("word") === rarest).select("doc_id")
  }

  /** Run a search through the index when its positive fragments allow it;
    * identical results (and frame type) to `engine.run(query, ...)` either
    * way — the narrowed engine compiles the FULL pipeline, so steps, time
    * bounds and table projections all behave normally.
    */
  def searchFrame(spark: SparkSession, engine: QueryEngine, indexDir: String,
      query: String,
      start: Option[java.sql.Timestamp] = None,
      end: Option[java.sql.Timestamp] = None,
      maxIdFilter: Int = MaxIdFilter): graft.compile.Frame = {
    // Fragments must come from the POST-ELISION pipeline: compile() discards
    // everything before the last generator (Pipeline.go:89-95), so narrowing
    // by an earlier step's fragments ("error | surrounding …") would feed the
    // surviving generator an index-filtered event table and diverge from the
    // scan path. After elision the surviving generator is steps.head — the
    // index applies exactly when that head is a SearchStep.
    val steps = engine.compile(query, start, end)
    val frags: Vector[String] = steps.headOption match {
      case Some(s: engine.SearchStep) => s.search.fragments
      case _ => Vector.empty
    }
    if (frags.nonEmpty && frags.forall(indexable)) {
      val cand = candidates(spark, indexDir, frags.toSeq)
      // Selective path — the reference's own shape: FTS MATCH -> candidate
      // id list -> `WHERE id IN (...)` against Events
      // (SqliteEventRepository.go:305-352). Collecting the ids and pushing
      // them as an IN filter lets Catalyst slide the predicate BELOW the
      // event frame's render/extract projection (it references only
      // doc_id), so the expensive per-row rendering runs ONLY on
      // candidates. The semi-join form keeps the join ABOVE that
      // projection — it renders the whole corpus first, which at sf0.1
      // already made the indexed path 4x slower than a plain scan and at
      // table scale would defeat the index entirely. Past the id bound the
      // list stops being "small" in the reference's sense too; fall back
      // to the distributed semi-join (correct, render-all).
      val ids = cand.limit(maxIdFilter + 1).collect().map(_.getString(0))
      // build the InSet predicate directly: `isin` would materialize one
      // Literal node per id — a 20k-child expression tree whose analysis
      // alone costs more than the narrowed query it guards
      def idFilter = org.apache.spark.sql.graftbridge.Bridge.column(
        org.apache.spark.sql.catalyst.expressions.InSet(
          org.apache.spark.sql.graftbridge.Bridge.expression(col("doc_id")),
          ids.map(s => org.apache.spark.unsafe.types.UTF8String.fromString(s): Any).toSet))
      val narrowed =
        if (ids.length <= maxIdFilter) engine.events.filter(idFilter)
        else engine.events.join(cand, Seq("doc_id"), "left_semi")
      val sub = new QueryEngine(narrowed, engine.configs)
      sub.run(query, start, end)
    } else {
      engine.runSteps(steps) // transparent fallback: full scan
    }
  }

  /** Candidate-id bound for the collected IN-filter path: beyond this, an
    * un-selective fragment's id list goes back through the distributed
    * semi-join instead of the driver. 100k strings ~ a few MB on the
    * driver — the same order as the reference's FTS candidate pages.
    */
  val MaxIdFilter = 100000

  def search(spark: SparkSession, engine: QueryEngine, indexDir: String,
      query: String,
      start: Option[java.sql.Timestamp] = None,
      end: Option[java.sql.Timestamp] = None,
      maxIdFilter: Int = MaxIdFilter): DataFrame =
    searchFrame(spark, engine, indexDir, query, start, end, maxIdFilter).df
}
