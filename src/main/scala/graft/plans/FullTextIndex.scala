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
  *   - **lookup**: AND of the fragment words = groupBy(doc_id) counting
  *     distinct matched words; the (small, selective) candidate set then
  *     left-semi joins the event table (AQE turns it into a broadcast
  *     join at runtime when it is small).
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

  /** doc_ids containing ALL the given words (the MATCH-AND prefilter). */
  def candidates(spark: SparkSession, indexDir: String, words: Seq[String]): DataFrame = {
    val distinctWords = words.distinct
    spark.read.parquet(indexDir)
      .filter(col("word").isin(distinctWords: _*))
      .groupBy("doc_id")
      .agg(count_distinct(col("word")).as("_nw"))
      .filter(col("_nw") === distinctWords.size)
      .select("doc_id")
  }

  /** Run a search through the index when its positive fragments allow it;
    * identical results (and frame type) to `engine.run(query, ...)` either
    * way — the narrowed engine compiles the FULL pipeline, so steps, time
    * bounds and table projections all behave normally.
    */
  def searchFrame(spark: SparkSession, engine: QueryEngine, indexDir: String,
      query: String,
      start: Option[java.sql.Timestamp] = None,
      end: Option[java.sql.Timestamp] = None): graft.compile.Frame = {
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
      val narrowed = engine.events.join(cand, Seq("doc_id"), "left_semi")
      val sub = new QueryEngine(narrowed, engine.configs)
      sub.run(query, start, end)
    } else {
      engine.runSteps(steps) // transparent fallback: full scan
    }
  }

  def search(spark: SparkSession, engine: QueryEngine, indexDir: String,
      query: String,
      start: Option[java.sql.Timestamp] = None,
      end: Option[java.sql.Timestamp] = None): DataFrame =
    searchFrame(spark, engine, indexDir, query, start, end).df
}
