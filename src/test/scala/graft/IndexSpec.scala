package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.FullTextIndex
import graft.sources.EventsAdapter

/** The inverted full-text index (reference FTS4 EventRaws + MATCH prefilter,
  * SqliteEventRepository.go:64-65,305-352): results must equal the full-scan
  * path on every query shape, and the lookup must prune at the scan.
  */
class IndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val engine = EventsAdapter.engine(spark, dir)
  private lazy val indexDir: String = {
    val d = Files.createTempDirectory("graft-ftindex").toString
    FullTextIndex.build(engine.events, d)
    d
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("doc_id").collect().map(_.getString(0)).toSet

  test("indexed search == scan search for plain word fragments") {
    for (q <- Seq("error", "error userid=13", "purchase NOT signup",
        "error | where userid=13")) {
      val scan = rows(engine.run(q).df)
      val indexed = rows(FullTextIndex.search(spark, engine, indexDir, q))
      assert(indexed == scan, s"query '$q': indexed ${indexed.size} vs scan ${scan.size}")
      assert(scan.nonEmpty, s"query '$q' must be non-trivial")
    }
  }

  test("non-indexable fragments fall back to the scan, same results") {
    for (q <- Seq("err*r", "eventtype=p*")) { // wildcard / no positive fragment
      val scan = rows(engine.run(q).df)
      val indexed = rows(FullTextIndex.search(spark, engine, indexDir, q))
      assert(indexed == scan, s"query '$q'")
    }
  }

  test("multi-word AND narrows through the postings") {
    val cand = FullTextIndex.candidates(spark, indexDir, Seq("error", "performing"))
    val all = engine.events.count()
    val n = cand.count()
    assert(n > 0 && n < all, s"AND-candidates must narrow: $n of $all")
  }

  test("postings lookup pushes the word filter to the parquet scan") {
    val plan = spark.read.parquet(indexDir)
      .filter(col("word") === "error")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(word), EqualTo(word,error)]"),
      s"word filter must reach the scan (sorted files -> row-group pruning):\n$plan")
  }

  test("indexed search plan contains the semi-join prefilter") {
    val df = FullTextIndex.search(spark, engine, indexDir, "error")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"prefilter must be a left-semi join:\n$plan")
  }

  test("streaming ingest maintains the index; indexed query over sinks == scan") {
    import graft.data.SequenceGen
    import graft.plans.LogPipeline
    val in = Files.createTempDirectory("ftidx-stream-in").toString
    val out = Files.createTempDirectory("ftidx-stream-out").toString
    val ckpt = Files.createTempDirectory("ftidx-stream-ckpt").toString
    val idx = Files.createTempDirectory("ftidx-stream-idx").toString
    SequenceGen.sequences(spark, 1000, 2).write.mode("overwrite").parquet(in)
    val q = graft.streaming.StreamingPipeline.ingest(
      spark, in, out, ckpt, SequenceGen.configs, indexDir = Some(idx))
    q.awaitTermination()
    val sinks = LogPipeline.openSinks(spark, out)
    val eng = new graft.compile.QueryEngine(sinks, SequenceGen.configs)
    val query = "reticulated"
    val scan = rows(eng.run(query).df)
    val indexed = rows(FullTextIndex.search(spark, eng, idx, query))
    assert(indexed == scan && scan.nonEmpty,
      s"index built at ingest must answer like the scan: ${indexed.size} vs ${scan.size}")
  }
}
