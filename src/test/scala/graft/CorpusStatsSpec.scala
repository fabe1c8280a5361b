package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.CorpusStats
import graft.plans.LinkGraph

/** Corpus statistics + link-graph operators: hand-computed closed forms on
  * tiny inputs (the oracle gate covers the corpus-scale runs).
  */
class CorpusStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("collocations: exact lift on a fixed corpus, minCount prunes the tail") {
    // 5 docs "x y": c(x)=c(y)=5, N_w=10, pairs=(x,y)x5, N_p=5
    // lift = 5*10/5*10/5/5 = 4.0 exactly
    val docs = Seq.fill(5)("x y").toDF("text")
    val rows = CorpusStats.collocations(docs, window = 2, minCount = 5, k = 10)
      .collect()
    assert(rows.length === 1)
    val r = rows.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)) ===
      (("x", "y", 5L, 4.0)))
    // below minCount: nothing survives
    assert(CorpusStats.collocations(docs, window = 2, minCount = 6, k = 10)
      .count() === 0)
  }

  test("collocations: window=2 sees the gap-2 pair, plan takes top-k without a global sort") {
    val docs = Seq.fill(5)("a b c").toDF("text")
    val out = CorpusStats.collocations(docs, window = 2, minCount = 5, k = 10)
    val pairs = out.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("a", "b"), ("b", "c"), ("a", "c")))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"expected TakeOrdered in:\n$plan")
  }

  test("vocabCoverage: closed-form walk incl. a tie-cell split") {
    // counts: token 1 x10, tokens 2,3 x5 each (tie cell), token 4 x1; total 21
    val toks = Seq.fill(10)(1) ++ Seq.fill(5)(2) ++ Seq.fill(5)(3) ++ Seq(4)
    val seqs = Seq((0L, toks)).toDF("doc_id", "tokens")
    val got = CorpusStats.vocabCoverage(seqs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // p=50: target 11 -> 1 token of the c=5 cell  => vocab 2, covered 15
    // p=90: target 19 -> 2 tokens of the c=5 cell => vocab 3, covered 20
    // p=99: target 21 -> the c=1 cell             => vocab 4, covered 21
    assert(got === Set((50, 2L, 15L, 21L), (90, 3L, 20L, 21L),
      (99, 4L, 21L, 21L)))
  }

  test("lengthBatchCost: sorted batching eliminates the padding arrival pays") {
    // lengths in doc order: 4,1,4,1 with batch=2
    // sorted  -> [4,4],[1,1]: pad 0 ; arrival -> [4,1],[4,1]: pad 3+3
    val seqs = Seq(
      (0L, Seq(1, 1, 1, 1)), (1L, Seq(1)), (2L, Seq(2, 2, 2, 2)), (3L, Seq(2))
    ).toDF("doc_id", "tokens")
    val got = CorpusStats.lengthBatchCost(seqs, batch = 2).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got("sorted") === ((2L, 10L, 0L)))
    assert(got("arrival") === ((2L, 10L, 6L)))
  }

  test("hostEdges: no self-loops, 1..3 out-links per doc before distinct") {
    val docs = spark.range(200).select(col("id").as("doc_id"))
    val e = LinkGraph.hostEdges(docs, hosts = 7)
    assert(e.filter(col("src") === col("dst")).count() === 0)
    assert(e.count() > 0)
    assert(e.agg(max("src"), max("dst")).head().toSeq.forall(
      _.asInstanceOf[Long] < 7))
  }

  test("keywords: linear-idf tf-idf ranks rare-and-frequent first, WindowGroupLimit in plan") {
    // N=3; df: apple 1, banana 2, cherry 2, common 3
    val docs = Seq(
      (0L, "apple apple banana common common"),
      (1L, "banana cherry common"),
      (2L, "common cherry cherry cherry")).toDF("doc_id", "text")
    val out = graft.ml.TextAnalysis.keywords(docs, k = 2)
    val d0 = out.filter(col("doc_id") === 0).orderBy("rn").collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getInt(3)))
    // doc0: apple 2*3/1=6.0 > common 2*3/3=2.0 > banana 1*3/2=1.5 (cut)
    assert(d0.toSeq === Seq(("apple", 6.0, 1), ("common", 2.0, 2)))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"row_number<=k must rewrite to a map-side group limit:\n$plan")
  }

  test("bigramLmScore: add-one conditional model, <2-word docs emit no row") {
    // corpus: two copies of "x y" and one 1-word doc; the 1-word doc has
    // no bigram but its word IS vocabulary: c(x,y)=2, c(x)=2, V=3
    // -> lp = log10((2+1)/(2+3)) per bigram
    val docs = Seq((0L, "x y"), (1L, "x y"), (2L, "solo"))
      .toDF("doc_id", "text")
    val rows = graft.ml.TextAnalysis.bigramLmScore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val exp = math.round(math.log10(3.0 / 5) * 1e4) / 1e4
    assert(rows.toSeq === Seq((0L, 1L, exp), (1L, 1L, exp)))
  }

  test("bigramLmScore: scrambled word order scores lower than natural order") {
    // 10 copies of the same sentence + 1 scrambled copy: the scrambled
    // doc's bigrams are unseen (count 1 = itself), so it must score lower
    val natural = (0 until 10).map(i => (i.toLong, "the cat sat on the mat"))
    val docs = (natural :+ ((10L, "mat the on sat cat the")))
      .toDF("doc_id", "text")
    val s = graft.ml.TextAnalysis.bigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(10L) < s(0L), s"scrambled ${s(10L)} should be < natural ${s(0L)}")
  }

  test("pagerank: one fixed-point iteration matches the hand recurrence") {
    // edges 0->1, 1->2, 2->0, 0->2 ; deg 0:2, 1:1, 2:1 ; hosts=3
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L)).toDF("src", "dst")
    val pr = LinkGraph.pagerank(edges, hosts = 3, iters = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pr0 = 333333333333 each; base = 50000000000
    // pr1(0) = base + (pr0 div 1)*85 div 100             = 333333333333
    // pr1(1) = base + (pr0 div 2)*85 div 100             = 191666666666
    // pr1(2) = base + (pr0 div 1 + pr0 div 2)*85 div 100 = 474999999999
    assert(pr === Map(0L -> 333333333333L, 1L -> 191666666666L,
      2L -> 474999999999L))
    // mass sanity over more iterations: total stays below FP (damping leak)
    val pr3 = LinkGraph.pagerank(edges, hosts = 3, iters = 3)
      .agg(sum("pr")).head().getLong(0)
    assert(pr3 > 0L && pr3 <= LinkGraph.FP)
  }
}
