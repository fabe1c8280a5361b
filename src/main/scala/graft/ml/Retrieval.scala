package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked full-text retrieval over `documents` — the operator behind "search
  * the corpus" workflows (query-relevant subset mining for targeted training
  * mixes, and the natural ranked upgrade of the reference's boolean
  * fragment search, pipeline/pipeline.go + jobs/engine.go being its
  * unranked analog).
  *
  * BM25 (Robertson-Spärck Jones / Lucene form):
  *   score(d, q) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))
  *   idf(t)      = log10(1 + (N - df + 0.5)/(df + 0.5))
  *
  * Cross-engine parity: per-(doc, term) contributions become fixed-point
  * BIGINTs (`round(1e6·idf·tfnorm)` — the [[TextAnalysis.CLF_SCALE]]
  * pattern), so the per-doc score is an exact integer sum at any
  * parallelism and the top-k cut is deterministic; ties at the boundary
  * break on doc_id in both engines.
  *
  * Scale shape: document length rides the explode (a pure row function,
  * like the classifier label — never a per-doc join back), the exploded
  * stream is filtered to the query's terms BEFORE the (doc, dl, term)
  * aggregate so only the query-relevant sliver shuffles, df/totals are
  * term-cardinality and 1-row aggregates riding broadcasts, and the final
  * top-k is a TakeOrdered — never a global sort. The full corpus is touched
  * by exactly two map-only passes (the filtered explode + the totals scan).
  */
object Retrieval {

  val BM25_SCALE = 1000000L
  val K1 = "1.2"
  val B = "0.75"

  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame = {
    val words = split(TextDedup.normalizeCol(col("text")), " ")
    // dl is a pure function of the row: ride it through the explode
    val occ = docs
      .select(col("doc_id"), size(words).as("dl"), explode(words).as("w"))
      .filter(col("w").isInCollection(terms))
      .groupBy("doc_id", "dl", "w").agg(count(lit(1)).as("tf"))
    val totals = docs.select(size(words).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("l"))
    val dfT = occ.groupBy("w").agg(count(lit(1)).as("df"))
    // literal doubles written once and spliced into BOTH engines' plans, so
    // the IEEE op sequence is identical token-for-token
    val (k1, k1p1, b1, b) = (K1.toDouble, 1.0 + K1.toDouble, 1.0 - B.toDouble, B.toDouble)
    occ.join(broadcast(dfT), Seq("w"))
      .crossJoin(broadcast(totals))
      .withColumn("idf",
        log10(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("tfn",
        col("tf") * lit(k1p1) /
          (col("tf") + lit(k1) * (lit(b1) + lit(b) * col("dl") /
            (col("l").cast("double") / col("n")))))
      .withColumn("c", round(lit(BM25_SCALE) * col("idf") * col("tfn")).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_terms"), sum(col("c")).as("score_scaled"))
      .orderBy(col("score_scaled").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("n_hit_terms"),
        round(col("score_scaled").cast("double") / BM25_SCALE, 4).as("bm25"))
  }

  /** Rank an arbitrary frame by BM25 of one of its text columns and keep
    * the top-k rows WITH their original columns plus `bm25` — the engine's
    * `| bm25` pipeline step. Scoring runs over the (id, text) projection
    * (the sliver shapes of [[bm25TopK]]); the k result ids then ride a
    * broadcast back onto the full frame, so wide event rows never join
    * shuffle-side and the final order is a k-row sort.
    */
  def bm25JoinBack(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int): DataFrame = {
    // pin the narrow (id, text) scoring projection: bm25TopK reads its
    // input twice (the filtered explode + the totals scan), and `df` here
    // is a computed search result whose subtree would otherwise re-run the
    // whole upstream scan per read (3x total with the join-back; guide
    // §1.2). The pinned sliver is the matched set's two columns — the
    // selective-search contract of a `| bm25` step — while the wide event
    // rows still never shuffle (the k winners ride the broadcast back).
    val proj = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .localCheckpoint(true)
    val scores = bm25TopK(proj, terms, k)
      .select(col("doc_id").as(idCol), col("bm25"))
    df.join(broadcast(scores), Seq(idCol))
      .orderBy(col("bm25").desc, col(idCol))
  }

  /** DuckDB twin of [[bm25TopK]] — same fixed-point contributions, same
    * (score_scaled desc, doc_id) cut.
    */
  def bm25TopKSql(docsRel: String, terms: Seq[String], k: Int): String = {
    val norm = TextDedup.normalizeSql("text")
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val k1p1 = (1.0 + K1.toDouble).toString
    val b1 = (1.0 - B.toDouble).toString
    s"""WITH bm_occ AS (SELECT doc_id, dl, w, count(*) AS tf
       |  FROM (SELECT doc_id, len(ws) AS dl, unnest(ws) AS w
       |        FROM (SELECT doc_id, string_split($norm, ' ') AS ws FROM $docsRel))
       |  WHERE w IN ($termList) GROUP BY doc_id, dl, w),
       |bm_tot AS (SELECT count(*) AS n, CAST(sum(len(string_split($norm, ' '))) AS BIGINT) AS l FROM $docsRel),
       |bm_df AS (SELECT w, count(*) AS df FROM bm_occ GROUP BY w)
       |SELECT doc_id, count(*) AS n_hit_terms,
       |  round(CAST(sum(c) AS DOUBLE) / $BM25_SCALE, 4) AS bm25
       |FROM (SELECT doc_id,
       |    CAST(round($BM25_SCALE *
       |      log10(1.0 + (n - df + 0.5) / (df + 0.5)) *
       |      (tf * $k1p1 / (tf + $K1 * ($b1 + $B * dl / (CAST(l AS DOUBLE) / n))))) AS BIGINT) AS c
       |  FROM bm_occ JOIN bm_df USING (w), bm_tot)
       |GROUP BY doc_id ORDER BY sum(c) DESC, doc_id LIMIT $k""".stripMargin.replace("\n", " ")
  }
}
