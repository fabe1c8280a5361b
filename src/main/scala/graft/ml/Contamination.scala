package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-grams with a held-out evaluation set.
  *
  * Scale shape: both sides explode to (shingle-hash, id) rows; the
  * benchmark side is tiny (an eval set), so the match is a broadcast
  * equi-join on the hash — the corpus side stays map-only, no wide
  * shuffle. Exact string n-grams (not minhash): decontamination wants
  * zero false negatives at the chosen n.
  */
object Contamination {

  /** Deterministic holdout "benchmark": every doc with doc_id % mod == 0. */
  def holdout(docs: DataFrame, mod: Int = 97): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(mod)) === 0)

  def holdoutSql(docsRel: String, mod: Int = 97): String =
    s"(SELECT * FROM $docsRel WHERE doc_id % $mod = 0)"

  /** (doc_id, n_contaminated_ngrams) for corpus docs sharing at least one
    * k-word shingle with the benchmark set.
    */
  def flag(docs: DataFrame, bench: DataFrame): DataFrame = {
    val docShingles = docs.select(col("doc_id"),
      explode(TextDedup.shinglesCol(col("text"))).as("sh"))
    val benchShingles = bench.select(
      explode(TextDedup.shinglesCol(col("text"))).as("sh")).distinct()
    docShingles.join(broadcast(benchShingles), Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated_ngrams"))
  }

  def flagSql(docsRel: String, benchRel: String): String =
    s"""WITH ds AS (SELECT doc_id, unnest(${TextDedup.shinglesSql("text")}) AS sh FROM $docsRel),
       |bs AS (SELECT DISTINCT unnest(${TextDedup.shinglesSql("text")}) AS sh FROM $benchRel)
       |SELECT ds.doc_id, count(*) AS n_contaminated_ngrams
       |FROM ds JOIN bs ON ds.sh = bs.sh GROUP BY ds.doc_id""".stripMargin.replace("\n", " ")

  /** SPAN-level decontamination: cut every benchmark-overlapping run out of
    * the training text instead of dropping whole documents (the surgical
    * variant of [[flag]] — dropping a long page for one leaked question
    * wastes the rest of it). Every maximal run of normalized words whose
    * L-grams all appear in the benchmark set is removed, exactly like
    * [[TextDedup.scrubDupSpans]] removes corpus-internal duplicate runs:
    * positioned L-gram fingerprints (map-only posexplode), hits against the
    * benchmark gram set, gaps-and-islands merge, indexed array-filter
    * rebuild.
    *
    * Scale shape: the benchmark side is an eval set (tiny), so its distinct
    * gram hashes ride a broadcast and the corpus-side gram stream never
    * shuffles for the match; the only corpus-keyed exchanges are the
    * doc-keyed island window over HIT positions (the contaminated sliver,
    * not the corpus) and the left join of the tiny span set back onto the
    * corpus — document text itself never shuffles. Returns
    * (doc_id, n_words, n_dropped, text).
    */
  def scrub(docs: DataFrame, bench: DataFrame, L: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def gramArr(ws: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), size(ws) - L),
        i => TextDedup.hash64Col(concat_ws(" ", slice(ws, i + 1, lit(L)))))
    val words = docs
      .select(col("doc_id"), split(TextDedup.normalizeCol(col("text")), " ").as("ws"))
    val grams = words.filter(size(col("ws")) >= L)
      .select(col("doc_id"), posexplode(gramArr(col("ws"))).as(Seq("pos", "gh")))
    val benchGrams = bench
      .select(split(TextDedup.normalizeCol(col("text")), " ").as("ws"))
      .filter(size(col("ws")) >= L)
      .select(explode(gramArr(col("ws"))).as("gh")).distinct()
    val hits = grams.join(broadcast(benchGrams), Seq("gh")).select("doc_id", "pos")
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val spans = hits
      .withColumn("newi",
        when(col("pos") > lag(col("pos"), 1, -L).over(byDoc) + L, 1).otherwise(0))
      .withColumn("island", sum(col("newi")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"), (max(col("pos")) + L).as("span_end"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("spans"))
    words.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("ws"),
        when(col("spans").isNull, col("ws"))
          .otherwise(filter(col("ws"), (_, i) =>
            !exists(col("spans"), sp =>
              i >= sp.getField("span_start") && i < sp.getField("span_end"))))
          .as("kept"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        (size(col("ws")) - size(col("kept"))).cast("long").as("n_dropped"),
        concat_ws(" ", col("kept")).as("text"))
  }

  /** TOKEN-SPACE decontamination — the variant a pre-tokenized pipeline
    * (the BASELINE input_hint shape: `tokens array<int>`) actually runs,
    * since eval sets leak as token subsequences regardless of surface
    * text: flag every sequence sharing at least one L-token window with
    * the benchmark's token sequences. Same scale shape as [[flag]]: both
    * sides hash positioned windows (map-only), the benchmark side is tiny
    * and distinct-deduped onto a broadcast, the corpus side never
    * shuffles; per-doc counts are the only aggregate.
    * Returns (doc_id, n_contaminated_grams).
    */
  def flagTokens(seqs: DataFrame, bench: DataFrame, L: Int = 8): DataFrame = {
    def gramArr(ts: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), size(ts) - L),
        i => TextDedup.hash64Col(
          concat_ws(" ", transform(slice(ts, i + 1, lit(L)), _.cast("string")))))
    val docGrams = seqs.filter(size(col("tokens")) >= L)
      .select(col("doc_id"), explode(gramArr(col("tokens"))).as("gh"))
    val benchGrams = bench.filter(size(col("tokens")) >= L)
      .select(explode(gramArr(col("tokens"))).as("gh")).distinct()
    docGrams.join(broadcast(benchGrams), Seq("gh"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated_grams"))
  }

  /** DuckDB twin of [[flagTokens]] — same positioned windows and hash over
    * the space-joined token slice.
    */
  def flagTokensSql(seqsRel: String, benchRel: String, L: Int = 8): String = {
    val gram = TextDedup.hash64Sql(s"array_to_string(tokens[pos + 1 : pos + $L], ' ')")
    s"""WITH tkd AS (SELECT doc_id, $gram AS gh
       |  FROM (SELECT doc_id, tokens, unnest(generate_series(0, len(tokens) - $L)) AS pos
       |    FROM $seqsRel WHERE len(tokens) >= $L)),
       |tkb AS (SELECT DISTINCT $gram AS gh
       |  FROM (SELECT tokens, unnest(generate_series(0, len(tokens) - $L)) AS pos
       |    FROM $benchRel WHERE len(tokens) >= $L))
       |SELECT d.doc_id, count(*) AS n_contaminated_grams
       |FROM tkd d JOIN tkb USING (gh) GROUP BY d.doc_id""".stripMargin.replace("\n", " ")
  }

  /** DuckDB twin of [[scrub]]: same positioned grams, benchmark gram set,
    * island merge, and ordered rebuild.
    */
  def scrubSql(docsRel: String, benchRel: String, L: Int = 8): String = {
    val norm = TextDedup.normalizeSql("text")
    s"""WITH cwsrc AS (SELECT doc_id, string_split($norm, ' ') AS ws FROM $docsRel),
       |cpos AS (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - $L)) AS pos
       |  FROM cwsrc WHERE len(ws) >= $L),
       |cgrams AS (SELECT doc_id, pos,
       |    ${TextDedup.hash64Sql(s"array_to_string(ws[pos + 1 : pos + $L], ' ')")} AS gh FROM cpos),
       |bgrams AS (SELECT DISTINCT
       |    ${TextDedup.hash64Sql(s"array_to_string(ws[pos + 1 : pos + $L], ' ')")} AS gh
       |  FROM (SELECT ws, unnest(generate_series(0, len(ws) - $L)) AS pos
       |    FROM (SELECT string_split($norm, ' ') AS ws FROM $benchRel) WHERE len(ws) >= $L)),
       |chits AS (SELECT g.doc_id, g.pos FROM cgrams g JOIN bgrams USING (gh)),
       |cisl AS (SELECT doc_id, pos,
       |    CASE WHEN pos > lag(pos, 1, -$L) OVER (PARTITION BY doc_id ORDER BY pos) + $L
       |      THEN 1 ELSE 0 END AS newi FROM chits),
       |cisl2 AS (SELECT doc_id, pos,
       |    sum(newi) OVER (PARTITION BY doc_id ORDER BY pos) AS island FROM cisl),
       |cspans AS (SELECT doc_id, min(pos) AS span_start, max(pos) + $L AS span_end
       |  FROM cisl2 GROUP BY doc_id, island),
       |ctok AS (SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 1)) AS i FROM cwsrc),
       |ckept AS (SELECT t.doc_id, t.i, t.ws[t.i + 1] AS w FROM ctok t
       |  WHERE NOT EXISTS (SELECT 1 FROM cspans s
       |    WHERE s.doc_id = t.doc_id AND t.i >= s.span_start AND t.i < s.span_end)),
       |creb AS (SELECT doc_id, count(*) AS n_kept,
       |  string_agg(w, ' ' ORDER BY i) AS text FROM ckept GROUP BY doc_id)
       |SELECT w.doc_id, CAST(len(w.ws) AS BIGINT) AS n_words,
       |  CAST(len(w.ws) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_dropped,
       |  COALESCE(r.text, '') AS text
       |FROM cwsrc w LEFT JOIN creb r ON w.doc_id = r.doc_id""".stripMargin.replace("\n", " ")
  }
}
