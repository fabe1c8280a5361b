package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Documents/embeddings adapters for the training-data operators.
  *
  * The raw synthetic corpus has no duplicates, so dedup operators would
  * return empty (trivially matching) results. Both engines therefore derive
  * the same *augmented* set: a deterministic subset plus exact copies and
  * near-copies with shifted ids — giving every dedup operator a non-empty,
  * fully-oracled answer.
  */
object DocsAdapter {
  val EXACT_SHIFT = 1000000L
  val NEAR_SHIFT = 2000000L
  val NEAR_SUFFIX = " extra trailing words appended here"

  /** The sandbox tables arrive as ONE parquet file, so a few hundred docs
    * land in 1-2 scan partitions and per-doc-heavy operators (shingling,
    * embeddings math) run near-single-threaded. On a real cluster the input
    * comes pre-split; redistributing tiny inputs restores that shape.
    */
  private def spread(df: DataFrame, spark: SparkSession): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)

  /** Subset (1/`mod` of docs) + exact copies (ids % 7) + near copies (ids % 13). */
  def augmentedDocs(spark: SparkSession, sfDir: String, mod: Int = 10): DataFrame = {
    val d = spread(spark.read.parquet(s"$sfDir/documents.parquet"), spark)
      .filter(pmod(col("doc_id"), lit(mod)) === 0)
    val exact = d.filter(pmod(col("doc_id"), lit(7)) === 0)
      .withColumn("doc_id", col("doc_id") + EXACT_SHIFT)
    val near = d.filter(pmod(col("doc_id"), lit(13)) === 0)
      .withColumn("doc_id", col("doc_id") + NEAR_SHIFT)
      .withColumn("text", concat(col("text"), lit(NEAR_SUFFIX)))
    d.unionByName(exact).unionByName(near)
  }

  /** DuckDB twin of [[augmentedDocs]] as a relation expression. */
  def augmentedDocsSql(mod: Int = 10): String =
    s"""(SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id % $mod = 0
       | UNION ALL SELECT doc_id + $EXACT_SHIFT, text, lang, source, n_chars FROM documents WHERE doc_id % $mod = 0 AND doc_id % 7 = 0
       | UNION ALL SELECT doc_id + $NEAR_SHIFT, text || '$NEAR_SUFFIX', lang, source, n_chars FROM documents WHERE doc_id % $mod = 0 AND doc_id % 13 = 0)""".stripMargin.replace("\n", " ")

  val VEC_SHIFT = 100000L

  /** Embedding subset (1/`mod`) + exact copies of ids % 5 under shifted ids. */
  def augmentedEmbeddings(spark: SparkSession, sfDir: String, mod: Int = 25): DataFrame = {
    val e = spread(spark.read.parquet(s"$sfDir/embeddings.parquet"), spark)
      .filter(pmod(col("vec_id"), lit(mod)) === 0)
    val copies = e.filter(pmod(col("vec_id"), lit(5)) === 0)
      .withColumn("vec_id", col("vec_id") + VEC_SHIFT)
    e.unionByName(copies)
  }

  def augmentedEmbeddingsSql(mod: Int = 25): String =
    s"""(SELECT vec_id, embedding, label FROM embeddings WHERE vec_id % $mod = 0
       | UNION ALL SELECT vec_id + $VEC_SHIFT, embedding, label FROM embeddings WHERE vec_id % $mod = 0 AND vec_id % 5 = 0)""".stripMargin.replace("\n", " ")

  def docs(spark: SparkSession, sfDir: String): DataFrame =
    spread(spark.read.parquet(s"$sfDir/documents.parquet"), spark)

  /** Docs with deterministic PII/URL tails (the raw corpus is clean word
    * soup, so the cleaning operators would otherwise scrub nothing):
    * doc_id % 4 appends an email / IPv4 / phone / URL. Pure column
    * arithmetic — the DuckDB twin derives the identical text.
    */
  def piiDocs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).withColumn("text", concat(col("text"),
      when(pmod(col("doc_id"), lit(4)) === 0,
        concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
      .when(pmod(col("doc_id"), lit(4)) === 1,
        concat(lit(" from 10."), pmod(col("doc_id"), lit(256)), lit(".0."),
          pmod(col("doc_id"), lit(100)), lit(" logged")))
      .when(pmod(col("doc_id"), lit(4)) === 2,
        concat(lit(" call 555-"), format_string("%03d", pmod(col("doc_id"), lit(1000))),
          lit("-"), format_string("%04d", pmod(col("doc_id"), lit(10000)))))
      .otherwise(concat(lit(" see https://site"), pmod(col("doc_id"), lit(20)),
        lit(".example.org/page"), col("doc_id")))))

  def piiDocsSql(): String =
    s"""(SELECT doc_id, text || CASE
       | WHEN doc_id % 4 = 0 THEN ' contact user' || doc_id || '@example.com now'
       | WHEN doc_id % 4 = 1 THEN ' from 10.' || (doc_id % 256) || '.0.' || (doc_id % 100) || ' logged'
       | WHEN doc_id % 4 = 2 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       | ELSE ' see https://site' || (doc_id % 20) || '.example.org/page' || doc_id END AS text,
       | lang, source, n_chars FROM documents)""".stripMargin.replace("\n", " ")

  /** (doc_id, url) with deterministic crawl-style URL VARIANTS of shared
    * pages: docs 16j..16j+7 (and ..+15 for the next group) cycle through
    * eight surface forms — plain, upper-cased host, `www.` prefix,
    * explicit :443, trailing slash, fragment, and two tracking-param
    * permutations — of the page keyed by (group, path). Canonicalization
    * must collapse each 8-cycle to two canonical URLs (with/without the
    * surviving query). Pure column arithmetic with a DuckDB twin.
    */
  def urlDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val g = pmod(floor(col("doc_id") / 8), lit(10))
    val p = pmod(floor(col("doc_id") / 16), lit(5))
    val v = pmod(col("doc_id"), lit(8))
    val base = concat(lit("site"), g, lit(".example.org"))
    val path = concat(lit("/p"), p)
    val url = when(v === 0, concat(lit("https://"), base, path))
      .when(v === 1, concat(lit("HTTPS://"), upper(base), path))
      .when(v === 2, concat(lit("https://www."), base, path))
      .when(v === 3, concat(lit("https://"), base, lit(":443"), path))
      .when(v === 4, concat(lit("https://"), base, path, lit("/")))
      .when(v === 5, concat(lit("https://"), base, path, lit("#sec2")))
      .when(v === 6, concat(lit("https://"), base, path, lit("?utm_source=feed&id=7&b=2")))
      .otherwise(concat(lit("https://"), base, path, lit("?b=2&id=7&fbclid=xyz")))
    docs(spark, sfDir).select(col("doc_id"), url.as("url"))
  }

  def urlDocsSql(): String =
    s"""(SELECT doc_id,
       | CASE doc_id % 8
       |  WHEN 0 THEN 'https://' || base || path
       |  WHEN 1 THEN 'HTTPS://' || upper(base) || path
       |  WHEN 2 THEN 'https://www.' || base || path
       |  WHEN 3 THEN 'https://' || base || ':443' || path
       |  WHEN 4 THEN 'https://' || base || path || '/'
       |  WHEN 5 THEN 'https://' || base || path || '#sec2'
       |  WHEN 6 THEN 'https://' || base || path || '?utm_source=feed&id=7&b=2'
       |  ELSE 'https://' || base || path || '?b=2&id=7&fbclid=xyz' END AS url
       | FROM (SELECT doc_id,
       |   'site' || ((doc_id // 8) % 10) || '.example.org' AS base,
       |   '/p' || ((doc_id // 16) % 5) AS path
       |  FROM documents))""".stripMargin.replace("\n", " ")

  /** (doc_id, html) — deterministic crawl-style HTML around the corpus
    * text: head with title+style, an h1, the body paragraph, a script
    * block on even docs (with a literal `<` inside), an entity-bearing
    * list, and a `&quot;`/`&nbsp;` tail every 5th doc — every extraction
    * branch (block drop, break tags, entity decode, whitespace collapse)
    * fires. Pure column arithmetic with a DuckDB twin.
    */
  /** Docs wrapped in deterministic page template lines for the
    * boilerplate-line scrub: a nav line shared by EVERY doc (df = N), a
    * footer in three variants (df ≈ N/3), a "pair" line shared by exactly
    * TWO docs (df = 2 — sits ON the default maxDf boundary and must be
    * kept), and the doc's own word-soup line (df = 1 outside the corpus's
    * planted duplicate families). Pure column arithmetic, DuckDB twin.
    */
  def boilerDocs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).withColumn("text", concat(
      lit("home | about | contact\n"),
      col("text"),
      lit("\nshared pair line "), floor(col("doc_id") / 2).cast("long"),
      lit("\n(c) example footer "), pmod(col("doc_id"), lit(3))))

  def boilerDocsSql(): String =
    s"""(SELECT doc_id,
       | 'home | about | contact' || chr(10) || text ||
       | chr(10) || 'shared pair line ' || CAST(doc_id // 2 AS BIGINT) ||
       | chr(10) || '(c) example footer ' || (doc_id % 3) AS text,
       | lang, source, n_chars FROM documents)""".stripMargin.replace("\n", " ")

  def htmlDocs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).select(col("doc_id"), concat(
      lit("<html><head><title>t"), col("doc_id"),
      lit("</title><style>p { color: red; }</style></head><body><h1>Doc "),
      col("doc_id"), lit("</h1><p>"), col("text"), lit("</p>"),
      when(pmod(col("doc_id"), lit(2)) === 0,
        lit("<script>var x = 1 < 2;</script>")).otherwise(lit("")),
      lit("<ul><li>alpha &amp; beta</li><li>1 &lt; 2</li></ul>"),
      when(pmod(col("doc_id"), lit(5)) === 0,
        lit("<p>&quot;quoted&quot;&nbsp;tail</p>")).otherwise(lit("")),
      lit("</body></html>")).as("html"))

  def htmlDocsSql(): String =
    s"""(SELECT doc_id,
       | '<html><head><title>t' || doc_id ||
       | '</title><style>p { color: red; }</style></head><body><h1>Doc ' ||
       | doc_id || '</h1><p>' || text || '</p>' ||
       | CASE WHEN doc_id % 2 = 0 THEN '<script>var x = 1 < 2;</script>' ELSE '' END ||
       | '<ul><li>alpha &amp; beta</li><li>1 &lt; 2</li></ul>' ||
       | CASE WHEN doc_id % 5 = 0 THEN '<p>&quot;quoted&quot;&nbsp;tail</p>' ELSE '' END ||
       | '</body></html>' AS html
       | FROM documents)""".stripMargin.replace("\n", " ")

  /** (doc_id, url, html) crawl corpus for the composed curation funnel
    * ([[graft.ml.Funnel]]): documents plus RE-HOSTED exact copies
    * (doc_id % 7 == 0 under EXACT_SHIFT — same page text, different host,
    * so URL dedup cannot catch them and content dedup must), a
    * crawl-variant URL (the [[urlDocs]] 8-cycle over page groups of 8
    * consecutive ids, but with the FULL group index in the host so copies
    * land on their own hosts), and the page text ([[c4Docs]]-style
    * structure, keyed by the ORIGINAL id so a copy carries the same page)
    * wrapped in [[htmlDocs]]-style HTML (keyed by doc_id — the h1/title
    * differ between copy and original, making copies near- rather than
    * byte-dups). Pure column arithmetic with a DuckDB twin.
    */
  def funnelDocs(spark: SparkSession, sfDir: String): DataFrame = {
    val base0 = docs(spark, sfDir).select(col("doc_id"), col("text"))
    val withCopies = base0.unionByName(
      base0.filter(pmod(col("doc_id"), lit(7)) === 0)
        .withColumn("doc_id", col("doc_id") + EXACT_SHIFT))
    val orig = pmod(col("doc_id"), lit(EXACT_SHIFT))
    val pageText = concat(
      col("text"),
      when(pmod(orig, lit(3)) === 0, lit(".")).otherwise(lit("")),
      // three full supporting sentences carrying >= 2 distinct Gopher
      // stopwords (the/of/to/be/and/that/have/with) so well-formed pages
      // clear BOTH quality gates; the unpunctuated fragment line still
      // exercises C4's line drop
      lit("\nthe quality of this page must be good to keep it here.\nand that supporting line will have more weight with the rest.\nthe corpus must be clean of junk to survive the funnel.\ntiny fragment"),
      when(pmod(orig, lit(17)) === 0,
        lit("\nlorem ipsum dolor sit amet filler text here.")).otherwise(lit("")),
      when(pmod(orig, lit(19)) === 0,
        lit("\nconfig = { \"key\": 1 }")).otherwise(lit("")))
    val grp = floor(col("doc_id") / 8)
    val v = pmod(col("doc_id"), lit(8))
    val host = concat(lit("site"), grp, lit(".example.org"))
    val path = concat(lit("/p"), grp)
    val url = when(v === 0, concat(lit("https://"), host, path))
      .when(v === 1, concat(lit("HTTPS://"), upper(host), path))
      .when(v === 2, concat(lit("https://www."), host, path))
      .when(v === 3, concat(lit("https://"), host, lit(":443"), path))
      .when(v === 4, concat(lit("https://"), host, path, lit("/")))
      .when(v === 5, concat(lit("https://"), host, path, lit("#sec2")))
      .when(v === 6, concat(lit("https://"), host, path, lit("?utm_source=feed&id=7&b=2")))
      .otherwise(concat(lit("https://"), host, path, lit("?b=2&id=7&fbclid=xyz")))
    val html = concat(
      lit("<html><head><title>t"), col("doc_id"),
      lit("</title><style>p { color: red; }</style></head><body><h1>Doc "),
      col("doc_id"), lit("</h1><p>"), pageText, lit("</p>"),
      when(pmod(orig, lit(2)) === 0,
        lit("<script>var x = 1 < 2;</script>")).otherwise(lit("")),
      lit("<ul><li>alpha &amp; beta</li><li>1 &lt; 2</li></ul>"),
      when(pmod(orig, lit(5)) === 0,
        lit("<p>&quot;quoted&quot;&nbsp;tail</p>")).otherwise(lit("")),
      lit("</body></html>"))
    withCopies.select(col("doc_id"), url.as("url"), html.as("html"))
  }

  def funnelDocsSql(): String =
    s"""(SELECT doc_id,
       | CASE doc_id % 8
       |  WHEN 0 THEN 'https://' || host || path
       |  WHEN 1 THEN 'HTTPS://' || upper(host) || path
       |  WHEN 2 THEN 'https://www.' || host || path
       |  WHEN 3 THEN 'https://' || host || ':443' || path
       |  WHEN 4 THEN 'https://' || host || path || '/'
       |  WHEN 5 THEN 'https://' || host || path || '#sec2'
       |  WHEN 6 THEN 'https://' || host || path || '?utm_source=feed&id=7&b=2'
       |  ELSE 'https://' || host || path || '?b=2&id=7&fbclid=xyz' END AS url,
       | '<html><head><title>t' || doc_id ||
       | '</title><style>p { color: red; }</style></head><body><h1>Doc ' ||
       | doc_id || '</h1><p>' || ptext || '</p>' ||
       | CASE WHEN orig % 2 = 0 THEN '<script>var x = 1 < 2;</script>' ELSE '' END ||
       | '<ul><li>alpha &amp; beta</li><li>1 &lt; 2</li></ul>' ||
       | CASE WHEN orig % 5 = 0 THEN '<p>&quot;quoted&quot;&nbsp;tail</p>' ELSE '' END ||
       | '</body></html>' AS html
       | FROM (SELECT doc_id, doc_id % $EXACT_SHIFT AS orig,
       |   'site' || (doc_id // 8) || '.example.org' AS host,
       |   '/p' || (doc_id // 8) AS path,
       |   text || CASE WHEN (doc_id % $EXACT_SHIFT) % 3 = 0 THEN '.' ELSE '' END
       |    || chr(10) || 'the quality of this page must be good to keep it here.'
       |    || chr(10) || 'and that supporting line will have more weight with the rest.'
       |    || chr(10) || 'the corpus must be clean of junk to survive the funnel.'
       |    || chr(10) || 'tiny fragment'
       |    || CASE WHEN (doc_id % $EXACT_SHIFT) % 17 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet filler text here.' ELSE '' END
       |    || CASE WHEN (doc_id % $EXACT_SHIFT) % 19 = 0 THEN chr(10) || 'config = { "key": 1 }' ELSE '' END AS ptext
       |  FROM (SELECT doc_id, text FROM documents
       |   UNION ALL SELECT doc_id + $EXACT_SHIFT, text FROM documents WHERE doc_id % 7 = 0)))""".stripMargin.replace("\n", " ")

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spread(spark.read.parquet(s"$sfDir/embeddings.parquet"), spark)

  /** The synthetic benchmark sentence for eval item k — 17 normalized words,
    * so it always clears the decontamination gram length L and its interior
    * is unmistakable against the corpus word soup. Shared by the Spark and
    * DuckDB builders below.
    */
  private val BENCH_PRE = "benchmark item "
  private val BENCH_MID = " asks whether the optimizer picks hash join order for plan "
  private val BENCH_POST = " in the suite run"
  val BENCH_ITEMS = 50
  val CONTAM_MOD = 29

  /** The 18-word benchmark sentence as a column expression over the item
    * id — shared by [[benchDocs]], [[contamDocs]], and the 1M-doc scale
    * probe so the planted run and the bench set can never drift.
    */
  def benchSentence(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit(BENCH_PRE), k, lit(BENCH_MID), k, lit(BENCH_POST))

  /** Normalized word count of one benchmark sentence (the closed-form
    * per-doc drop for a planted leak).
    */
  val BENCH_SENTENCE_WORDS = 18

  /** (bench_id, text) — the held-out eval set for span decontamination. */
  def benchDocs(spark: SparkSession): DataFrame =
    spark.range(BENCH_ITEMS).select(col("id").as("bench_id"),
      benchSentence(col("id")).as("text"))

  def benchDocsSql(): String =
    s"""(SELECT CAST(range AS BIGINT) AS bench_id,
       | '$BENCH_PRE' || range || '$BENCH_MID' || range || '$BENCH_POST' AS text
       | FROM range($BENCH_ITEMS))""".stripMargin.replace("\n", " ")

  /** Docs with PLANTED benchmark leakage: every doc_id % [[CONTAM_MOD]] == 0
    * appends the benchmark sentence for item doc_id % [[BENCH_ITEMS]] — the
    * contaminated run the span scrub must cut while keeping the rest of the
    * page. Pure column arithmetic with a DuckDB twin.
    */
  def contamDocs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).withColumn("text",
      when(pmod(col("doc_id"), lit(CONTAM_MOD)) === 0,
        concat(col("text"), lit(" "),
          benchSentence(pmod(col("doc_id"), lit(BENCH_ITEMS)))))
      .otherwise(col("text")))

  // -------- token-space contamination (the input_hint tokens payload) ----

  val TOKEN_CONTAM_MOD = 23
  val TOKEN_BENCH_ITEMS = 10
  val TOKEN_BENCH_BASE = 9000000L
  val TOKEN_BENCH_LEN = 16

  /** (doc_id, tokens array<int>) — deterministic pre-tokenized sequences
    * over the documents ids (40..99 tokens of bounded arithmetic ids), with
    * PLANTED benchmark leakage: every doc_id % [[TOKEN_CONTAM_MOD]] == 0
    * carries benchmark run doc_id % [[TOKEN_BENCH_ITEMS]] at positions
    * 10..25. Benchmark token ids live above 9e6 while corpus ids stay
    * below 50k, so the only cross-hits are the planted runs. Pure column
    * arithmetic with a DuckDB twin.
    */
  def tokenSeqs(spark: SparkSession, sfDir: String): DataFrame = {
    val nTok = lit(40) + pmod(col("doc_id"), lit(60))
    val b = pmod(col("doc_id"), lit(TOKEN_BENCH_ITEMS.toLong))
    docs(spark, sfDir).select(col("doc_id"),
      transform(sequence(lit(0), (nTok - 1).cast("int")), i =>
        when(pmod(col("doc_id"), lit(TOKEN_CONTAM_MOD.toLong)) === 0 &&
            i >= 10 && i < 10 + TOKEN_BENCH_LEN,
          (lit(TOKEN_BENCH_BASE) + b * 100 + (i - 10)).cast("int"))
        .otherwise(pmod(col("doc_id") * 31 + i * 7, lit(50000L)).cast("int")))
        .as("tokens"))
  }

  def tokenSeqsSql(): String =
    s"""(SELECT doc_id, list_transform(range(40 + doc_id % 60), i ->
       | CAST(CASE WHEN doc_id % $TOKEN_CONTAM_MOD = 0 AND i >= 10 AND i < ${10 + TOKEN_BENCH_LEN}
       |  THEN $TOKEN_BENCH_BASE + (doc_id % $TOKEN_BENCH_ITEMS) * 100 + (i - 10)
       |  ELSE (doc_id * 31 + i * 7) % 50000 END AS INTEGER)) AS tokens
       | FROM documents)""".stripMargin.replace("\n", " ")

  val TOKEN_RUN_MOD = 5
  val TOKEN_RUN_LEN = 12

  /** (doc_id, tokens) with PLANTED repeated-token runs: every doc_id %
    * [[TOKEN_RUN_MOD]] == 0 repeats token (doc_id % 1000) at positions
    * 20..20+[[TOKEN_RUN_LEN]]. The base formula steps by 7 mod 50000, so
    * consecutive base tokens are never equal — the planted runs are the
    * ONLY runs, making trim effects exactly predictable.
    */
  def tokenRunSeqs(spark: SparkSession, sfDir: String): DataFrame = {
    val nTok = lit(40) + pmod(col("doc_id"), lit(60))
    docs(spark, sfDir).select(col("doc_id"),
      transform(sequence(lit(0), (nTok - 1).cast("int")), i =>
        when(pmod(col("doc_id"), lit(TOKEN_RUN_MOD.toLong)) === 0 &&
            i >= 20 && i < 20 + TOKEN_RUN_LEN,
          pmod(col("doc_id"), lit(1000L)).cast("int"))
        .otherwise(pmod(col("doc_id") * 31 + i * 7, lit(50000L)).cast("int")))
        .as("tokens"))
  }

  def tokenRunSeqsSql(): String =
    s"""(SELECT doc_id, list_transform(range(40 + doc_id % 60), i ->
       | CAST(CASE WHEN doc_id % $TOKEN_RUN_MOD = 0 AND i >= 20 AND i < ${20 + TOKEN_RUN_LEN}
       |  THEN doc_id % 1000
       |  ELSE (doc_id * 31 + i * 7) % 50000 END AS INTEGER)) AS tokens
       | FROM documents)""".stripMargin.replace("\n", " ")

  /** (bench_id, tokens) — the held-out eval set in token space. */
  def tokenBench(spark: SparkSession): DataFrame =
    spark.range(TOKEN_BENCH_ITEMS).select(col("id").as("bench_id"),
      transform(sequence(lit(0), lit(TOKEN_BENCH_LEN - 1)), j =>
        (lit(TOKEN_BENCH_BASE) + col("id") * 100 + j).cast("int")).as("tokens"))

  def tokenBenchSql(): String =
    s"""(SELECT b AS bench_id, list_transform(range($TOKEN_BENCH_LEN), j ->
       | CAST($TOKEN_BENCH_BASE + b * 100 + j AS INTEGER)) AS tokens
       | FROM (SELECT range AS b FROM range($TOKEN_BENCH_ITEMS)))""".stripMargin.replace("\n", " ")

  def contamDocsSql(): String =
    s"""(SELECT doc_id, CASE WHEN doc_id % $CONTAM_MOD = 0
       | THEN text || ' $BENCH_PRE' || (doc_id % $BENCH_ITEMS) || '$BENCH_MID'
       |   || (doc_id % $BENCH_ITEMS) || '$BENCH_POST'
       | ELSE text END AS text, lang, source, n_chars FROM documents)""".stripMargin.replace("\n", " ")

  /** Docs with deterministic page structure (the raw corpus is one line of
    * unpunctuated word soup, so C4's line/sentence heuristics would see
    * nothing): every doc gains two well-formed supporting lines and a
    * short fragment line; doc_id % 3 == 0 terminally punctuates the
    * original line, % 17 == 0 appends a lorem-ipsum line, % 19 == 0 a
    * code-brace line — every C4 keep/drop branch fires on some docs. Pure
    * column arithmetic with a DuckDB twin.
    */
  def c4Docs(spark: SparkSession, sfDir: String): DataFrame =
    docs(spark, sfDir).withColumn("text", concat(
      col("text"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit(".")).otherwise(lit("")),
      lit("\nthe first supporting line reads well.\nanother supporting line follows the first.\ntiny fragment"),
      when(pmod(col("doc_id"), lit(17)) === 0,
        lit("\nlorem ipsum dolor sit amet filler text here.")).otherwise(lit("")),
      when(pmod(col("doc_id"), lit(19)) === 0,
        lit("\nconfig = { \"key\": 1 }")).otherwise(lit(""))))

  def c4DocsSql(): String =
    s"""(SELECT doc_id, text
       | || CASE WHEN doc_id % 3 = 0 THEN '.' ELSE '' END
       | || chr(10) || 'the first supporting line reads well.'
       | || chr(10) || 'another supporting line follows the first.'
       | || chr(10) || 'tiny fragment'
       | || CASE WHEN doc_id % 17 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet filler text here.' ELSE '' END
       | || CASE WHEN doc_id % 19 = 0 THEN chr(10) || 'config = { "key": 1 }' ELSE '' END AS text,
       | lang, source, n_chars FROM documents)""".stripMargin.replace("\n", " ")
}
