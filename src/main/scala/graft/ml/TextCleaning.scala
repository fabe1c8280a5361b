package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators a web-scale training pipeline runs before
  * tokenization: PII redaction, repetition-based quality metrics
  * (Gopher/C4-style filters), and URL/domain statistics. All map-only (one
  * groupBy pair for the per-doc word histogram) — the 10^12-row shapes are
  * scans, never joins.
  *
  * Regexes are restricted to the Java-regex ∩ RE2 common subset (no
  * lookaround/backrefs) so the DuckDB twins match byte-for-byte.
  */
object TextCleaning {

  val EMAIL_RX = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val IP_RX = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PHONE_RX = "\\b555-\\d{3}-\\d{4}\\b"
  val URL_DOMAIN_RX = "https?://([a-z0-9.-]+)"

  /** Redact emails / IPv4s / phone numbers; returns (doc_id, scrubbed,
    * n_emails, n_ips, n_phones). Counts come from the pre-scrub text.
    */
  def piiScrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EMAIL_RX, "<EMAIL>"),
          IP_RX, "<IP>"),
        PHONE_RX, "<PHONE>").as("scrubbed"),
      size(regexp_extract_all(col("text"), lit(EMAIL_RX), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(IP_RX), lit(0))).as("n_ips"),
      size(regexp_extract_all(col("text"), lit(PHONE_RX), lit(0))).as("n_phones"))

  def piiScrubSql(docsRel: String): String = {
    // DuckDB single-quoted literals keep backslashes literally — only
    // quotes need escaping (the regex text passes through unchanged)
    def esc(rx: String) = rx.replace("'", "''")
    s"""SELECT doc_id,
       | regexp_replace(regexp_replace(regexp_replace(text,
       |   '${esc(EMAIL_RX)}', '<EMAIL>', 'g'), '${esc(IP_RX)}', '<IP>', 'g'),
       |   '${esc(PHONE_RX)}', '<PHONE>', 'g') AS scrubbed,
       | len(regexp_extract_all(text, '${esc(EMAIL_RX)}')) AS n_emails,
       | len(regexp_extract_all(text, '${esc(IP_RX)}')) AS n_ips,
       | len(regexp_extract_all(text, '${esc(PHONE_RX)}')) AS n_phones
       | FROM $docsRel""".stripMargin.replace("\n", " ")
  }

  /** Gopher-style repetition metrics per doc over the whitespace word
    * stream: word count, distinct-word ratio, top single-word share, top
    * bigram share (rounded to 4 dp). Highly repetitive machine-generated
    * text scores low distinct ratio / high top shares.
    */
  def repetitionMetrics(docs: DataFrame): DataFrame = {
    val words = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
    val bigrams: Column = transform(
      sequence(lit(0), size(col("ws")) - 2),
      i => concat_ws(" ", element_at(col("ws"), i + 1), element_at(col("ws"), i + 2)))
    val unigram = words.select(col("doc_id"), explode(col("ws")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_words"),
        round(count(lit(1)).cast("double") / sum("c"), 4).as("distinct_ratio"),
        round(max("c").cast("double") / sum("c"), 4).as("top_word_share"))
    val bigram = words
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(bigrams).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        round(max("c").cast("double") / sum("c"), 4).as("top_bigram_share"))
    unigram.join(bigram, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("distinct_ratio"),
        col("top_word_share"), coalesce(col("top_bigram_share"), lit(0.0)).as("top_bigram_share"))
  }

  def repetitionMetricsSql(docsRel: String): String =
    s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM $docsRel),
       |uni AS (SELECT doc_id, g, count(*) AS c
       |  FROM (SELECT doc_id, unnest(ws) AS g FROM ws) GROUP BY doc_id, g),
       |ua AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
       |    round(CAST(count(*) AS DOUBLE) / SUM(c), 4) AS distinct_ratio,
       |    round(CAST(max(c) AS DOUBLE) / SUM(c), 4) AS top_word_share
       |  FROM uni GROUP BY doc_id),
       |bi AS (SELECT doc_id, g, count(*) AS c FROM (
       |    SELECT doc_id, unnest(list_transform(range(len(ws) - 1),
       |      i -> ws[i + 1] || ' ' || ws[i + 2])) AS g
       |    FROM ws WHERE len(ws) >= 2) GROUP BY doc_id, g),
       |ba AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / SUM(c), 4) AS top_bigram_share
       |  FROM bi GROUP BY doc_id)
       |SELECT ua.doc_id, ua.n_words, ua.distinct_ratio, ua.top_word_share,
       |  COALESCE(ba.top_bigram_share, 0.0) AS top_bigram_share
       |FROM ua LEFT JOIN ba ON ua.doc_id = ba.doc_id""".stripMargin.replace("\n", " ")

  /** Domain frequency over URLs in the corpus (blocklist/provenance stats). */
  def domainStats(docs: DataFrame): DataFrame =
    docs.select(explode(regexp_extract_all(col("text"), lit(URL_DOMAIN_RX), lit(1))).as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("n"))

  def domainStatsSql(docsRel: String): String =
    s"""SELECT domain, count(*) AS n FROM (
       |  SELECT unnest(regexp_extract_all(text, 'https?://([a-z0-9.-]+)', 1)) AS domain
       |  FROM $docsRel) GROUP BY domain""".stripMargin.replace("\n", " ")
}
