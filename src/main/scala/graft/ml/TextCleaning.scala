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

  // ------------------------------------------------------------ C4 filters

  val C4_MIN_LINE_WORDS = 5
  val C4_MIN_SENTENCES = 3
  val C4_TERMINAL_RX = "[.!?\"]$"

  /** C4's published page-level heuristics (Raffel et al., JMLR'20 §2.2),
    * map-only per document: a line is kept iff it ends in terminal
    * punctuation AND has >= 5 words; the page is dropped when it has fewer
    * than 3 sentences, contains "lorem ipsum", a curly brace, or keeps no
    * line. Returns the per-page counters, the branch flags, the composite
    * `keep` verdict, and the cleaned text (kept lines rejoined) — a
    * pipeline filters on `keep` and feeds `cleaned` downstream. All
    * whole-stage-codegen'd column work; the 10^12-row shape is a scan.
    */
  def c4Filters(docs: DataFrame, passThrough: Seq[String] = Nil): DataFrame = {
    val lines = split(col("text"), "\n")
    val kept = filter(lines, l =>
      l.rlike(C4_TERMINAL_RX) && size(split(trim(l), " ")) >= C4_MIN_LINE_WORDS)
    val nSent = size(regexp_extract_all(col("text"), lit("[.!?]"), lit(0)))
    val hasLorem = lower(col("text")).contains("lorem ipsum")
    val hasBrace = col("text").contains("{")
    docs.select(Seq(col("doc_id"),
      size(lines).as("n_lines"),
      size(kept).as("n_kept_lines"),
      nSent.as("n_sentences"),
      hasLorem.as("has_lorem"),
      hasBrace.as("has_brace"),
      (nSent >= C4_MIN_SENTENCES && !hasLorem && !hasBrace && size(kept) > 0)
        .as("keep"),
      concat_ws("\n", kept).as("cleaned")) ++ passThrough.map(col): _*)
  }

  def c4FiltersSql(docsRel: String): String =
    s"""SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept_lines,
       | n_sentences, has_lorem, has_brace,
       | (n_sentences >= $C4_MIN_SENTENCES AND NOT has_lorem AND NOT has_brace AND len(kept) > 0) AS keep,
       | array_to_string(kept, chr(10)) AS cleaned
       |FROM (SELECT doc_id,
       |   string_split(text, chr(10)) AS lines,
       |   list_filter(string_split(text, chr(10)),
       |     l -> regexp_matches(l, '[.!?"]$$') AND len(string_split(trim(l), ' ')) >= $C4_MIN_LINE_WORDS) AS kept,
       |   len(regexp_extract_all(text, '[.!?]')) AS n_sentences,
       |   contains(lower(text), 'lorem ipsum') AS has_lorem,
       |   contains(text, '{') AS has_brace
       | FROM $docsRel)""".stripMargin.replace("\n", " ")

  // ---------------------------------------------------------- Gopher rules

  val GOPHER_MIN_WORDS = 50
  val GOPHER_MAX_WORDS = 100000
  val GOPHER_MIN_MEAN_WORD_LEN = 3.0
  val GOPHER_MAX_MEAN_WORD_LEN = 10.0
  val GOPHER_MAX_SYMBOL_RATIO = 0.1
  val GOPHER_MAX_BULLET_RATIO = 0.9
  val GOPHER_MAX_ELLIPSIS_RATIO = 0.3
  val GOPHER_MIN_ALPHA_RATIO = 0.8
  val GOPHER_MIN_STOPWORDS = 2
  val GOPHER_STOPWORDS = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher's published document-quality rules (Rae et al. 2021,
    * arXiv:2112.11446 Table A1), map-only per document: word-count bounds,
    * mean word length 3-10, symbol-to-word ratio (# or ...) <= 0.1, bullet-
    * started lines <= 90%, ellipsis-ended lines <= 30%, >= 80% of words
    * carrying an alphabetic character, and >= 2 distinct stop words from
    * the published 8-word list. Emits every per-doc metric (rounded to 4 dp
    * — the keep verdict compares the ROUNDED values so both engines decide
    * identically) plus the composite `keep`. Pure column work over one
    * whitespace split; the 10^12-row shape is a scan.
    */
  def gopherRules(docs: DataFrame, passThrough: Seq[String] = Nil): DataFrame = {
    val ws = filter(split(lower(col("text")), "\\s+"), w => w =!= "")
    val lines = split(col("text"), "\n")
    val nWords = size(col("ws"))
    val nLines = size(col("lines"))
    // total word chars = doc chars minus whitespace (avoids a per-word fold)
    val meanLen = round(
      length(regexp_replace(lower(col("text")), "\\s+", "")).cast("double") / nWords, 4)
    val symbolRatio = round(
      (size(regexp_extract_all(col("text"), lit("#"), lit(0))) +
        size(regexp_extract_all(col("text"), lit("\\.\\.\\."), lit(0)))).cast("double") / nWords, 4)
    val bulletRatio = round(
      size(filter(col("lines"), l => trim(l).rlike("^[-*] "))).cast("double") / nLines, 4)
    val ellipsisRatio = round(
      size(filter(col("lines"), l => trim(l).rlike("\\.\\.\\.$"))).cast("double") / nLines, 4)
    val alphaRatio = round(
      size(filter(col("ws"), w => w.rlike("[a-z]"))).cast("double") / nWords, 4)
    val nStop = size(array_intersect(col("ws"),
      array(GOPHER_STOPWORDS.map(lit): _*)))
    docs.select(Seq(col("doc_id"), col("text")) ++
        passThrough.filterNot(Set("doc_id", "text")).map(col): _*)
      .withColumn("ws", ws).withColumn("lines", lines)
      .select(Seq(col("doc_id"),
        nWords.as("n_words"), meanLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"), bulletRatio.as("bullet_ratio"),
        ellipsisRatio.as("ellipsis_ratio"), alphaRatio.as("alpha_ratio"),
        nStop.as("n_stop")) ++ passThrough.map(col): _*)
      .withColumn("keep",
        col("n_words") >= GOPHER_MIN_WORDS && col("n_words") <= GOPHER_MAX_WORDS &&
        col("mean_word_len") >= GOPHER_MIN_MEAN_WORD_LEN &&
        col("mean_word_len") <= GOPHER_MAX_MEAN_WORD_LEN &&
        col("symbol_ratio") <= GOPHER_MAX_SYMBOL_RATIO &&
        col("bullet_ratio") <= GOPHER_MAX_BULLET_RATIO &&
        col("ellipsis_ratio") <= GOPHER_MAX_ELLIPSIS_RATIO &&
        col("alpha_ratio") >= GOPHER_MIN_ALPHA_RATIO &&
        col("n_stop") >= GOPHER_MIN_STOPWORDS)
  }

  /** DuckDB twin of [[gopherRules]] (same splits, rounding, thresholds). */
  def gopherRulesSql(docsRel: String): String = {
    val stops = GOPHER_STOPWORDS.map(w => s"'$w'").mkString(", ")
    s"""SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
       | ellipsis_ratio, alpha_ratio, n_stop,
       | (n_words >= $GOPHER_MIN_WORDS AND n_words <= $GOPHER_MAX_WORDS
       |  AND mean_word_len >= $GOPHER_MIN_MEAN_WORD_LEN AND mean_word_len <= $GOPHER_MAX_MEAN_WORD_LEN
       |  AND symbol_ratio <= $GOPHER_MAX_SYMBOL_RATIO
       |  AND bullet_ratio <= $GOPHER_MAX_BULLET_RATIO
       |  AND ellipsis_ratio <= $GOPHER_MAX_ELLIPSIS_RATIO
       |  AND alpha_ratio >= $GOPHER_MIN_ALPHA_RATIO
       |  AND n_stop >= $GOPHER_MIN_STOPWORDS) AS keep
       |FROM (SELECT doc_id,
       |   len(ws) AS n_words,
       |   round(CAST(len(regexp_replace(lower(text), '\\s+', '', 'g')) AS DOUBLE) / len(ws), 4) AS mean_word_len,
       |   round(CAST(len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '\\.\\.\\.')) AS DOUBLE) / len(ws), 4) AS symbol_ratio,
       |   round(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '^[-*] '))) AS DOUBLE) / len(lines), 4) AS bullet_ratio,
       |   round(CAST(len(list_filter(lines, l -> regexp_matches(trim(l), '\\.\\.\\.$$'))) AS DOUBLE) / len(lines), 4) AS ellipsis_ratio,
       |   round(CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) AS DOUBLE) / len(ws), 4) AS alpha_ratio,
       |   len(list_intersect(ws, [$stops])) AS n_stop
       | FROM (SELECT doc_id, text,
       |     list_filter(regexp_split_to_array(lower(text), '\\s+'), w -> w <> '') AS ws,
       |     string_split(text, chr(10)) AS lines
       |   FROM $docsRel))""".stripMargin.replace("\n", " ")
  }

  // ------------------------------------------------- boilerplate lines

  /** CCNet/RefinedWeb-style boilerplate LINE removal by document
    * frequency: a line occurring in more than `maxDf` DISTINCT documents
    * (nav bars, footers, cookie banners — template text that survives
    * HTML extraction) is dropped from EVERY document, and the remaining
    * lines are rejoined in their original order. Complements the
    * keep-first chunk dedup: chunk dedup keeps ONE copy of duplicated
    * content, boilerplate scrub keeps NONE (template lines are noise in
    * every copy). Published precedent: CCNet's shared-paragraph removal
    * (Wenzek et al., LREC'20 §3.1) and RefinedWeb's line-wise filters
    * (Penedo et al., 2023 §3.3). No logsuck counterpart — this is a
    * training-pipeline extension.
    *
    * Scale shape: the line document-frequency table is ONE line-keyed
    * shuffle over (line, doc) pairs (two-phase distinct aggregate,
    * map-side partials); only the boilerplate SET — bounded by
    * distinct-lines / maxDf, small by the definition of high-df — joins
    * back against the exploded lines (AQE broadcasts it when small), and
    * the rebuild is one doc-keyed shuffle. A df = maxDf line is KEPT
    * (strictly-greater drop), so legitimate short quotes shared by a
    * couple of pages survive.
    *
    * Output: (doc_id, n_lines, n_kept, text) — a fully-boilerplate doc
    * stays with n_kept = 0 and empty text, for the caller to drop or
    * audit.
    */
  def boilerplateScrub(docs: DataFrame, maxDf: Long = 2): DataFrame = {
    val lines = docs.select(col("doc_id"),
      posexplode(split(col("text"), "\n")).as(Seq("idx", "line")))
    val hot = lines.groupBy("line")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > maxDf)
      .select(col("line"), lit(true).as("hot"))
    val kept = lines.join(hot, Seq("line"), "left").filter(col("hot").isNull)
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws("\n", transform(
        array_sort(collect_list(struct(col("idx"), col("line")))),
        x => x.getField("line"))).as("text"))
    docs.select(col("doc_id"), size(split(col("text"), "\n")).as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }

  /** DuckDB twin of [[boilerplateScrub]] (same split, same strict-greater
    * threshold, same order-preserving rebuild).
    */
  def boilerplateScrubSql(docsRel: String, maxDf: Long = 2): String =
    s"""WITH blsrc AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM $docsRel),
       |blx AS (SELECT doc_id, unnest(range(len(ls))) AS idx, ls FROM blsrc),
       |bln AS (SELECT doc_id, idx, ls[idx + 1] AS line FROM blx),
       |blhot AS (SELECT line FROM (SELECT line, count(DISTINCT doc_id) AS df FROM bln GROUP BY line) WHERE df > $maxDf),
       |blkept AS (SELECT doc_id, idx, line FROM bln WHERE line NOT IN (SELECT line FROM blhot)),
       |blreb AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
       |    string_agg(line, chr(10) ORDER BY idx) AS text FROM blkept GROUP BY doc_id)
       |SELECT s.doc_id, len(s.ls) AS n_lines,
       |  COALESCE(r.n_kept, 0) AS n_kept, COALESCE(r.text, '') AS text
       |FROM blsrc s LEFT JOIN blreb r ON s.doc_id = r.doc_id""".stripMargin.replace("\n", " ")

  // ---------------------------------------------------------- domain quota

  /** Per-domain document quota (the Gopher/FineWeb-style source cap that
    * stops one giant domain from dominating the mixture): rank documents
    * within their first-URL domain by the cross-engine deterministic hash
    * and keep the first `cap`. The rank-le-cap filter over the window
    * compiles to WindowGroupLimit: each map partition forwards at most
    * `cap` rows per domain into the single shuffle on domain, so a
    * hot-domain's population never travels — the same pruned shape as
    * chunk dedup's keep-first. Deterministic at any parallelism (hash
    * order, doc_id tiebreak).
    */
  def domainQuota(docs: DataFrame, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val domain = coalesce(
      try_element_at(regexp_extract_all(col("text"), lit(URL_DOMAIN_RX), lit(1)), lit(1)),
      lit("none"))
    val w = Window.partitionBy(col("domain"))
      .orderBy(TextDedup.hash64Col(col("doc_id").cast("string")), col("doc_id"))
    docs.select(col("doc_id"), domain.as("domain"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= cap)
  }

  def domainQuotaSql(docsRel: String, cap: Int): String =
    s"""SELECT doc_id, domain, rnk FROM (
       | SELECT doc_id, domain, row_number() OVER (PARTITION BY domain
       |   ORDER BY ${TextDedup.hash64Sql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rnk
       | FROM (SELECT doc_id,
       |   COALESCE(regexp_extract_all(text, 'https?://([a-z0-9.-]+)', 1)[1], 'none') AS domain
       |  FROM $docsRel)) WHERE rnk <= $cap""".stripMargin.replace("\n", " ")

  // ------------------------------------------------------ HTML extraction

  /** Plain-text extraction from crawled HTML — the step every web corpus
    * runs BEFORE any text filter (C4 / RefinedWeb start from WET/WARC
    * markup): drop `<head>`, `<script>` and `<style>` blocks whole, turn
    * block-closing tags into line breaks, strip remaining tags, decode the
    * common entities, and normalize whitespace per line. Map-only
    * projection; regexes stay in the Java ∩ RE2 subset ((?s) + lazy
    * quantifiers are in both) so the DuckDB twin is byte-identical.
    * Returns (doc_id, n_scripts, text).
    */
  val HTML_HEAD_RX = "(?s)<head[^>]*>.*?</head>"
  val HTML_SCRIPT_RX = "(?s)<script[^>]*>.*?</script>"
  val HTML_STYLE_RX = "(?s)<style[^>]*>.*?</style>"
  val HTML_BREAK_RX = "</(p|div|li|h[1-6])>|<br ?/?>"
  val HTML_TAG_RX = "<[^>]*>"

  def htmlExtract(docs: DataFrame): DataFrame = {
    val noBlocks = regexp_replace(regexp_replace(regexp_replace(col("html"),
      HTML_HEAD_RX, " "), HTML_SCRIPT_RX, " "), HTML_STYLE_RX, " ")
    val untagged = regexp_replace(
      regexp_replace(noBlocks, HTML_BREAK_RX, "\n"), HTML_TAG_RX, " ")
    // decode &amp; LAST so "&amp;lt;" yields the literal "&lt;", not "<"
    val decoded = replace(replace(replace(replace(replace(untagged,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&nbsp;"), lit(" ")),
      lit("&amp;"), lit("&"))
    val lines = array_join(filter(
      transform(split(decoded, "\n"), l => trim(regexp_replace(l, "\\s+", " "))),
      l => l =!= ""), "\n")
    docs.select(col("doc_id"),
      size(regexp_extract_all(col("html"), lit(HTML_SCRIPT_RX), lit(0)))
        .cast("long").as("n_scripts"),
      lines.as("text"))
  }

  /** DuckDB twin of [[htmlExtract]] over a `(doc_id, html)` relation. */
  def htmlExtractSql(htmlRel: String): String =
    s"""SELECT doc_id,
       | CAST(len(regexp_extract_all(html, '$HTML_SCRIPT_RX')) AS BIGINT) AS n_scripts,
       | array_to_string(list_filter(list_transform(
       |     string_split(decoded, chr(10)),
       |     l -> trim(regexp_replace(l, '\\s+', ' ', 'g'))),
       |   l -> l <> ''), chr(10)) AS text
       |FROM (SELECT doc_id, html,
       |  replace(replace(replace(replace(replace(
       |    regexp_replace(regexp_replace(
       |      regexp_replace(regexp_replace(regexp_replace(html,
       |        '$HTML_HEAD_RX', ' ', 'g'),
       |        '$HTML_SCRIPT_RX', ' ', 'g'),
       |        '$HTML_STYLE_RX', ' ', 'g'),
       |      '$HTML_BREAK_RX', chr(10), 'g'),
       |      '$HTML_TAG_RX', ' ', 'g'),
       |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&nbsp;', ' '),
       |    '&amp;', '&') AS decoded
       | FROM $htmlRel)""".stripMargin.replace("\n", " ")

  // ------------------------------------------------------ URL canonical

  /** Tracking params stripped during canonicalization (the common
    * UTM/click-id set every crawl pipeline drops — they vary per referral,
    * not per page).
    */
  val TRACKING_PARAM_RX = "^(utm_[^=]*|gclid|fbclid|ref)(=|$)"

  /** Canonical form of a web URL — the dedup key a crawl pipeline applies
    * BEFORE content dedup, so re-crawls of one page under URL variants
    * collapse (cf. logsuck has no notion of this; builder-mandate op):
    * lowercase scheme + host, strip a `www.` prefix, drop the scheme's
    * default port (:80/:443), drop the fragment, drop tracking params
    * ([[TRACKING_PARAM_RX]]), byte-sort the surviving query params, and
    * trim trailing path slashes. Pure projection (map-only at any scale);
    * every step is in the Java-regex ∩ RE2 subset so the DuckDB twin is
    * byte-identical.
    */
  def urlCanonicalCol(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(url, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = regexp_extract(rest, "^([^/?#]*)", 1)
    val noWww = regexp_replace(lower(hostport), "^www\\.", "")
    val host = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val pathq = rest.substr(length(hostport) + 1, length(rest))
    val path = regexp_replace(regexp_extract(pathq, "^([^?#]*)", 1), "/+$", "")
    val query = regexp_extract(pathq, "\\?([^#]*)", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TRACKING_PARAM_RX)))
    val qpart = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    concat(scheme, lit("://"), host, path, qpart)
  }

  /** Keep-first dedup on the canonical URL (lowest doc_id survives):
    * (doc_id, canon, is_dup). One shuffle on the canonical key — the same
    * flag shape as content-level `TextDedup.exact`, applied upstream of it.
    */
  def urlDedup(docs: DataFrame): DataFrame =
    urlDedupMarked(docs).select("doc_id", "canon", "is_dup")

  /** [[urlDedup]] preserving the input's other columns — the composed-
    * funnel form, where the page payload (html) must ride through the
    * dedup window instead of joining back (a join-back re-reads the
    * corpus; the ride-through is one window over the same single
    * canonical-key shuffle).
    */
  def urlDedupMarked(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("canon")).orderBy(col("doc_id"))
    docs.withColumn("canon", urlCanonicalCol(col("url")))
      .withColumn("is_dup", row_number().over(w) > 1)
  }

  /** DuckDB twin of [[urlDedup]] over a `(doc_id, url)` relation. */
  def urlDedupSql(urlRel: String): String =
    s"""WITH parts AS (SELECT doc_id, url,
       |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
       |  FROM $urlRel),
       |parts2 AS (SELECT doc_id, scheme, rest,
       |    regexp_extract(rest, '^([^/?#]*)', 1) AS hostport FROM parts),
       |parts3 AS (SELECT doc_id, scheme,
       |    regexp_replace(lower(hostport), '^www\\.', '') AS nowww,
       |    substr(rest, len(hostport) + 1) AS pathq FROM parts2),
       |canon AS (SELECT doc_id,
       |    scheme || '://' ||
       |    (CASE WHEN scheme = 'http' THEN regexp_replace(nowww, ':80$$', '')
       |          WHEN scheme = 'https' THEN regexp_replace(nowww, ':443$$', '')
       |          ELSE nowww END) ||
       |    regexp_replace(regexp_extract(pathq, '^([^?#]*)', 1), '/+$$', '') ||
       |    (CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END)
       |      AS canon
       |  FROM (SELECT doc_id, scheme, nowww, pathq,
       |      list_sort(list_filter(string_split(regexp_extract(pathq, '\\?([^#]*)', 1), '&'),
       |        p -> p <> '' AND NOT regexp_matches(p, '$TRACKING_PARAM_RX'))) AS params
       |    FROM parts3))
       |SELECT doc_id, canon,
       |  row_number() OVER (PARTITION BY canon ORDER BY doc_id) > 1 AS is_dup
       |FROM canon""".stripMargin.replace("\n", " ")

  /** Domain frequency over URLs in the corpus (blocklist/provenance stats). */
  def domainStats(docs: DataFrame): DataFrame =
    docs.select(explode(regexp_extract_all(col("text"), lit(URL_DOMAIN_RX), lit(1))).as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("n"))

  def domainStatsSql(docsRel: String): String =
    s"""SELECT domain, count(*) AS n FROM (
       |  SELECT unnest(regexp_extract_all(text, 'https?://([a-z0-9.-]+)', 1)) AS domain
       |  FROM $docsRel) GROUP BY domain""".stripMargin.replace("\n", " ")
}
