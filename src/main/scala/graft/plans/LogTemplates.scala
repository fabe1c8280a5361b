package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Log template mining — the structure-discovery step a log platform runs
  * over raw lines it has no extractor for (the reference ships fixed
  * `EXTRACTORS` per source, pkg/logsuck/config/config.go:48-56; template
  * mining DISCOVERS that structure). The algorithm is the batch analog of
  * Drain (He et al., ICWS 2017): lines are grouped by the natural partition
  * a log pipeline already has — (source, token count) — and within a group
  * every token position where more than one distinct token occurs becomes a
  * `<*>` wildcard, the rest stay literal. [[assign]] then maps each line to
  * its template plus the wildcard-position parameter values, which together
  * reconstruct the line exactly — the classic log-compression split
  * (template dictionary + per-line params).
  *
  * Exactness: the wildcard rule is a strict integer cardinality test over
  * distinct token strings, so the DuckDB twin agrees bit-for-bit — no
  * similarity thresholds, no iteration order.
  *
  * Scale shape: the tokenized corpus collapses MAP-SIDE in the first
  * aggregate — log tokens repeat massively, so what crosses the one
  * occurrence exchange is distinct (source, len, pos, token) cells, not
  * occurrences. Everything after (position cells, template assembly) runs
  * over template-cardinality cells, and [[assign]] is MAP-ONLY after a
  * broadcast of the template dictionary: params are sliced out of each
  * line's own token array by the broadcast wildcard positions — the corpus
  * never shuffles to be assigned.
  */
object LogTemplates {

  /** Mine one template per (source, token-count) group from lines
    * `(source, raw)`. Output: (source, len, template, wildcard_pos ARRAY,
    * n_lines).
    */
  def templates(lines: DataFrame): DataFrame =
    templatesFromCells(tokCells(lines))

  /** The mining state: distinct (source, len, pos, token) occurrence
    * counts. Map-side combine collapses repeated tokens before the one
    * exchange — what crosses is the corpus's distinct-token content. The
    * streaming face (`StreamingPipeline.templateCellsToSink`) maintains
    * exactly this frame as update-mode state.
    */
  def tokCells(lines: DataFrame): DataFrame =
    lines
      .select(col("source"), split(col("raw"), " ").as("ws"))
      .select(col("source"), size(col("ws")).as("len"),
        posexplode(col("ws")).as(Seq("pos", "tok")))
      .groupBy("source", "len", "pos", "tok")
      .agg(count(lit(1)).as("cnt"))

  /** Template assembly over a (source, len, pos, tok, cnt) cell frame —
    * runs at cell cardinality whether the cells came from the batch
    * aggregate or a streaming cell store.
    */
  def templatesFromCells(tokCells: DataFrame): DataFrame = {
    val posCells = tokCells.groupBy("source", "len", "pos")
      .agg(count(lit(1)).as("n_distinct"), min(col("tok")).as("only"),
        sum(col("cnt")).as("n_occ"))
    val pieces = posCells.select(col("source"), col("len"), col("pos"),
      when(col("n_distinct") > 1, lit("<*>")).otherwise(col("only")).as("piece"),
      (col("n_distinct") > 1).as("wild"), col("n_occ"))
    pieces.groupBy("source", "len")
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("piece")))),
          x => x.getField("piece"))).as("template"),
        // collect_list drops the nulls `when` leaves on literal positions
        sort_array(collect_list(when(col("wild"), col("pos"))))
          .as("wildcard_pos"),
        // every line contributes exactly one pos-0 occurrence
        max(when(col("pos") === 0, col("n_occ"))).as("n_lines"))
  }

  /** [[templates]] with the wildcard positions rendered as a CSV string —
    * the oracle-comparable projection (the driver compare hashes scalar
    * columns).
    */
  def templatesFlat(lines: DataFrame): DataFrame =
    flatten(templates(lines))

  /** [[templatesFlat]] over a prebuilt cell frame (the streaming store). */
  def templatesFlatFromCells(tokCells: DataFrame): DataFrame =
    flatten(templatesFromCells(tokCells))

  private def flatten(tpl: DataFrame): DataFrame =
    tpl.select(col("source"), col("len"), col("template"),
      concat_ws(",", transform(col("wildcard_pos"), p => p.cast("string")))
        .as("wildcard_pos"),
      col("n_lines"))

  /** Assign every line `(doc_id, source, raw)` its mined template and the
    * parameter string (wildcard-position tokens, space-joined). Template +
    * params + positions reconstruct the raw line exactly. Map-only after
    * the template-dictionary broadcast.
    */
  def assign(lines: DataFrame): DataFrame = {
    val tpl = templates(lines)
      .select(col("source"), col("len"), col("template"), col("wildcard_pos"))
    lines
      .select(col("doc_id"), col("source"), split(col("raw"), " ").as("ws"))
      .withColumn("len", size(col("ws")))
      .join(broadcast(tpl), Seq("source", "len"))
      .select(col("doc_id"), col("template"),
        // wildcard positions are < len for every line of the group by
        // construction, so the 1-based element_at never sees an OOB index
        concat_ws(" ", transform(col("wildcard_pos"),
          p => element_at(col("ws"), p + 1))).as("params"))
  }

  /** Template drift — the new-structure alert: templates mined from the
    * NEW window that did not exist in the OLD window (a deploy adding a
    * field, a new log call site, a format change). Both sides reduce to
    * template-cardinality sets before the anti-join, so the comparison
    * costs nothing at corpus scale regardless of window sizes.
    */
  def drift(oldLines: DataFrame, newLines: DataFrame): DataFrame =
    templatesFlat(newLines).join(
      templatesFlat(oldLines).select("source", "len", "template"),
      Seq("source", "len", "template"), "left_anti")

  /** Shared twin CTEs over a `(doc_id, source, raw)` relation: mined
    * pieces -> per-group template + wildcard-position list.
    */
  private def tplSql(linesRel: String): String =
    s"""occ AS (
       |  SELECT source, len(ws) AS len, unnest(ws) AS tok,
       |         unnest(range(len(ws))) AS pos
       |  FROM (SELECT source, str_split(raw, ' ') AS ws FROM $linesRel)),
       |tok_cells AS (SELECT source, len, pos, tok, count(*) AS cnt
       |  FROM occ GROUP BY ALL),
       |pos_cells AS (SELECT source, len, pos, count(*) AS n_distinct,
       |    min(tok) AS lone, CAST(sum(cnt) AS BIGINT) AS n_occ
       |  FROM tok_cells GROUP BY ALL),
       |pieces AS (SELECT source, len, pos,
       |    CASE WHEN n_distinct > 1 THEN '<*>' ELSE lone END AS piece,
       |    n_distinct > 1 AS wild, n_occ FROM pos_cells),
       |tpl AS (SELECT source, CAST(len AS INTEGER) AS len,
       |    string_agg(piece, ' ' ORDER BY pos) AS template,
       |    list(pos ORDER BY pos) FILTER (WHERE wild) AS wpos,
       |    max(CASE WHEN pos = 0 THEN n_occ END) AS n_lines
       |  FROM pieces GROUP BY source, len)""".stripMargin

  /** DuckDB twin of [[templatesFlat]]. */
  def templatesSql(linesRel: String): String =
    s"""WITH ${tplSql(linesRel)}
       |SELECT source, len, template,
       |  COALESCE(array_to_string(
       |    list_transform(wpos, x -> CAST(x AS VARCHAR)), ','), '')
       |    AS wildcard_pos,
       |  n_lines FROM tpl""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[drift]]. */
  def driftSql(oldRel: String, newRel: String): String =
    s"""SELECT * FROM (${templatesSql(newRel)}) n
       |WHERE NOT EXISTS (SELECT 1 FROM (${templatesSql(oldRel)}) o
       |  WHERE o.source = n.source AND o.len = n.len
       |    AND o.template = n.template)""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[assign]]. */
  def assignSql(linesRel: String): String =
    s"""WITH ${tplSql(linesRel)},
       |lns AS (SELECT doc_id, source, str_split(raw, ' ') AS ws
       |        FROM $linesRel)
       |SELECT l.doc_id, t.template,
       |  COALESCE(array_to_string(
       |    list_transform(t.wpos, p -> l.ws[p + 1]), ' '), '') AS params
       |FROM lns l JOIN tpl t
       |  ON l.source = t.source AND len(l.ws) = t.len""".stripMargin
      .replace("\n", " ")
}
