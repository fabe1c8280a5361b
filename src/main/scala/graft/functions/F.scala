package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftbridge.Bridge

/** Column-level facade over the custom expressions + the reference's tiny
  * scalar repertoire (SURVEY.md §2.6).
  */
object F {
  private def toCol(e: Expression): Column = Bridge.column(e)
  private def toExpr(c: Column): Expression = Bridge.expression(c)
  private val nullStr: Expression = Literal(null, StringType)

  def tokens_to_text(c: Column): Column = toCol(TokensToText(toExpr(c)))
  def text_to_tokens(c: Column): Column = toCol(TextToTokens(toExpr(c)))

  /** Full search-time extraction: extractors over (lowercased) raw, reserved
    * host/source injected, timeField aliased to `_time`.
    */
  def extract_fields(raw: Column, host: Column, source: Column,
      extractors: Seq[String], timeField: String): Column =
    toCol(RegexExtractToMap(toExpr(raw), toExpr(host), toExpr(source),
      extractors, timeField, inject = true))

  /** `rex`-style single-extractor run, no injection, no _time alias. */
  def rex_extract(src: Column, rex: String): Column =
    toCol(RegexExtractToMap(toExpr(src), nullStr, nullStr, Seq(rex), "", inject = false))

  /** Last-wins map merge (rex merges new fields over existing ones). */
  def map_union(l: Column, r: Column): Column = toCol(MapUnion(toExpr(l), toExpr(r)))

  /** JSON top-level field extraction with Go %f number stringification. */
  def json_fields(raw: Column, host: Column, source: Column, timeField: String): Column =
    toCol(JsonToFieldsMap(toExpr(raw), toExpr(host), toExpr(source), timeField, inject = true))

  /** JSON extraction without host/source injection (parser unit semantics). */
  def json_extract_map(raw: Column, timeField: String): Column =
    toCol(JsonToFieldsMap(toExpr(raw), nullStr, nullStr, timeField, inject = false))

  /** Whole parse-stage extraction with per-source config dispatch (memoized
    * glob resolution inside one compact expression — see ExtractEvent).
    */
  def extract_event(raw: Column, host: Column, source: Column,
      configs: Seq[graft.model.SourceConfig]): Column =
    toCol(ExtractEvent(toExpr(raw), toExpr(host), toExpr(source),
      configs.map(c => (globToRegex(c.source_glob), c.file_type, c.extractors, c.time_field)),
      graft.model.SourceConfig.defaultExtractors, "_time"))

  /** [[extract_event]] straight from the tokens payload: decodes (lowercased)
    * into a reused buffer — two fewer string copies per row on the parse hot
    * path.
    */
  def extract_event_tokens(tokens: Column, host: Column, source: Column,
      configs: Seq[graft.model.SourceConfig]): Column =
    toCol(ExtractEvent(toExpr(tokens), toExpr(host), toExpr(source),
      configs.map(c => (globToRegex(c.source_glob), c.file_type, c.extractors, c.time_field)),
      graft.model.SourceConfig.defaultExtractors, "_time", rawIsTokens = true))

  /** Time-field-only extraction from tokens (see ExtractTimeValue): yields
    * the same string `fields["_time"]` would, without building the map.
    */
  def extract_time_tokens(tokens: Column, source: Column,
      configs: Seq[graft.model.SourceConfig]): Column =
    toCol(ExtractTimeValue(toExpr(tokens), toExpr(source),
      configs.map(c => (globToRegex(c.source_glob), c.file_type, c.extractors, c.time_field)),
      graft.model.SourceConfig.defaultExtractors, "_time"))

  /** Per-source event-time parse (see EventTime). */
  def event_time(timeStr: Column, source: Column,
      configs: Seq[graft.model.SourceConfig]): Column = {
    val defaultGo = graft.model.SourceConfig.defaultTimeLayout
    toCol(EventTime(toExpr(timeStr), toExpr(source),
      configs.map(c => (globToRegex(c.source_glob), c.time_layout)),
      configs.map(c => goLayoutToJava(c.time_layout)),
      (defaultGo, goLayoutToJava(defaultGo))))
  }

  /** Compile a search fragment to the reference's regex form
    * (plugins/steps/Fragments.go:74-89): case-insensitive, `*` -> `.*`,
    * word-boundary anchors unless the fragment starts/ends with `*`.
    */
  def compileFrag(frag: String): String = {
    val pre = if (frag.startsWith("*")) "" else "(^|\\W)"
    val post = if (frag.endsWith("*")) "" else "($|\\W)"
    "(?i)" + pre + frag.replace("*", ".*") + post
  }

  /** Predicate: does `c` contain fragment `frag` under reference semantics. */
  def fragMatches(c: Column, frag: String): Column = c.rlike(compileFrag(frag))

  /** filepath.Match-style glob (reference plugins/steps/Utils.go:41) as a SQL
    * predicate. `*` does not cross `/`; `?` matches one non-/ char.
    */
  def globToRegex(glob: String): String = {
    val sb = new StringBuilder("^")
    glob.foreach {
      case '*' => sb.append("[^/]*")
      case '?' => sb.append("[^/]")
      case c if "\\.[]{}()+-^$|".contains(c) => sb.append('\\').append(c)
      case c => sb.append(c)
    }
    sb.append("$").toString
  }

  def globMatches(c: Column, glob: String): Column = c.rlike(globToRegex(glob))

  /** Reference ParseTime (pkg/logsuck/parser/ParseTime.go:24-54): Go layout
    * strings plus UNIX / UNIX_MILLIS / UNIX_DECIMAL_NANOS, as built-in
    * Catalyst expressions (all codegen'd).
    */
  def parse_time(value: Column, layout: String): Column = layout match {
    case "UNIX" => timestamp_seconds(value.cast(LongType))
    case "UNIX_MILLIS" => timestamp_millis(value.cast(LongType))
    case "UNIX_DECIMAL_NANOS" =>
      // Go: time.Unix(int64(split[0]), int64(split[1])) — the decimals parsed
      // as integer *nanoseconds* (a reference quirk we preserve).
      val parts = split(value, "\\.")
      timestamp_micros(
        element_at(parts, 1).cast(LongType) * lit(1000000L) +
          (element_at(parts, 2).cast(LongType) / lit(1000L)).cast(LongType))
    case goLayout =>
      // extraction runs on lowercased raw (Fragments.go:95), so month/day
      // names arrive lowercased; java.time parsing is case-sensitive. The
      // reference would silently fall back to wall clock here (its default
      // layouts are numeric-only); we normalize instead (SURVEY.md §7.3).
      val v =
        if (goLayout.contains("Jan") || goLayout.contains("Mon")) {
          val names = Seq("jan", "feb", "mar", "apr", "may", "jun", "jul",
            "aug", "sep", "oct", "nov", "dec", "mon", "tue", "wed", "thu",
            "fri", "sat", "sun")
          names.foldLeft(value)((c, n) => regexp_replace(c, "\\b" + n, n.capitalize))
        } else value
      to_timestamp(v, goLayoutToJava(goLayout))
  }

  /** Translate a Go reference-time layout (Mon Jan 2 15:04:05 MST 2006) to a
    * java.time DateTimeFormatter pattern. Covers the tokens the reference's
    * configs and docs use; longest-match first.
    */
  def goLayoutToJava(layout: String): String = {
    val subs: Seq[(String, String)] = Seq(
      "2006" -> "yyyy",
      "January" -> "MMMM", "Jan" -> "MMM",
      "01" -> "MM",
      "Monday" -> "EEEE", "Mon" -> "EEE",
      "02" -> "dd", "_2" -> "d",
      "15" -> "HH", "03" -> "hh",
      "04" -> "mm",
      "05" -> "ss",
      ".000000000" -> ".SSSSSSSSS", ".000000" -> ".SSSSSS", ".000" -> ".SSS",
      "999999999" -> "SSSSSSSSS", "999999" -> "SSSSSS", "999" -> "SSS",
      "PM" -> "a",
      "Z07:00" -> "XXX", "Z0700" -> "XX",
      "-07:00" -> "xxx", "-0700" -> "xx", "-07" -> "x",
      "MST" -> "zzz"
    )
    val sb = new StringBuilder
    var i = 0
    while (i < layout.length) {
      subs.find { case (go, _) => layout.startsWith(go, i) } match {
        case Some((go, java)) => sb.append(java); i += go.length
        case None =>
          val c = layout.charAt(i)
          // quote literal letters that would be pattern chars in java.time
          if (c.isLetter) sb.append('\'').append(c).append('\'') else sb.append(c)
          i += 1
      }
    }
    sb.toString
  }
}
