package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.F

/** Extraction-expression semantics, ported from
  * plugins/steps/RexPipelineStep_test.go:28-210 (regex dispatch rules),
  * pkg/logsuck/parser/JsonFileParser_test.go:25-40 (%f stringify) and
  * ParseTime.go:24-54 (layouts).
  */
class ExtractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extractMap(raw: String, rex: String): Map[String, String] =
    Seq(raw).toDF("raw")
      .select(F.rex_extract(col("raw"), rex).as("m"))
      .as[Map[String, String]].head()

  test("named group extraction (RexPipelineStep_test.go:28-60)") {
    val m = extractMap("2021-01-20 19:37:00 The user did something. The userid was 123.",
      "userid was (?P<userid>\\d+).")
    assert(m("userid") == "123")
  }

  test("two-group dynamic key=value, all matches (RexPipelineStep_test.go:63-98)") {
    val m = extractMap("2021-01-20 19:37:00 The user did something. userid=123, thingid=456.",
      "(\\w+)=(\\w+)")
    assert(m("userid") == "123")
    assert(m("thingid") == "456")
  }

  test("later matches overwrite (last-wins, RegexFileParser.go:44-52)") {
    val m = extractMap("a=1 b=2 a=3", "(\\w+)=(\\w+)")
    assert(m("a") == "3")
    assert(m("b") == "2")
  }

  test("malformed extractor (3 unnamed groups) extracts nothing") {
    val m = extractMap("a=1", "(\\w)(=)(\\w)")
    assert(m.isEmpty)
  }

  test("_time alias from timeField (RegexFileParser.go:57-59)") {
    val m = Seq("2021/01/20 19:37:00.123456 hello a=1").toDF("raw")
      .select(F.extract_fields(lower(col("raw")), lit("h"), lit("s"),
        graft.model.SourceConfig.defaultExtractors, "_time").as("m"))
      .as[Map[String, String]].head()
    assert(m("_time") == "2021/01/20 19:37:00.123456")
    assert(m("a") == "1")
    assert(m("host") == "h")
    assert(m("source") == "s")
  }

  test("host/source injection overwrites extracted values (Fragments.go:97-98)") {
    val m = Seq("host=fake source=fake").toDF("raw")
      .select(F.extract_fields(col("raw"), lit("real-host"), lit("real-src"),
        Seq("(\\w+)=(\\w+)"), "_time").as("m"))
      .as[Map[String, String]].head()
    assert(m("host") == "real-host")
    assert(m("source") == "real-src")
  }

  test("json extraction stringifies numbers with %f (JsonFileParser_test.go:25-40)") {
    val line = """{"level":"info","ts":1675006830.0893068,"logger":"reloadFileWatchers","msg":"reloading file watchers","newIndexedFilesLen":3,"oldIndexedFilesLen":0}"""
    val m = Seq(line).toDF("raw")
      .select(F.json_extract_map(col("raw"), "ts").as("m"))
      .as[Map[String, String]].head()
    assert(m("level") == "info")
    assert(m("ts") == "1675006830.089307")
    assert(m("newIndexedFilesLen") == "3.000000")
    assert(m("_time") == "1675006830.089307")
  }

  test("parse_time UNIX variants (ParseTime.go:24-54)") {
    val df = Seq(("1611171420", "1611171420123", "1611171420.000123")).toDF("u", "um", "un")
    val r = df.select(
      F.parse_time(col("u"), "UNIX").cast("long").as("a"),
      F.parse_time(col("um"), "UNIX_MILLIS").cast("string").as("b"),
      F.parse_time(col("un"), "UNIX_DECIMAL_NANOS").cast("string").as("c")).head()
    assert(r.getLong(0) == 1611171420L)
    assert(r.getString(1) == "2021-01-20 19:37:00.123")
    // 123 "decimal nanos" -> 0.000000123s -> truncated to microseconds
    assert(r.getString(2) == "2021-01-20 19:37:00")
  }

  test("parse_time Go layout (default kv layout)") {
    val r = Seq("2021/01/20 19:37:00.123456").toDF("t")
      .select(F.parse_time(col("t"), "2006/01/02 15:04:05.000000").cast("string")).head()
    assert(r.getString(0) == "2021-01-20 19:37:00.123456")
  }

  test("compileFrag rules (Fragments.go:74-89)") {
    assert(F.compileFrag("abc") == "(?i)(^|\\W)abc($|\\W)")
    assert(F.compileFrag("ab*") == "(?i)(^|\\W)ab.*")
    // reference also drops the (?i) for leading-* fragments (it lives inside
    // `pre`) — we keep case-insensitivity uniform (SURVEY.md §7.3 quirk rule)
    assert(F.compileFrag("*bc") == "(?i).*bc($|\\W)")
    assert(F.compileFrag("a*c") == "(?i)(^|\\W)a.*c($|\\W)")
  }

  test("fragment word-boundary matching") {
    val df = Seq("eventType=error more", "terrors everywhere", "ERROR at end").toDF("raw")
    val got = df.filter(F.fragMatches(col("raw"), "error")).count()
    assert(got == 2) // word-boundary excludes 'terrors'; case-insensitive includes ERROR
  }
}
