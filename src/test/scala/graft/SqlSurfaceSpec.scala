package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL-function surface: spark.sql access to the engine's expressions. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registered SQL functions: round-trip, rex, fields, json, map union") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("2021/01/20 19:37:00.123456 a=1 b=2", "h1", "s1"))
      .toDF("raw", "host", "source").createOrReplaceTempView("t")

    val rt = spark.sql("SELECT tokens_to_text(text_to_tokens(raw)) = raw AS ok FROM t").head()
    assert(rt.getBoolean(0))

    val rex = spark.sql("SELECT graft_rex(raw, '(?P<aval>\\\\d)')['aval'] FROM t").head()
    assert(rex.getString(0) == "2")  // first match? no: all matches, last wins -> digits... '2' is the last single digit
    val fields = spark.sql(
      "SELECT graft_fields(lower(raw), host, source, '(\\\\w+)=(\\\\w+)', '^(?P<_time>\\\\d{4}/\\\\d{2}/\\\\d{2} \\\\d\\\\d:\\\\d\\\\d:\\\\d\\\\d\\\\.\\\\d{6})') AS f FROM t")
      .selectExpr("f['a']", "f['_time']", "f['host']").head()
    assert(fields.getString(0) == "1")
    assert(fields.getString(1) == "2021/01/20 19:37:00.123456")
    assert(fields.getString(2) == "h1")

    val j = spark.sql("""SELECT graft_json_fields('{"k": 87, "s": "x"}')['k']""").head()
    assert(j.getString(0) == "87.000000")

    val mu = spark.sql("SELECT graft_map_union(map('a','1','b','2'), map('b','9'))['b']").head()
    assert(mu.getString(0) == "9")
  }

  test("extensions class enumerates the same functions") {
    assert(GraftExtensions.functions.map(_._1).toSet ==
      Set("tokens_to_text", "text_to_tokens", "graft_rex", "graft_fields",
        "graft_json_fields", "graft_map_union"))
    // builder sanity through the extensions path
    val ext = new GraftExtensions()
    assert(ext != null)
  }
}
