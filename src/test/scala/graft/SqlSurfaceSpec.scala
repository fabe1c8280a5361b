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
        "graft_json_fields", "graft_map_union", "graft_cosine",
        "graft_minhash", "graft_simhash", "graft_lsh_sig", "graft_md5_64",
        "graft_normalize", "graft_shingles"))
    // builder sanity through the extensions path
    val ext = new GraftExtensions()
    assert(ext != null)
  }

  test("ml signature functions answer from SQL") {
    val cos = spark.sql(
      "SELECT round(graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), 6)").head()
    assert(cos.getDouble(0) == 1.0)
    val mh = spark.sql("SELECT size(graft_minhash(array(CAST(7 AS BIGINT), CAST(11 AS BIGINT))))").head()
    assert(mh.getInt(0) == graft.ml.TextDedup.NUM_HASHES)
    val sh = spark.sql("SELECT graft_simhash(array(CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(1 AS BIGINT)))").head()
    assert(sh.getLong(0) == 3L) // bits 0 and 1 carried by majority {3,3}
    val h = spark.sql("SELECT graft_md5_64('a')").head()
    assert(h.getLong(0) > 0L)
  }

  test("text normalization + shingles answer from SQL, matching the engine forms") {
    GraftExtensions.register(spark)
    val n = spark.sql("SELECT graft_normalize('  Hello,   WORLD!! ')").head()
    assert(n.getString(0) == "hello world")
    val sh = spark.sql("SELECT graft_shingles('a b c d')").head()
    assert(sh.getSeq[String](0) == Seq("a b c", "b c d")) // k = SHINGLE_K = 3
    val sh2 = spark.sql("SELECT graft_shingles('a b c d', 2)").head()
    assert(sh2.getSeq[String](0) == Seq("a b", "b c", "c d"))
    // parity with the DataFrame-side shinglesCol
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq("The quick brown fox. The quick!").toDF("text")
    val a = df.select(graft.ml.TextDedup.shinglesCol(col("text"))).head().getSeq[String](0)
    val b = df.selectExpr("graft_shingles(text)").head().getSeq[String](0)
    assert(a == b)
  }
}
