package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.data.{SequenceGen, Vocab}
import graft.functions.F

/** Vocabulary round-trip (the token-array equality invariant's foundation)
  * + generator determinism and skew profile (FIXTURES.md §1).
  */
class VocabSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("encode/decode round-trips the corpus lines") {
    val lines = Seq(
      "2021/01/20 19:37:00.123456 Reticulated numSplines=423 for userId=7120 in timeInMs=38",
      "2021-01-20 19:37:00 The user did something. userid=123, thingid=456.",
      """203.0.113.7 - - [20/Jan/2021:19:37:00 +0000] "GET /lorem/ipsum.txt HTTP/1.1" 200 13370 "-" Firefox""",
      """{"level":"info","ts":1675006830.089307,"msg":"reloading file watchers"}""")
    lines.foreach { l => assert(Vocab.decode(Vocab.encode(l)) == l) }
  }

  test("property: round-trip for any printable-ASCII string") {
    val printable = Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    val prop = Prop.forAll(printable) { s => Vocab.decode(Vocab.encode(s)) == s }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("expression round-trip matches Scala round-trip (codegen path)") {
    import spark.implicits._
    val df = Seq("a=1 Reticulated x", "GET /lorem HTTP/1.1").toDF("s")
    val got = df.select(F.tokens_to_text(F.text_to_tokens(col("s"))).as("r"), col("s"))
      .filter(col("r") =!= col("s")).count()
    assert(got == 0)
  }

  test("sequence generator: deterministic, n_tok consistent, skewed") {
    val a = SequenceGen.sequences(spark, 2000, 4)
    val b = SequenceGen.sequences(spark, 2000, 8) // different partitioning, same content
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.filter(size(col("tokens")) =!= col("n_tok")).count() == 0)
    val bySource = a.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("log-0.txt").toDouble / 2000 > 0.4) // skew head
    assert(bySource.size >= 5)
  }

  test("generated corpus parses under its configs (token-array invariant)") {
    import spark.implicits._
    val seqs = SequenceGen.sequences(spark, 500, 4)
    val rendered = seqs.select(col("doc_id"), col("tokens"),
      F.tokens_to_text(col("tokens")).as("raw"), col("source"))
    // re-encoding the rendered text reproduces the token array exactly
    assert(rendered.filter(F.text_to_tokens(col("raw")) =!= col("tokens")).count() == 0)
    // kv lines carry an extractable _time
    val kv = rendered.filter(col("source").startsWith("log-"))
      .select(F.extract_fields(lower(col("raw")), lit("h"), col("source"),
        graft.model.SourceConfig.defaultExtractors, "_time").as("m"))
    assert(kv.filter(not(map_contains_key(col("m"), "_time"))).count() == 0)
  }
}
