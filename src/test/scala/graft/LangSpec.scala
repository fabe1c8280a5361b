package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.lang.Lang

/** Ported reference parser tests:
  * pkg/logsuck/parser/SearchParser_test.go:19-128,
  * PipelineParser_test.go:19-123, Lexer_test.go shapes.
  */
class LangSpec extends AnyFunSuite {

  private def search(s: String): Lang.Search =
    Lang.parseSearch(s).fold(e => fail(s"parse error: $e"), identity)

  // --- SearchParser table tests (reference :19-113) ---
  private val table: Seq[(String, Seq[String], Seq[String], Map[String, Seq[String]], Map[String, Seq[String]])] = Seq(
    ("msg", Seq("msg"), Nil, Map(), Map()),
    ("\"msg\"", Seq("msg"), Nil, Map(), Map()),
    ("NOT msg", Nil, Seq("msg"), Map(), Map()),
    ("NOT \"msg\"", Nil, Seq("msg"), Map(), Map()),
    ("msg NOT msg2", Seq("msg"), Seq("msg2"), Map(), Map()),
    ("msg NOT \"msg2\"", Seq("msg"), Seq("msg2"), Map(), Map()),
    ("msg=msg2", Nil, Nil, Map("msg" -> Seq("msg2")), Map()),
    ("msg=\"msg2\"", Nil, Nil, Map("msg" -> Seq("msg2")), Map()),
    ("msg=msg2 msg=msg3", Nil, Nil, Map("msg" -> Seq("msg3")), Map()), // = overwrites
    ("msg IN (msg2, msg3)", Nil, Nil, Map("msg" -> Seq("msg2", "msg3")), Map()),
    ("msg NOT IN (msg2, msg3)", Nil, Nil, Map(), Map("msg" -> Seq("msg2", "msg3")))
  )

  table.foreach { case (input, frags, notFrags, fields, notFields) =>
    test(s"search parse: $input") {
      val s = search(input)
      assert(s.fragments == frags.toVector)
      assert(s.notFragments == notFrags.toVector)
      assert(s.fields.view.mapValues(_.toSeq).toMap == fields)
      assert(s.notFields.view.mapValues(_.toSeq).toMap == notFields)
    }
  }

  test("field keys lowercased; != appends (SearchParser.go:58,66-79)") {
    val s = search("UserId=5 Msg!=a Msg!=b")
    assert(s.fields == scala.collection.immutable.ListMap("userid" -> Vector("5")))
    assert(s.notFields("msg") == Vector("a", "b"))
  }

  test("source/host promotion (SearchParser.go:129-152)") {
    val s = search("source=*my-log.txt* host!=FORWARDER")
    assert(s.sources == Vector("*my-log.txt*"))
    assert(s.notHosts == Vector("FORWARDER"))
  }

  test("quoted fragment with escapes (Lexer.go:113-128)") {
    val s = search("\"hello \\\"world\\\"\"")
    assert(s.fragments == Vector("hello \"world\""))
  }

  // --- PipelineParser tests (reference :19-123) ---
  test("implicit search") {
    val input = "source=*my-log.txt* hello world"
    val steps = Lang.parsePipeline(input).toOption.get
    assert(steps.length == 1)
    assert(steps.head.stepType == "search")
    assert(steps.head.value == input)
  }

  test("explicit search") {
    val steps = Lang.parsePipeline("| search \"source=*my-log.txt* hello world\"").toOption.get
    assert(steps.length == 2)
    assert(steps(1).stepType == "search")
    assert(steps(1).value == "source=*my-log.txt* hello world")
  }

  test("incomplete pipe fails") {
    assert(Lang.parsePipeline("hello world |").isLeft)
  }

  test("pipe with rex") {
    val steps = Lang.parsePipeline("hello world | rex \"(?P<field>world)\"").toOption.get
    assert(steps.length == 2)
    assert(steps.head.value == "hello world ")
    assert(steps(1).stepType == "rex")
    assert(steps(1).value == "(?P<field>world)")
  }

  test("pipe with options") {
    val steps = Lang.parsePipeline("hello world | rex field=source \"log-(?P<logid>\\d+).txt\"").toOption.get
    assert(steps(1).args("field") == "source")
    assert(steps(1).value == "log-(?P<logid>\\d+).txt")
  }
}
