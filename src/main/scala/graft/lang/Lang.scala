package graft.lang

import scala.collection.immutable.ListMap
import scala.collection.mutable

/** The logsuck search mini-language front end, rebuilt in Scala.
  * Grammar per reference: pkg/logsuck/parser/Lexer.go:63-166,
  * SearchParser.go:34-155, PipelineParser.go:32-108. Pure Scala — compiles
  * *above* the DataFrame API; Catalyst sees only ordinary plans.
  */
object Lang {

  sealed trait Tok { def value: String }
  case class TStr(value: String) extends Tok
  case class TQuoted(value: String) extends Tok
  case class TWs(value: String) extends Tok
  case class TEq(value: String = "=") extends Tok
  case class TNeq(value: String = "!=") extends Tok
  case class TLparen(value: String = "(") extends Tok
  case class TRparen(value: String = ")") extends Tok
  case class TPipe(value: String = "|") extends Tok
  case class TComma(value: String = ",") extends Tok
  case class TKeyword(value: String) extends Tok

  private val keywords = Set("IN", "NOT")
  private val whitespace = " \n\t"
  private val symbols = "!=|(),"
  private val wordDelims = symbols + whitespace

  def tokenize(input: String): Either[String, List[Tok]] = {
    val out = mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < input.length) {
      val c = input.charAt(i)
      if (whitespace.indexOf(c.toInt) >= 0) { out += TWs(c.toString); i += 1 }
      else if (input.startsWith("!=", i)) { out += TNeq(); i += 2 }
      else if (c == '=') { out += TEq(); i += 1 }
      else if (c == '(') { out += TLparen(); i += 1 }
      else if (c == ')') { out += TRparen(); i += 1 }
      else if (c == '|') { out += TPipe(); i += 1 }
      else if (c == ',') { out += TComma(); i += 1 }
      else if (c == '"') {
        if (i == input.length - 1) return Left("unclosed quote at end of string")
        // end = first unescaped quote after i
        var j = i + 1
        var end = -1
        while (end < 0 && j < input.length) {
          if (input.charAt(j) == '"' && input.charAt(j - 1) != '\\') end = j
          j += 1
        }
        if (end < 0) return Left(s"Unclosed quote at offset $i")
        out += TQuoted(input.substring(i + 1, end).replace("\\\"", "\""))
        i = end + 1
      } else {
        var j = i
        while (j < input.length && wordDelims.indexOf(input.charAt(j).toInt) < 0) j += 1
        val str = input.substring(i, j)
        out += (if (keywords(str)) TKeyword(str) else TStr(str))
        i = j
      }
    }
    Right(out.toList)
  }

  /** Compiled search IR (reference pkg/logsuck/search/Search.go:17-26).
    * ListMap/Vector keep insertion order for deterministic plan text.
    */
  case class Search(
      fragments: Vector[String] = Vector.empty,
      notFragments: Vector[String] = Vector.empty,
      fields: ListMap[String, Vector[String]] = ListMap.empty,
      notFields: ListMap[String, Vector[String]] = ListMap.empty) {
    def sources: Vector[String] = fields.getOrElse("source", Vector.empty)
    def notSources: Vector[String] = notFields.getOrElse("source", Vector.empty)
    def hosts: Vector[String] = fields.getOrElse("host", Vector.empty)
    def notHosts: Vector[String] = notFields.getOrElse("host", Vector.empty)
  }

  private final class P(var toks: List[Tok]) {
    def peek: Option[Tok] = toks.headOption
    def take(): Tok = { val h = toks.head; toks = toks.tail; h }
    def skipWs(): Unit = while (toks.nonEmpty && toks.head.isInstanceOf[TWs]) toks = toks.tail
    def parenList(): Either[String, Vector[String]] = {
      if (!peek.exists(_.isInstanceOf[TLparen])) return Left("unexpected token, expected '(' after 'IN'")
      take(); skipWs()
      val vals = mutable.ArrayBuffer.empty[String]
      var done = false
      while (!done) {
        peek match {
          case Some(TStr(v)) => take(); vals += v
          case Some(TQuoted(v)) => take(); vals += v
          case _ => done = true
        }
        if (!done) {
          skipWs()
          peek match {
            case Some(_: TRparen) => done = true
            case Some(_: TComma) =>
              take(); skipWs()
              peek match {
                case Some(_: TStr) | Some(_: TQuoted) => ()
                case _ => return Left("unexpected token, expected string after comma in parenthesis list")
              }
            case _ => return Left("unexpected token, expected ',' or ')' after string in parenthesis list")
          }
        }
      }
      skipWs()
      if (!peek.exists(_.isInstanceOf[TRparen])) return Left("unexpected token, expected ')' at end of IN expression")
      take()
      Right(vals.toVector)
    }
  }

  /** Parse a search expression (the part before the first `|`). Field keys
    * lowercased (SearchParser.go:58); `=`/`IN` overwrite, `!=`/`NOT IN`
    * append (SearchParser.go:66,79).
    */
  def parseSearch(input: String): Either[String, Search] = tokenize(input).flatMap { toks =>
    val p = new P(toks)
    var frags = Vector.empty[String]
    var notFrags = Vector.empty[String]
    var fields = ListMap.empty[String, Vector[String]]
    var notFields = ListMap.empty[String, Vector[String]]

    while (p.toks.nonEmpty) {
      p.take() match {
        case TStr(value) =>
          val lowered = value.toLowerCase
          p.peek match {
            case Some(_: TEq) =>
              p.take()
              p.peek match {
                case Some(TStr(v)) => p.take(); fields = fields.updated(lowered, Vector(v))
                case Some(TQuoted(v)) => p.take(); fields = fields.updated(lowered, Vector(v))
                case _ => return Left("unexpected token, expected a fragment after =")
              }
            case Some(_: TNeq) =>
              p.take()
              p.peek match {
                case Some(TStr(v)) =>
                  p.take(); notFields = notFields.updated(lowered, notFields.getOrElse(lowered, Vector.empty) :+ v)
                case Some(TQuoted(v)) =>
                  p.take(); notFields = notFields.updated(lowered, notFields.getOrElse(lowered, Vector.empty) :+ v)
                case _ => return Left("unexpected token, expected a fragment after !=")
              }
            case Some(_: TWs) =>
              p.skipWs()
              p.peek match {
                case Some(TKeyword("IN")) =>
                  p.take(); p.skipWs()
                  p.parenList() match {
                    case Right(vs) => fields = fields.updated(lowered, vs)
                    case Left(e) => return Left(s"error while parsing IN expression: $e")
                  }
                case Some(TKeyword("NOT")) =>
                  p.take(); p.skipWs()
                  p.peek match {
                    case Some(TKeyword("IN")) =>
                      p.take(); p.skipWs()
                      p.parenList() match {
                        case Right(vs) =>
                          notFields = notFields.updated(lowered, notFields.getOrElse(lowered, Vector.empty) ++ vs)
                        case Left(e) => return Left(s"error while parsing NOT IN expression: $e")
                      }
                    case Some(TStr(v)) =>
                      p.take(); frags :+= value; notFrags :+= v
                    case Some(TQuoted(v)) =>
                      p.take(); frags :+= value; notFrags :+= v
                    case _ => return Left("unexpected token, expected 'IN' or a fragment after 'NOT'")
                  }
                case _ => frags :+= value
              }
            case _ => frags :+= value
          }
        case TQuoted(value) => frags :+= value
        case TKeyword("NOT") =>
          p.skipWs()
          p.peek match {
            case Some(TStr(v)) => p.take(); notFrags :+= v
            case Some(TQuoted(v)) => p.take(); notFrags :+= v
            case _ => return Left("unexpected token, expected a fragment after NOT")
          }
        case _ => () // other tokens ignored at top level (as in reference)
      }
    }
    Right(Search(frags.distinct, notFrags.distinct, fields, notFields))
  }

  /** One parsed `| step` (reference PipelineParser.go:22-30). */
  case class PipelineStep(stepType: String, args: Map[String, String], value: String)

  /** Split a full query into pipeline steps; tokens before the first `|`
    * become an implicit `search` step (PipelineParser.go:44-61).
    */
  def parsePipeline(s: String): Either[String, List[PipelineStep]] = tokenize(s).flatMap { toks =>
    val p = new P(toks)
    val steps = mutable.ListBuffer.empty[PipelineStep]
    if (!p.peek.exists(_.isInstanceOf[TPipe])) {
      val sb = new StringBuilder
      while (p.toks.nonEmpty && !p.peek.exists(_.isInstanceOf[TPipe])) sb.append(p.take().value)
      steps += PipelineStep("search", Map.empty, sb.toString)
    } else {
      steps += PipelineStep("search", Map.empty, "")
    }
    while (p.toks.nonEmpty) {
      p.skipWs()
      p.peek match {
        case Some(_: TPipe) => p.take()
        case _ => return Left("failed to parse: expected '|'")
      }
      p.skipWs()
      val stepType = p.peek match {
        case Some(TStr(v)) => p.take(); v
        case _ => return Left("failed to parse: expected step name after '|'")
      }
      p.skipWs()
      var args = Map.empty[String, String]
      var trailing: Option[String] = None
      var scanning = true
      while (scanning) {
        p.peek match {
          case Some(TStr(key)) =>
            p.take(); p.skipWs()
            p.peek match {
              case Some(_: TEq) =>
                p.take(); p.skipWs()
                p.peek match {
                  case Some(TStr(v)) => p.take(); args += key -> v
                  case Some(TQuoted(v)) => p.take(); args += key -> v
                  case _ => return Left(s"failed to parse: expected string or quoted string in option list for command $stepType")
                }
                p.skipWs()
              case _ =>
                trailing = Some(key); scanning = false
            }
          case _ => scanning = false
        }
      }
      val value = trailing.orElse {
        p.peek match {
          case Some(TQuoted(v)) => p.take(); Some(v)
          case Some(TStr(v)) => p.take(); Some(v)
          case _ => None
        }
      }.getOrElse("")
      steps += PipelineStep(stepType, args, value)
    }
    Right(steps.toList)
  }
}
