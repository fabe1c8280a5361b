package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.data.Vocab

/** Static runtime helpers referenced from generated (Janino) code. Scala
  * objects emit static forwarders, so `graft.functions.ExprRuntime.decode(x)`
  * is directly callable from codegen'd Java.
  */
object ExprRuntime {
  def decode(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder(n * 2)
    var i = 0
    while (i < n) {
      val t = arr.getInt(i)
      if (t >= 0 && t < Vocab.size) sb.append(Vocab.table(t)) else sb.append('�')
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def encode(s: UTF8String): ArrayData = {
    val ints = Vocab.encode(s.toString)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(ints)
  }
}

/** Render a pre-tokenized payload back to its log-line text through the fixed
  * vocabulary. Pure concatenation — `TokensToText(TextToTokens(s)) == s`.
  * The hot parse-stage input; codegen'd (no UDF, no fallback).
  */
case class TokensToText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(v: Any): Any =
    ExprRuntime.decode(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprRuntime.decode($c)")
  override protected def withNewChildInternal(c: Expression): TokensToText = copy(child = c)
}

/** Inverse of [[TokensToText]]; used by the deterministic sequence generator. */
case class TextToTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(v: Any): Any =
    ExprRuntime.encode(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ExprRuntime.encode($c)")
  override protected def withNewChildInternal(c: Expression): TextToTokens = copy(child = c)
}

/** One field-extractor regex with the reference's dispatch rule
  * (pkg/logsuck/parser/RegexFileParser.go:33-56):
  *   - every capture group named  -> each named group becomes name->value;
  *   - exactly two capture groups -> dynamic key=value (match(1)->match(2));
  *   - anything else              -> extractor is skipped (reference warns).
  * All matches are found (FindAllStringSubmatch); later matches and later
  * extractors overwrite (last-wins). Go `(?P<name>` syntax is translated to
  * Java named groups; names like `_time` that Java rejects are aliased to
  * generated safe names internally.
  */
final class CompiledExtractor(val original: String) extends Serializable {
  // Translate (?P<name>  ->  (?<gN>  recording the original names in order.
  val (javaPattern: String, groupNames: Array[String]) = {
    val rx = java.util.regex.Pattern.compile("""\(\?P?<([^>]+)>""")
    val m = rx.matcher(original)
    val sb = new java.lang.StringBuffer()
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) {
      // skip escaped "\(" — Go would treat it literally too
      val st = m.start()
      if (st > 0 && original.charAt(st - 1) == '\\') {
        m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(m.group(0)))
      } else {
        names += m.group(1)
        m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(s"(?<g${names.length - 1}>"))
      }
    }
    m.appendTail(sb)
    (sb.toString, names.toArray)
  }

  @transient private var _p: java.util.regex.Pattern = _
  def pattern: java.util.regex.Pattern = {
    if (_p == null) _p = java.util.regex.Pattern.compile(javaPattern)
    _p
  }
  def groupCount: Int = pattern.matcher("").groupCount()
  def namedOnly: Boolean = groupNames.length == groupCount

  /** Run against `s`, writing name->value into `into` (last-wins). */
  def extractInto(s: String, into: java.util.LinkedHashMap[String, String]): Unit = {
    val m = pattern.matcher(s)
    val gc = groupCount
    val named = namedOnly
    while (m.find()) {
      if (named) {
        var i = 0
        while (i < groupNames.length) {
          val v = m.group(s"g$i")
          into.put(groupNames(i), if (v == null) "" else v) // Go yields "" for non-participating groups
          i += 1
        }
      } else if (gc == 2) {
        val k = m.group(1)
        val v = m.group(2)
        into.put(if (k == null) "" else k, if (v == null) "" else v)
      }
      // else: malformed extractor, skipped (reference logs a warning)
    }
  }
}

/** Search-time dynamic field extraction producing the `fields` map
  * (reference: plugins/steps/Fragments.go:95-98 + RegexFileParser.Extract).
  *
  * children: (raw, host, source). When `inject` is true the reserved fields
  * `host`/`source` overwrite extracted values after extraction, and the
  * configured `timeField` is aliased to `_time` (RegexFileParser.go:57-59).
  * Codegen'd via a reference object so whole-stage codegen spans survive.
  */
case class RegexExtractToMap(
    raw: Expression,
    host: Expression,
    source: Expression,
    extractors: Seq[String],
    timeField: String,
    inject: Boolean)
  extends TernaryExpression {

  override def first: Expression = raw
  override def second: Expression = host
  override def third: Expression = source
  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = false)
  override def nullable: Boolean = raw.nullable

  @transient private lazy val compiled: Array[CompiledExtractor] =
    extractors.map(new CompiledExtractor(_)).toArray

  def doExtract(rawS: UTF8String, hostS: UTF8String, sourceS: UTF8String): MapData = {
    val s = rawS.toString
    val m = new java.util.LinkedHashMap[String, String]()
    var i = 0
    while (i < compiled.length) { compiled(i).extractInto(s, m); i += 1 }
    if (timeField != null && timeField.nonEmpty) {
      val tv = m.get(timeField)
      if (tv != null) m.put("_time", tv)
    }
    if (inject) {
      if (hostS != null) m.put("host", hostS.toString)
      if (sourceS != null) m.put("source", sourceS.toString)
    }
    val n = m.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = UTF8String.fromString(e.getValue)
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def eval(input: InternalRow): Any = {
    val r = raw.eval(input)
    if (r == null) return null
    val h = host.eval(input)
    val s = source.eval(input)
    doExtract(r.asInstanceOf[UTF8String],
      h.asInstanceOf[UTF8String], s.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rexMap", this, classOf[RegexExtractToMap].getName)
    val rawC = raw.genCode(ctx)
    val hostC = host.genCode(ctx)
    val sourceC = source.genCode(ctx)
    val hostV = if (host.nullable) s"${hostC.isNull} ? null : ${hostC.value}" else hostC.value.toString
    val srcV = if (source.nullable) s"${sourceC.isNull} ? null : ${sourceC.value}" else sourceC.value.toString
    ev.copy(code =
      org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
        new StringContext(
          s"""
          ${rawC.code}
          ${hostC.code}
          ${sourceC.code}
          boolean ${ev.isNull} = ${rawC.isNull};
          org.apache.spark.sql.catalyst.util.MapData ${ev.value} = null;
          if (!${ev.isNull}) {
            ${ev.value} = $ref.doExtract(${rawC.value}, ($hostV), ($srcV));
          }
          """)).code())
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): RegexExtractToMap =
    copy(raw = f, host = s, source = t)
}

/** Last-wins union of two string->string maps — the `rex` step's in-place
  * field merge (plugins/steps/RexPipelineStep.go:64-68). Unlike Spark's
  * `map_concat` this does not depend on spark.sql.mapKeyDedupPolicy.
  */
case class MapUnion(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = false)
  override def nullable: Boolean = left.nullable && right.nullable

  def doUnion(l: MapData, r: MapData): MapData = {
    val m = new java.util.LinkedHashMap[UTF8String, UTF8String]()
    def put(d: MapData): Unit = if (d != null) {
      val ks = d.keyArray(); val vs = d.valueArray()
      var i = 0
      while (i < d.numElements()) {
        m.put(ks.getUTF8String(i), vs.getUTF8String(i))
        i += 1
      }
    }
    put(l); put(r)
    val n = m.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next(); keys(j) = e.getKey; vals(j) = e.getValue; j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null && r == null) null
    else doUnion(l.asInstanceOf[MapData], r.asInstanceOf[MapData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("mapUnion", this, classOf[MapUnion].getName)
    val lC = left.genCode(ctx)
    val rC = right.genCode(ctx)
    ev.copy(code =
      org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
        new StringContext(
          s"""
          ${lC.code}
          ${rC.code}
          boolean ${ev.isNull} = ${lC.isNull} && ${rC.isNull};
          org.apache.spark.sql.catalyst.util.MapData ${ev.value} = null;
          if (!${ev.isNull}) {
            ${ev.value} = $ref.doUnion(
              ${lC.isNull} ? null : ${lC.value},
              ${rC.isNull} ? null : ${rC.value});
          }
          """)).code())
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MapUnion =
    copy(left = l, right = r)
}

/** JSON field extraction (reference pkg/logsuck/parser/JsonFileParser.go:35-57):
  * every top-level value stringified — numbers with Go's `%f` (6 fixed
  * decimals, the reference parses all JSON numbers as float64), booleans as
  * true/false, null as Go's "<nil>"; nested objects/arrays kept as compact
  * JSON (divergence from Go's fmt.Sprint map rendering, documented in
  * SURVEY.md §7.3). timeField aliased to `_time`; host/source injected when
  * `inject` (search-path parity with RegexExtractToMap).
  */
case class JsonToFieldsMap(
    raw: Expression,
    host: Expression,
    source: Expression,
    timeField: String,
    inject: Boolean)
  extends TernaryExpression {

  override def first: Expression = raw
  override def second: Expression = host
  override def third: Expression = source
  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def doExtract(rawS: UTF8String, hostS: UTF8String, sourceS: UTF8String): MapData = {
    val node = try mapper.readTree(rawS.toString) catch { case _: Exception => return null }
    if (node == null || !node.isObject) return null
    val m = new java.util.LinkedHashMap[String, String]()
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      val s =
        if (v.isNumber) String.format(java.util.Locale.ROOT, "%.6f", Double.box(v.asDouble()))
        else if (v.isTextual) v.asText()
        else if (v.isBoolean) String.valueOf(v.asBoolean())
        else if (v.isNull) "<nil>"
        else v.toString
      m.put(e.getKey, s)
    }
    if (timeField != null && timeField.nonEmpty) {
      val tv = m.get(timeField)
      if (tv != null) m.put("_time", tv)
    }
    if (inject) {
      if (hostS != null) m.put("host", hostS.toString)
      if (sourceS != null) m.put("source", sourceS.toString)
    }
    val n = m.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    val it2 = m.entrySet().iterator()
    var j = 0
    while (it2.hasNext) {
      val e = it2.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = UTF8String.fromString(e.getValue)
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  override def eval(input: InternalRow): Any = {
    val r = raw.eval(input)
    if (r == null) return null
    val h = host.eval(input)
    val s = source.eval(input)
    doExtract(r.asInstanceOf[UTF8String],
      h.asInstanceOf[UTF8String], s.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonMap", this, classOf[JsonToFieldsMap].getName)
    val rawC = raw.genCode(ctx)
    val hostC = host.genCode(ctx)
    val sourceC = source.genCode(ctx)
    val hostV = if (host.nullable) s"${hostC.isNull} ? null : ${hostC.value}" else hostC.value.toString
    val srcV = if (source.nullable) s"${sourceC.isNull} ? null : ${sourceC.value}" else sourceC.value.toString
    ev.copy(code =
      org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
        new StringContext(
          s"""
          ${rawC.code}
          ${hostC.code}
          ${sourceC.code}
          org.apache.spark.sql.catalyst.util.MapData ${ev.value} = null;
          if (!${rawC.isNull}) {
            ${ev.value} = $ref.doExtract(${rawC.value}, ($hostV), ($srcV));
          }
          boolean ${ev.isNull} = (${ev.value} == null);
          """)).code())
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): JsonToFieldsMap =
    copy(raw = f, host = s, source = t)
}
