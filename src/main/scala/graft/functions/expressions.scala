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

  /** Decode into a caller-owned (reused) builder — the parse hot path renders
    * each row into a ThreadLocal buffer instead of allocating a String.
    */
  def decodeInto(arr: ArrayData, sb: java.lang.StringBuilder): java.lang.StringBuilder = {
    sb.setLength(0)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = arr.getInt(i)
      if (t >= 0 && t < Vocab.size) sb.append(Vocab.table(t)) else sb.append('�')
      i += 1
    }
    sb
  }

  /** [[decodeInto]] straight to lowercase (what extraction consumes). */
  def decodeLowerInto(arr: ArrayData, sb: java.lang.StringBuilder): java.lang.StringBuilder = {
    sb.setLength(0)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = arr.getInt(i)
      if (t >= 0 && t < Vocab.size) sb.append(Vocab.tableLower(t)) else sb.append('�')
      i += 1
    }
    sb
  }

  /** JSON value stringification shared by the fields-map and time-only
    * extraction paths (Go parity: numbers as %f, null as "<nil>").
    */
  def jsonValueToString(v: com.fasterxml.jackson.databind.JsonNode): String =
    if (v == null) null
    else if (v.isNumber) String.format(java.util.Locale.ROOT, "%.6f", Double.box(v.asDouble()))
    else if (v.isTextual) v.asText()
    else if (v.isBoolean) String.valueOf(v.asBoolean())
    else if (v.isNull) "<nil>"
    else v.toString

  /** UTF8String straight from a char-buffer region — the extraction hot path
    * encodes each field key/value ONCE (buffer chars -> utf8 bytes) instead
    * of the String detour (subSequence String + fromString re-encode).
    * ASCII fast path; the rare non-ASCII region falls back to String.
    */
  def utf8FromChars(s: CharSequence, from: Int, to: Int): UTF8String = {
    var i = from
    while (i < to && s.charAt(i) < 0x80) i += 1
    if (i == to) {
      val b = new Array[Byte](to - from)
      var j = from
      while (j < to) { b(j - from) = s.charAt(j).toByte; j += 1 }
      UTF8String.fromBytes(b)
    } else UTF8String.fromString(s.subSequence(from, to).toString)
  }

  val TIME_KEY: UTF8String = UTF8String.fromString("_time")
  val HOST_KEY: UTF8String = UTF8String.fromString("host")
  val SOURCE_KEY: UTF8String = UTF8String.fromString("source")
}

/** Reusable flat fields builder: UTF8String keys/values in first-insertion
  * order with last-wins overwrite — LinkedHashMap semantics without the
  * per-row node + String + re-encode churn (the former hot-path cost: 2
  * String allocs + 2 UTF8String re-encodes per extracted pair). Events
  * carry a handful of fields, so the overwrite probe is a linear scan.
  */
final class FieldsBuffer {
  private var ks = new Array[UTF8String](16)
  private var vs = new Array[UTF8String](16)
  private var n = 0
  // events carry a handful of fields (linear probe), but a pathological
  // JSON doc can carry thousands of keys — switch to a hash index past a
  // threshold so put() stays O(1) instead of going quadratic
  private var idx: java.util.HashMap[UTF8String, Integer] = null
  private val IndexAt = 32

  def clear(): Unit = { n = 0; idx = null }
  def size: Int = n

  private def indexOf(k: UTF8String): Int = {
    if (idx != null) {
      val i = idx.get(k)
      return if (i == null) -1 else i.intValue()
    }
    var i = 0
    while (i < n) { if (ks(i).equals(k)) return i; i += 1 }
    -1
  }

  private def grow(): Unit = {
    ks = java.util.Arrays.copyOf(ks, ks.length * 2)
    vs = java.util.Arrays.copyOf(vs, vs.length * 2)
  }

  def put(k: UTF8String, v: UTF8String): Unit = {
    val i = indexOf(k)
    if (i >= 0) { vs(i) = v; return }
    if (n == ks.length) grow()
    ks(n) = k; vs(n) = v
    if (idx != null) idx.put(k, n)
    else if (n + 1 >= IndexAt) {
      idx = new java.util.HashMap[UTF8String, Integer](64)
      var j = 0
      while (j <= n) { idx.put(ks(j), j); j += 1 }
    }
    n += 1
  }

  def put(k: String, v: String): Unit =
    put(UTF8String.fromString(k), UTF8String.fromString(if (v == null) "" else v))

  def get(k: UTF8String): UTF8String = {
    val i = indexOf(k)
    if (i < 0) null else vs(i)
  }

  def build(): MapData = {
    val kk = new Array[Any](n)
    val vv = new Array[Any](n)
    var i = 0
    while (i < n) { kk(i) = ks(i); vv(i) = vs(i); i += 1 }
    new ArrayBasedMapData(new GenericArrayData(kk), new GenericArrayData(vv))
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

  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(javaPattern)
  @transient lazy val groupCount: Int = pattern.matcher("").groupCount()
  def namedOnly: Boolean = groupNames.length == groupCount

  // Reused matcher (hot path: one per row per extractor otherwise).
  // ThreadLocal because expression instances can be shared on the driver;
  // executor tasks each own a deserialized copy, so the map stays tiny.
  @transient private lazy val localMatcher =
    ThreadLocal.withInitial[java.util.regex.Matcher](() => pattern.matcher(""))

  /** The reference's default extractor gets a hand-rolled scanner: the regex
    * engine costs ~5x more than a linear scan for this fixed shape, and the
    * default runs on every row of every kv-configured source.
    */
  val isDefaultKv: Boolean = original == "(\\w+)=(\\w+)"

  @inline private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') || c == '_'

  private def regionEquals(s: CharSequence, a: Int, b: Int, t: String): Boolean = {
    if (t == null || b - a != t.length) return false
    var i = 0
    while (i < t.length) {
      if (s.charAt(a + i) != t.charAt(i)) return false
      i += 1
    }
    true
  }

  /** Scanner with the exact match set of `(\w+)=(\w+)`: a maximal word run
    * immediately followed by '=' and a non-empty word run; the search resumes
    * after the value (matches never overlap), like Matcher.find. Verified
    * against the regex path by a ScalaCheck property (ExtractSpec).
    */
  private def kvScan(s: CharSequence,
      into: FieldsBuffer,
      timeField: String, timeOut: Array[String]): Unit = {
    val n = s.length
    var i = 0
    while (i < n) {
      if (isWordChar(s.charAt(i))) {
        var j = i + 1
        while (j < n && isWordChar(s.charAt(j))) j += 1
        if (j < n && s.charAt(j) == '=' && j + 1 < n && isWordChar(s.charAt(j + 1))) {
          var k = j + 2
          while (k < n && isWordChar(s.charAt(k))) k += 1
          if (into != null) {
            into.put(ExprRuntime.utf8FromChars(s, i, j),
              ExprRuntime.utf8FromChars(s, j + 1, k))
          } else if (regionEquals(s, i, j, timeField)) {
            timeOut(0) = s.subSequence(j + 1, k).toString
          } else if (regionEquals(s, i, j, "_time")) {
            timeOut(1) = s.subSequence(j + 1, k).toString
          }
          i = k
        } else i = j // no '=' or empty value: regex would fail here too
      } else i += 1
    }
  }

  // Named-group keys pre-encoded once (they repeat every row).
  @transient lazy val groupNamesU8: Array[UTF8String] =
    groupNames.map(UTF8String.fromString)
  @transient private lazy val EMPTY = UTF8String.fromString("")

  /** Run against `s`, writing name->value into `into` (last-wins).
    * For named-only extractors, group numbers are assigned in paren order,
    * so the i-th recorded name IS group i+1 — indexed access, no name lookup.
    */
  def extractInto(s: CharSequence, into: FieldsBuffer): Unit = {
    if (isDefaultKv) { kvScan(s, into, null, null); return }
    val m = localMatcher.get()
    m.reset(s)
    val gc = groupCount
    val named = namedOnly
    val names = groupNamesU8
    while (m.find()) {
      if (named) {
        var i = 0
        while (i < names.length) {
          val a = m.start(i + 1)
          // Go yields "" for non-participating groups
          val v = if (a < 0) EMPTY else ExprRuntime.utf8FromChars(s, a, m.end(i + 1))
          into.put(names(i), v)
          i += 1
        }
      } else if (gc == 2) {
        val ka = m.start(1)
        val va = m.start(2)
        into.put(if (ka < 0) EMPTY else ExprRuntime.utf8FromChars(s, ka, m.end(1)),
          if (va < 0) EMPTY else ExprRuntime.utf8FromChars(s, va, m.end(2)))
      }
      // else: malformed extractor, skipped (reference logs a warning)
    }
  }

  /** Time-only extraction: identical scan order, but records just the last
    * values for keys `timeField` (timeOut(0)) and "_time" (timeOut(1)) —
    * no map, no allocation for irrelevant pairs. The route path derives `ts`
    * through this, letting Catalyst prune the full fields map away.
    */
  def extractTimeInto(s: CharSequence, timeField: String, timeOut: Array[String]): Unit = {
    if (isDefaultKv) { kvScan(s, null, timeField, timeOut); return }
    val m = localMatcher.get()
    m.reset(s)
    val gc = groupCount
    val named = namedOnly
    val names = groupNames
    while (m.find()) {
      if (named) {
        var i = 0
        while (i < names.length) {
          val nm = names(i)
          if (nm == timeField) {
            val v = m.group(i + 1); timeOut(0) = if (v == null) "" else v
          } else if (nm == "_time") {
            val v = m.group(i + 1); timeOut(1) = if (v == null) "" else v
          }
          i += 1
        }
      } else if (gc == 2) {
        val k = m.group(1)
        if (k != null && k == timeField) {
          val v = m.group(2); timeOut(0) = if (v == null) "" else v
        } else if (k != null && k == "_time") {
          val v = m.group(2); timeOut(1) = if (v == null) "" else v
        }
      }
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
  @transient private lazy val timeFieldU8: UTF8String =
    if (timeField != null && timeField.nonEmpty) UTF8String.fromString(timeField) else null
  @transient private lazy val localFields =
    ThreadLocal.withInitial[FieldsBuffer](() => new FieldsBuffer)

  def doExtract(rawS: UTF8String, hostS: UTF8String, sourceS: UTF8String): MapData = {
    val s = rawS.toString
    val m = localFields.get()
    m.clear()
    var i = 0
    while (i < compiled.length) { compiled(i).extractInto(s, m); i += 1 }
    if (timeFieldU8 != null) {
      val tv = m.get(timeFieldU8)
      if (tv != null) m.put(ExprRuntime.TIME_KEY, tv)
    }
    if (inject) {
      if (hostS != null) m.put(ExprRuntime.HOST_KEY, hostS.clone())
      if (sourceS != null) m.put(ExprRuntime.SOURCE_KEY, sourceS.clone())
    }
    m.build()
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

  @transient private lazy val timeFieldU8: UTF8String =
    if (timeField != null && timeField.nonEmpty) UTF8String.fromString(timeField) else null
  @transient private lazy val localFields =
    ThreadLocal.withInitial[FieldsBuffer](() => new FieldsBuffer)

  def doExtract(rawS: UTF8String, hostS: UTF8String, sourceS: UTF8String): MapData = {
    val node = try mapper.readTree(rawS.toString) catch { case _: Exception => return null }
    if (node == null || !node.isObject) return null
    val m = localFields.get()
    m.clear()
    val it = node.fields()
    while (it.hasNext) {
      val e = it.next()
      m.put(e.getKey, ExprRuntime.jsonValueToString(e.getValue))
    }
    if (timeFieldU8 != null) {
      val tv = m.get(timeFieldU8)
      if (tv != null) m.put(ExprRuntime.TIME_KEY, tv)
    }
    if (inject) {
      if (hostS != null) m.put(ExprRuntime.HOST_KEY, hostS.clone())
      if (sourceS != null) m.put(ExprRuntime.SOURCE_KEY, sourceS.clone())
    }
    m.build()
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

/** Diagnostic counter (cheap atomic; used by perf probes only). */
object ExtractCounter {
  val n = new java.util.concurrent.atomic.AtomicLong()
}

/** Whole parse-stage extraction in ONE compact expression: resolves the
  * event's source to its config (glob dispatch, memoized per distinct source
  * exactly like the reference's getSourceToIndexedFileConfig memo,
  * plugins/steps/Utils.go:24-49), then runs that config's extractors
  * (regex or JSON) and injects host/source.
  *
  * Replaces a CASE-WHEN chain of RegexExtractToMap branches: the chain's
  * generated code grew past JIT-compilable method sizes (observed 5x
  * slowdown in wide write projections); this emits a single call.
  */
case class ExtractEvent(
    raw: Expression,
    host: Expression,
    source: Expression,
    configs: Seq[(String, String, Seq[String], String)], // (globRegex, fileType, extractors, timeField)
    defaultExtractors: Seq[String],
    defaultTimeField: String,
    rawIsTokens: Boolean = false) // raw child is the tokens array: decode (to lowercase) in-place, skipping 2 string copies/row
  extends TernaryExpression {

  override def first: Expression = raw
  override def second: Expression = host
  override def third: Expression = source
  override def dataType: DataType = MapType(StringType, StringType, valueContainsNull = false)
  override def nullable: Boolean = raw.nullable

  @transient private lazy val compiledGlobs: Array[java.util.regex.Pattern] =
    configs.map(c => java.util.regex.Pattern.compile(c._1)).toArray
  @transient private lazy val compiledExtractors: Array[Array[CompiledExtractor]] =
    configs.map(_._3.map(new CompiledExtractor(_)).toArray).toArray :+
      defaultExtractors.map(new CompiledExtractor(_)).toArray
  @transient private lazy val jsonMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
  // memo: source -> config index (configs.length = default fallback)
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  // reused per-row fields buffer (ThreadLocal: driver may share instances)
  @transient private lazy val localFields =
    ThreadLocal.withInitial[FieldsBuffer](() => new FieldsBuffer)
  @transient private lazy val localSb =
    ThreadLocal.withInitial[java.lang.StringBuilder](() => new java.lang.StringBuilder(256))
  @transient private lazy val timeFieldsU8: Array[UTF8String] =
    (configs.map(_._4) :+ defaultTimeField).map(tf =>
      if (tf != null && tf.nonEmpty) UTF8String.fromString(tf) else null).toArray

  private def resolve(source: String): Int =
    memo.computeIfAbsent(source, s => {
      var i = 0
      while (i < compiledGlobs.length) {
        if (compiledGlobs(i).matcher(s).matches()) return Integer.valueOf(i)
        i += 1
      }
      Integer.valueOf(configs.length)
    }).intValue()

  private def jsonInto(text: String, m: FieldsBuffer): Unit =
    try {
      val node = jsonMapper.readTree(text)
      if (node != null && node.isObject) {
        val it = node.fields()
        while (it.hasNext) {
          val e = it.next()
          m.put(e.getKey, ExprRuntime.jsonValueToString(e.getValue))
        }
      }
    } catch { case _: Exception => () }

  private def finish(m: FieldsBuffer,
      timeFieldU8: UTF8String, hostS: UTF8String, sourceS: UTF8String): MapData = {
    if (timeFieldU8 != null) {
      val tv = m.get(timeFieldU8)
      if (tv != null) m.put(ExprRuntime.TIME_KEY, tv)
    }
    if (hostS != null) m.put(ExprRuntime.HOST_KEY, hostS.clone())
    if (sourceS != null) m.put(ExprRuntime.SOURCE_KEY, sourceS.clone())
    m.build()
  }

  def doExtract(rawS: UTF8String, hostS: UTF8String, sourceS: UTF8String): MapData = {
    val src = if (sourceS == null) "" else sourceS.toString
    val idx = resolve(src)
    val isJson = idx < configs.length && configs(idx)._2 == "json"
    val m = localFields.get()
    m.clear()
    if (isJson) {
      jsonInto(rawS.toString, m)
    } else {
      // search-time extraction runs on lowercased raw (Fragments.go:95)
      val s = rawS.toString.toLowerCase(java.util.Locale.ROOT)
      val exs = compiledExtractors(idx)
      var i = 0
      while (i < exs.length) { exs(i).extractInto(s, m); i += 1 }
    }
    finish(m, timeFieldsU8(idx), hostS, sourceS)
  }

  /** Tokens fast path: decode the payload straight into a reused buffer
    * (lowercased for the regex path), no intermediate String/toLowerCase.
    */
  def doExtractTokens(arr: ArrayData, hostS: UTF8String, sourceS: UTF8String): MapData = {
    val src = if (sourceS == null) "" else sourceS.toString
    val idx = resolve(src)
    val isJson = idx < configs.length && configs(idx)._2 == "json"
    val m = localFields.get()
    m.clear()
    if (isJson) {
      jsonInto(ExprRuntime.decodeInto(arr, localSb.get()).toString, m)
    } else {
      val sb = ExprRuntime.decodeLowerInto(arr, localSb.get())
      val exs = compiledExtractors(idx)
      var i = 0
      while (i < exs.length) { exs(i).extractInto(sb, m); i += 1 }
    }
    finish(m, timeFieldsU8(idx), hostS, sourceS)
  }

  override def eval(input: InternalRow): Any = {
    val r = raw.eval(input)
    if (r == null) return null
    val h = host.eval(input).asInstanceOf[UTF8String]
    val s = source.eval(input).asInstanceOf[UTF8String]
    if (rawIsTokens) doExtractTokens(r.asInstanceOf[ArrayData], h, s)
    else doExtract(r.asInstanceOf[UTF8String], h, s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("extractEvent", this, classOf[ExtractEvent].getName)
    val rawC = raw.genCode(ctx)
    val hostC = host.genCode(ctx)
    val sourceC = source.genCode(ctx)
    val hostV = if (host.nullable) s"${hostC.isNull} ? null : ${hostC.value}" else hostC.value.toString
    val srcV = if (source.nullable) s"${sourceC.isNull} ? null : ${sourceC.value}" else sourceC.value.toString
    val call = if (rawIsTokens) "doExtractTokens" else "doExtract"
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
            ${ev.value} = $ref.$call(${rawC.value}, ($hostV), ($srcV));
          }
          """)).code())
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ExtractEvent =
    copy(raw = f, host = s, source = t)
}

/** Time-field-only extraction from the tokens payload: same config dispatch
  * and scan order as [[ExtractEvent]], but records just the `timeField` /
  * `_time` values — no map, no per-field UTF8String churn. Deriving `ts`
  * through this (instead of `fields["_time"]`) decouples the route path from
  * the full fields map, so Catalyst prunes the map away from the fan-out
  * write projection entirely.
  */
case class ExtractTimeValue(
    tokens: Expression,
    source: Expression,
    configs: Seq[(String, String, Seq[String], String)], // (globRegex, fileType, extractors, timeField)
    defaultExtractors: Seq[String],
    defaultTimeField: String)
  extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = source
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val compiledGlobs: Array[java.util.regex.Pattern] =
    configs.map(c => java.util.regex.Pattern.compile(c._1)).toArray
  @transient private lazy val compiledExtractors: Array[Array[CompiledExtractor]] =
    configs.map(_._3.map(new CompiledExtractor(_)).toArray).toArray :+
      defaultExtractors.map(new CompiledExtractor(_)).toArray
  @transient private lazy val jsonMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  @transient private lazy val localSb =
    ThreadLocal.withInitial[java.lang.StringBuilder](() => new java.lang.StringBuilder(256))
  @transient private lazy val localOut =
    ThreadLocal.withInitial[Array[String]](() => new Array[String](2))

  private def resolve(source: String): Int =
    memo.computeIfAbsent(source, s => {
      var i = 0
      while (i < compiledGlobs.length) {
        if (compiledGlobs(i).matcher(s).matches()) return Integer.valueOf(i)
        i += 1
      }
      Integer.valueOf(configs.length)
    }).intValue()

  def doExtract(arr: ArrayData, sourceS: UTF8String): UTF8String = {
    val src = if (sourceS == null) "" else sourceS.toString
    val idx = resolve(src)
    val isJson = idx < configs.length && configs(idx)._2 == "json"
    val cfgField =
      if (idx < configs.length) configs(idx)._4 else defaultTimeField
    // an empty time_field config only disables the timeField OVERRIDE — a
    // directly-extracted "_time" key still names the event time (matches
    // ExtractEvent.finish, which always keeps the map entry)
    val timeField =
      if (cfgField == null || cfgField.isEmpty) "_time" else cfgField
    if (isJson) {
      try {
        val node = jsonMapper.readTree(ExprRuntime.decodeInto(arr, localSb.get()).toString)
        if (node == null || !node.isObject) return null
        val v = ExprRuntime.jsonValueToString(node.get(timeField))
        val r = if (v != null) v else ExprRuntime.jsonValueToString(node.get("_time"))
        if (r == null) null else UTF8String.fromString(r)
      } catch { case _: Exception => null }
    } else {
      val sb = ExprRuntime.decodeLowerInto(arr, localSb.get())
      val out = localOut.get()
      out(0) = null; out(1) = null
      val exs = compiledExtractors(idx)
      var i = 0
      while (i < exs.length) { exs(i).extractTimeInto(sb, timeField, out); i += 1 }
      val r = if (out(0) != null) out(0) else out(1)
      if (r == null) null else UTF8String.fromString(r)
    }
  }

  override def eval(input: InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) return null
    doExtract(t.asInstanceOf[ArrayData], source.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("extractTime", this, classOf[ExtractTimeValue].getName)
    val tC = tokens.genCode(ctx)
    val sC = source.genCode(ctx)
    val srcV = if (source.nullable) s"${sC.isNull} ? null : ${sC.value}" else sC.value.toString
    ev.copy(code =
      org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
        new StringContext(
          s"""
          ${tC.code}
          ${sC.code}
          org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
          if (!${tC.isNull}) {
            ${ev.value} = $ref.doExtract(${tC.value}, ($srcV));
          }
          boolean ${ev.isNull} = (${ev.value} == null);
          """)).code())
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ExtractTimeValue =
    copy(tokens = l, source = r)
}

/** Per-config event-time parse in one compact expression (reference
  * ParseTime.go:24-54 semantics: Go layouts + UNIX / UNIX_MILLIS /
  * UNIX_DECIMAL_NANOS). Case-insensitive java.time parsing (month names
  * arrive lowercased because extraction lowercases raw). Config resolution
  * memoized per source. Returns micros since epoch; null if unparseable.
  */
case class EventTime(
    timeStr: Expression,
    source: Expression,
    configs: Seq[(String, String)], // (globRegex, goLayout)
    javaLayouts: Seq[String],       // pre-translated java patterns ("" for UNIX forms)
    defaultLayout: (String, String)) // (goLayout, javaLayout)
  extends BinaryExpression {

  override def left: Expression = timeStr
  override def right: Expression = source
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true

  @transient private lazy val compiledGlobs: Array[java.util.regex.Pattern] =
    configs.map(c => java.util.regex.Pattern.compile(c._1)).toArray
  @transient private lazy val formatters: Array[AnyRef] =
    (configs.map(_._2).zip(javaLayouts) :+ defaultLayout).map {
      case (go, _) if go == "UNIX" || go == "UNIX_MILLIS" || go == "UNIX_DECIMAL_NANOS" => go
      case (_, java0) =>
        new java.time.format.DateTimeFormatterBuilder()
          .parseCaseInsensitive().appendPattern(java0)
          .toFormatter(java.util.Locale.ROOT)
    }.toArray
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private def resolve(source: String): Int =
    memo.computeIfAbsent(source, s => {
      var i = 0
      while (i < compiledGlobs.length) {
        if (compiledGlobs(i).matcher(s).matches()) return Integer.valueOf(i)
        i += 1
      }
      Integer.valueOf(configs.length)
    }).intValue()

  /** Allocation-free fast path for the reference's default kv layout
    * ("2006/01/02 15:04:05.000000"): fixed-width numeric parse + the
    * days-from-civil epoch formula. ~50x cheaper than DateTimeFormatter.
    */
  private def fastKv(v: String): java.lang.Long = {
    if (v.length != 26 || v.charAt(4) != '/' || v.charAt(7) != '/' ||
      v.charAt(10) != ' ' || v.charAt(13) != ':' || v.charAt(16) != ':' ||
      v.charAt(19) != '.') return null
    var i = 0
    def d2(a: Int): Int = {
      val c1 = v.charAt(a); val c2 = v.charAt(a + 1)
      if (c1 < '0' || c1 > '9' || c2 < '0' || c2 > '9') return -1
      (c1 - '0') * 10 + (c2 - '0')
    }
    val c0 = v.charAt(0); val c1 = v.charAt(1)
    if (c0 < '0' || c0 > '9' || c1 < '0' || c1 > '9') return null
    val year = (c0 - '0') * 1000 + (c1 - '0') * 100 + d2(2)
    val month = d2(5); val day = d2(8)
    val hh = d2(11); val mm = d2(14); val ss = d2(17)
    if (month < 1 || month > 12 || day < 1 || day > 31 || hh < 0 || mm < 0 || ss < 0) return null
    var micros = 0L
    i = 20
    while (i < 26) {
      val c = v.charAt(i)
      if (c < '0' || c > '9') return null
      micros = micros * 10 + (c - '0')
      i += 1
    }
    // days-from-civil (Howard Hinnant's algorithm, public domain)
    val y = if (month <= 2) year - 1 else year
    val era = (if (y >= 0) y else y - 399) / 400
    val yoe = y - era * 400
    val mp = (month + 9) % 12
    val doy = (153 * mp + 2) / 5 + day - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    val days = era * 146097L + doe - 719468L
    java.lang.Long.valueOf(
      ((days * 86400L + hh * 3600L + mm * 60L + ss) * 1000000L) + micros)
  }

  @transient private lazy val isDefaultKv: Array[Boolean] =
    (configs.map(_._2) :+ defaultLayout._1).map(_ == "2006/01/02 15:04:05.000000").toArray

  @transient private lazy val isAccessLayout: Array[Boolean] =
    (configs.map(_._2) :+ defaultLayout._1).map(_ == "02/Jan/2006:15:04:05 -0700").toArray

  /** Allocation-free fast path for the common-log-format layout
    * ("02/Jan/2006:15:04:05 -0700", e.g. `20/jan/2021:19:37:00 +0000`) —
    * the second-hottest layout after the default kv one (every access-*
    * row of the pipeline and the mixed corpus parses through it). Same
    * approach as [[fastKv]]: fixed-width numeric parse + month-abbrev
    * lookup + days-from-civil; case-insensitive like the formatter it
    * replaces. Falls back (null) to the DateTimeFormatter path on any
    * shape mismatch.
    */
  private def fastAccess(v: String): java.lang.Long = {
    if (v.length != 26 || v.charAt(2) != '/' || v.charAt(6) != '/' ||
      v.charAt(11) != ':' || v.charAt(14) != ':' || v.charAt(17) != ':' ||
      v.charAt(20) != ' ') return null
    def d2(a: Int): Int = {
      val c1 = v.charAt(a); val c2 = v.charAt(a + 1)
      if (c1 < '0' || c1 > '9' || c2 < '0' || c2 > '9') return -1
      (c1 - '0') * 10 + (c2 - '0')
    }
    val day = d2(0)
    @inline def lc(c: Char): Char = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
    val m1 = lc(v.charAt(3)); val m2 = lc(v.charAt(4)); val m3 = lc(v.charAt(5))
    val month = (m1: @unchecked) match {
      case 'j' => if (m2 == 'a' && m3 == 'n') 1
        else if (m2 == 'u' && m3 == 'n') 6
        else if (m2 == 'u' && m3 == 'l') 7 else -1
      case 'f' => if (m2 == 'e' && m3 == 'b') 2 else -1
      case 'm' => if (m2 == 'a' && m3 == 'r') 3
        else if (m2 == 'a' && m3 == 'y') 5 else -1
      case 'a' => if (m2 == 'p' && m3 == 'r') 4
        else if (m2 == 'u' && m3 == 'g') 8 else -1
      case 's' => if (m2 == 'e' && m3 == 'p') 9 else -1
      case 'o' => if (m2 == 'c' && m3 == 't') 10 else -1
      case 'n' => if (m2 == 'o' && m3 == 'v') 11 else -1
      case 'd' => if (m2 == 'e' && m3 == 'c') 12 else -1
      case _ => -1
    }
    val yh = d2(7); val yl = d2(9)
    val hh = d2(12); val mm = d2(15); val ss = d2(18)
    val sign = v.charAt(21) match {
      case '+' => 1L
      case '-' => -1L
      case _ => return null
    }
    val oh = d2(22); val om = d2(24)
    if (day < 1 || day > 31 || month < 0 || yh < 0 || yl < 0 ||
      hh < 0 || hh > 23 || mm < 0 || mm > 59 || ss < 0 || ss > 59 ||
      oh < 0 || om < 0 || om > 59) return null
    val year = yh * 100 + yl
    // out-of-month days (e.g. 31/apr, 30/feb) fall back to the formatter:
    // its SMART resolver CLAMPS them, and the fast path must not diverge
    // from the pre-existing behavior on any input
    val leap = year % 4 == 0 && (year % 100 != 0 || year % 400 == 0)
    val dim = month match {
      case 2 => if (leap) 29 else 28
      case 4 | 6 | 9 | 11 => 30
      case _ => 31
    }
    if (day > dim) return null
    // days-from-civil (Howard Hinnant's algorithm, public domain)
    val y = if (month <= 2) year - 1 else year
    val era = (if (y >= 0) y else y - 399) / 400
    val yoe = y - era * 400
    val mp = (month + 9) % 12
    val doy = (153 * mp + 2) / 5 + day - 1
    val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
    val days = era * 146097L + doe - 719468L
    val offsetSecs = sign * (oh * 3600L + om * 60L)
    java.lang.Long.valueOf(
      (days * 86400L + hh * 3600L + mm * 60L + ss - offsetSecs) * 1000000L)
  }

  /** null (boxed) when unparseable — callers coalesce a fallback. */
  def doParse(value: UTF8String, sourceS: UTF8String): java.lang.Long = {
    if (value == null) return null
    val idx = resolve(if (sourceS == null) "" else sourceS.toString)
    val v = value.toString
    if (isDefaultKv(idx)) return fastKv(v)
    if (isAccessLayout(idx)) {
      val r = fastAccess(v)
      if (r != null) return r
      // fall through to the formatter on shape mismatch
    }
    try {
      formatters(idx) match {
        case "UNIX" => java.lang.Long.valueOf(v.trim.toLong * 1000000L)
        case "UNIX_MILLIS" => java.lang.Long.valueOf(v.trim.toLong * 1000L)
        case "UNIX_DECIMAL_NANOS" =>
          val dot = v.indexOf('.')
          if (dot < 0) return null
          val sec = v.substring(0, dot).toLong
          val nanos = v.substring(dot + 1).toLong // Go quirk: decimals as int nanos
          java.lang.Long.valueOf(sec * 1000000L + nanos / 1000L)
        case f: java.time.format.DateTimeFormatter =>
          val ta = f.parse(v)
          val date =
            if (ta.isSupported(java.time.temporal.ChronoField.EPOCH_DAY))
              java.time.LocalDate.from(ta)
            else java.time.LocalDate.of(1970, 1, 1)
          val time =
            if (ta.isSupported(java.time.temporal.ChronoField.NANO_OF_DAY))
              java.time.LocalTime.from(ta)
            else java.time.LocalTime.MIDNIGHT
          val offset =
            if (ta.isSupported(java.time.temporal.ChronoField.OFFSET_SECONDS))
              java.time.ZoneOffset.from(ta)
            else java.time.ZoneOffset.UTC
          val odt = java.time.OffsetDateTime.of(date, time, offset)
          java.lang.Long.valueOf(odt.toInstant.getEpochSecond * 1000000L +
            odt.getNano / 1000L)
      }
    } catch { case _: Exception => null }
  }

  override def eval(input: InternalRow): Any = {
    val v = timeStr.eval(input)
    if (v == null) return null
    doParse(v.asInstanceOf[UTF8String], source.eval(input).asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("eventTime", this, classOf[EventTime].getName)
    val vC = timeStr.genCode(ctx)
    val sC = source.genCode(ctx)
    val srcV = if (source.nullable) s"${sC.isNull} ? null : ${sC.value}" else sC.value.toString
    val boxed = ctx.freshName("boxedTs")
    ev.copy(code =
      org.apache.spark.sql.catalyst.expressions.codegen.Block.BlockHelper(
        new StringContext(
          s"""
          ${vC.code}
          ${sC.code}
          java.lang.Long $boxed = ${vC.isNull} ? null : $ref.doParse(${vC.value}, ($srcV));
          boolean ${ev.isNull} = ($boxed == null);
          long ${ev.value} = ${ev.isNull} ? 0L : $boxed.longValue();
          """)).code())
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): EventTime =
    copy(timeStr = l, source = r)
}
