package graft.data

import scala.collection.mutable

/** Fixed, reversible token vocabulary for the pre-tokenized sequence payload.
  *
  * Rendering is pure concatenation of pieces, so `decode(encode(s)) == s` for
  * any ASCII string — giving the per-row token-array-equality invariant "for
  * free" at every stage boundary (the tokens column is carried untouched; any
  * stage can re-render and re-derive).
  *
  * Layout:
  *   - ids 0..127  : single ASCII characters (id == codepoint)
  *   - ids 128..   : multi-char word pieces from the fixed corpus wordlist
  *
  * Encoding splits text into maximal runs of [A-Za-z]+ / [0-9]+ / single other
  * char; a run found in the piece table becomes one token, otherwise it is
  * byte-fallback encoded char-by-char. Deterministic, order-stable, no I/O.
  */
object Vocab {
  /** Word pieces drawn from the corpus templates (FIXTURES.md §2; reference
    * generators cmd/logdunk/main.go:27-53, cmd/accessdunk/main.go:47-126 and
    * step-test sentences plugins/steps/RexPipelineStep_test.go:49,84).
    */
  private val pieces: Array[String] = Array(
    // logdunk kv templates
    "Reticulated", "numSplines", "for", "userId", "in", "timeInMs",
    "Setting", "password", "userName", "alice", "bob", "carol", "dave",
    "Frobnicating", "widgets", "widgetId", "Deallocated", "objects",
    "objectType", "Spline", "Widget", "Gadget", "Doodad",
    // step-test sentences (RexPipelineStep_test.go:49,84, WherePipelineStep_test.go:37,48)
    "The", "user", "did", "something", "userid", "was", "thingid",
    // access log pieces (accessdunk)
    "GET", "POST", "PUT", "DELETE", "HTTP", "lorem", "ipsum", "txt",
    "Firefox", "Chrome", "Safari", "Edge", "html", "index", "api", "static",
    // json log pieces (JsonFileParser_test.go:33-35)
    "level", "info", "warn", "error", "debug", "logger", "msg", "ts",
    "reloadFileWatchers", "reloading", "file", "watchers",
    "newIndexedFilesLen", "oldIndexedFilesLen",
    // common glue
    "log", "host", "source", "the", "a", "and", "of", "to", "is"
  )

  val size: Int = 128 + pieces.length

  private val pieceToId: Map[String, Int] =
    pieces.zipWithIndex.map { case (p, i) => p -> (i + 128) }.toMap

  /** id -> rendered piece; ids < 128 render as the single ASCII char. */
  val table: Array[String] = {
    val t = new Array[String](size)
    var i = 0
    while (i < 128) { t(i) = i.toChar.toString; i += 1 }
    while (i < size) { t(i) = pieces(i - 128); i += 1 }
    t
  }

  /** id -> lowercased piece. Parse-stage fast path: extraction runs on
    * lowercased text (reference Fragments.go:95), so decoding straight to
    * lowercase skips a whole-string toLowerCase copy per row.
    */
  val tableLower: Array[String] =
    table.map(_.toLowerCase(java.util.Locale.ROOT))

  def decode(tokens: Array[Int]): String = {
    val sb = new java.lang.StringBuilder(tokens.length * 2)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (t >= 0 && t < size) sb.append(table(t)) else sb.append('�')
      i += 1
    }
    sb.toString
  }

  private def isWord(c: Char): Boolean = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  def encode(s: String): Array[Int] = {
    val out = new mutable.ArrayBuffer[Int](s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (isWord(c) || isDigit(c)) {
        val word = isWord(c)
        var j = i + 1
        while (j < n && (if (word) isWord(s.charAt(j)) else isDigit(s.charAt(j)))) j += 1
        val run = s.substring(i, j)
        pieceToId.get(run) match {
          case Some(id) => out += id
          case None =>
            var k = i
            while (k < j) { out += (s.charAt(k).toInt & 0x7f); k += 1 }
        }
        i = j
      } else {
        out += (c.toInt & 0x7f)
        i += 1
      }
    }
    out.toArray
  }
}
