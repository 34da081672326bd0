package graft.kernel

import graft.model.{Block, Span}
import scala.collection.mutable.ArrayBuffer

/** Tool-output JSON text extraction — the engine's analogue of
  * DetLabelEncode's json.loads parse (pytocr/data/imaug/label_ops.py:25):
  * pull the human-readable text out of a nested tool-result payload.
  *
  * Spec (pinned): walk the JSON document in source order and collect every
  * STRING value whose key is "text", "content", "stdout" or "message", at
  * any nesting depth. Each hit becomes one block (kind "main") whose span
  * covers the raw (still-escaped) string literal in the source payload.
  * Returns null when the payload is not parseable JSON (undecodable ->
  * row drop, the DecodeImage None path, operators.py:26-27).
  *
  * Implemented as a single-pass recursive-descent scanner (payloads are
  * per-turn small; no external JSON library — zero deps, codegen-friendly).
  */
object JsonText {

  private val TextKeys = Set("text", "content", "stdout", "message")

  def extract(payload: String): Array[Block] = {
    if (payload == null) return null
    val s = payload
    val n = s.length
    val out = new ArrayBuffer[Block](4)
    var pos = 0
    var ok = true

    def err(): Unit = { ok = false; pos = n }

    def skipWs(): Unit =
      while (pos < n && Character.isWhitespace(s.charAt(pos))) pos += 1

    /** Parse a string literal at pos (must be '"'); returns decoded value
      * plus raw content offsets (inside the quotes).
      */
    def parseString(): (String, Int, Int) = {
      if (pos >= n || s.charAt(pos) != '"') { err(); return ("", pos, pos) }
      pos += 1
      val start = pos
      val sb = new java.lang.StringBuilder
      while (pos < n && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\' && pos + 1 < n) {
          val e = s.charAt(pos + 1)
          e match {
            case '"'  => sb.append('"');  pos += 2
            case '\\' => sb.append('\\'); pos += 2
            case '/'  => sb.append('/');  pos += 2
            case 'n'  => sb.append('\n'); pos += 2
            case 't'  => sb.append('\t'); pos += 2
            case 'r'  => sb.append('\r'); pos += 2
            case 'b'  => sb.append('\b'); pos += 2
            case 'f'  => sb.append('\f'); pos += 2
            case 'u' if pos + 5 < n =>
              try {
                sb.append(Integer.parseInt(s.substring(pos + 2, pos + 6), 16).toChar)
                pos += 6
              } catch { case _: NumberFormatException => err() }
            case _ => err()
          }
        } else { sb.append(c); pos += 1 }
      }
      val end = pos
      if (pos >= n) { err(); ("", start, start) }
      else { pos += 1; (sb.toString, start, end) }
    }

    def parseValue(key: String): Unit = {
      skipWs()
      if (pos >= n) { err(); return }
      s.charAt(pos) match {
        case '{' =>
          pos += 1; skipWs()
          if (pos < n && s.charAt(pos) == '}') { pos += 1; return }
          var more = true
          while (more && ok) {
            skipWs()
            val (k, _, _) = parseString()
            skipWs()
            if (pos < n && s.charAt(pos) == ':') pos += 1 else err()
            parseValue(k)
            skipWs()
            if (pos < n && s.charAt(pos) == ',') pos += 1
            else { more = false
              if (pos < n && s.charAt(pos) == '}') pos += 1 else err() }
          }
        case '[' =>
          pos += 1; skipWs()
          if (pos < n && s.charAt(pos) == ']') { pos += 1; return }
          var more = true
          while (more && ok) {
            parseValue(key)  // array items inherit the field key
            skipWs()
            if (pos < n && s.charAt(pos) == ',') pos += 1
            else { more = false
              if (pos < n && s.charAt(pos) == ']') pos += 1 else err() }
          }
        case '"' =>
          val (v, a, b) = parseString()
          if (ok && TextKeys.contains(key)) {
            val norm = TextDecoder.normalize(v)
            if (norm.nonEmpty)
              out += Block(Span(a, b, "main"), "main", 1.0, norm)
          }
        case 't' => if (s.startsWith("true", pos)) pos += 4 else err()
        case 'f' => if (s.startsWith("false", pos)) pos += 5 else err()
        case 'n' => if (s.startsWith("null", pos)) pos += 4 else err()
        case _ =>
          // number
          val st = pos
          while (pos < n && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
          if (pos == st) err()
      }
    }

    skipWs()
    parseValue("")
    skipWs()
    if (!ok || pos != n) null else out.toArray
  }
}
