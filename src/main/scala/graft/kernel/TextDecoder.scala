package graft.kernel

/** Text decoder / normalizer — the engine's analogue of CTCLabelDecode
  * (pytocr/postprocess/rec_postprocess.py:5-93): collapse repeats, drop the
  * blank token, map via dict, join, mean confidence.
  *
  * Our recast: collapse whitespace runs, drop control characters, decode
  * entities (done in the tokenizer), join blocks with '\n'.
  *
  * ORDER IS PINNED (the CTC trap — dedupe BEFORE blank-drop,
  * rec_postprocess.py:43-50): here, control-char mapping happens BEFORE
  * whitespace collapse, so "a<NUL> <NUL>b" (<NUL> spelled out for the raw
  * 0x00 byte, keeping this file plain text for diff/blame) -> "a b":
  * control chars first become removable, then the surrounding spaces
  * collapse to one.
  */
object TextDecoder {

  /** Normalize a decoded text fragment:
    * 1. map control chars (except \n and \t) to nothing
    * 2. map \t to a single space
    * 3. collapse whitespace runs (any run containing \n -> single '\n';
    *    otherwise -> single ' ')
    * 4. trim leading/trailing whitespace
    */
  /** True when normalize(s) == s — single scan, no allocation. Input is
    * already normal iff: no leading/trailing whitespace, no two adjacent
    * whitespace chars, every whitespace char is ' ' or '\n', and no
    * control chars.
    */
  private def isNormalized(s: String): Boolean = {
    val n = s.length
    if (n == 0) return true
    if (Character.isWhitespace(s.charAt(0)) ||
      Character.isWhitespace(s.charAt(n - 1))) return false
    var i = 0
    var prevWs = false
    while (i < n) {
      val c = s.charAt(i)
      if (c < 0x20 && c != '\n') return false
      val ws = c == ' ' || c == '\n'
      if (ws && prevWs) return false
      if (Character.isWhitespace(c) && !ws) return false
      prevWs = ws
      i += 1
    }
    true
  }

  def normalize(s: String): String = {
    if (s == null) return null
    if (isNormalized(s)) return s // common case: zero-copy
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingWs = false  // a whitespace run is open
    var pendingNl = false  // the open run contains a newline
    while (i < n) {
      val c = s.charAt(i)
      if (c < 0x20 && c != '\n' && c != '\t') {
        // step 1: control char — removed, does not open a ws run
      } else if (Character.isWhitespace(c)) {
        pendingWs = true
        if (c == '\n' || c == '\r') pendingNl = true
      } else {
        if (pendingWs && sb.length > 0) sb.append(if (pendingNl) '\n' else ' ')
        pendingWs = false
        pendingNl = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Join block texts in reading order with single newlines, dropping
    * empties — the concat_ws("\n", ...) reassembly step.
    */
  def joinBlocks(texts: Seq[String]): String =
    texts.filter(t => t != null && t.nonEmpty).mkString("\n")
}
