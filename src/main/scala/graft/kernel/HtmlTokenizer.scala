package graft.kernel

import graft.model.DomNode
import scala.collection.mutable.ArrayBuffer

/** HTML tag-stream tokenizer: raw payload -> flattened DOM node array.
  *
  * This is the engine's analogue of the reference's DecodeImage
  * (pytocr/data/imaug/operators.py:9-38): raw bytes -> structured dense
  * array, returning null on undecodable input so the row can be filtered
  * (operators.py:26-27 returns None).
  *
  * The tokenizer is a single forward scan (no DOM tree is materialized —
  * the node array IS the flattened DOM, like Im2Seq's layout->sequence
  * flatten, pytocr/modeling/necks/rnn.py:4-15). It is deliberately lenient
  * (browsers are): unclosed tags are tolerated, stray "</x>" pops to the
  * nearest matching open tag. It is also the normalization SPEC — the
  * golden oracle and the Spark path both call exactly this code, so the
  * per-turn equality contract is pinned here.
  *
  * Pinned rules:
  *  - void elements (br, hr, img, input, meta, link, area, base, col,
  *    embed, source, track, wbr) never push depth.
  *  - script/style/noscript content is consumed but emitted as a node with
  *    boiler=true (so scoring zeroes it; spans still map to source).
  *  - comments <!-- --> and doctype/processing instructions are skipped.
  *  - entities are decoded in node text (amp lt gt quot apos nbsp #NNN
  *    #xHH); unknown entities are kept verbatim.
  *  - a text node's (srcStart, srcEnd) are offsets of the RAW text in the
  *    source payload (entities still encoded there).
  *  - returns null when the payload contains no complete element tag at
  *    all (undecodable -> row drop, the DecodeImage None path).
  */
object HtmlTokenizer {

  private val VoidTags = Set(
    "br", "hr", "img", "input", "meta", "link", "area", "base", "col",
    "embed", "source", "track", "wbr")

  private val BoilerTags = Set(
    "nav", "footer", "header", "aside", "script", "style", "form",
    "noscript", "button", "select", "option", "iframe")

  private val HeadingTags = Set("h1", "h2", "h3", "h4", "h5", "h6")
  private val CodeTags    = Set("pre", "code")

  // canonical instances for the common tags — tag-name extraction
  // allocates nothing when the tag is one of these
  private val CommonTags: Array[String] = Array(
    "a", "p", "b", "i", "u", "em", "li", "ul", "ol", "td", "tr", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "br", "hr", "div", "span", "nav",
    "img", "pre", "code", "body", "head", "html", "form", "table", "title",
    "aside", "style", "footer", "header", "script", "strong", "section",
    "article", "noscript", "button", "select", "option", "iframe", "input",
    "meta", "link")
  private val CommonByLen: Array[Array[String]] = {
    val maxLen = CommonTags.map(_.length).max
    (0 to maxLen).map(l => CommonTags.filter(_.length == l)).toArray
  }

  /** Lowercased tag name for html[s, e): returns the canonical instance
    * for known tags (zero allocation), builds a string otherwise.
    */
  private def internTag(html: String, s: Int, e: Int): String = {
    val len = e - s
    if (len > 0 && len < CommonByLen.length) {
      val bucket = CommonByLen(len)
      var bi = 0
      while (bi < bucket.length) {
        val cand = bucket(bi)
        var k = 0
        var same = true
        while (same && k < len) {
          if (Character.toLowerCase(html.charAt(s + k)) != cand.charAt(k))
            same = false
          k += 1
        }
        if (same) return cand
        bi += 1
      }
    }
    val sb = new java.lang.StringBuilder(len)
    var k = s
    while (k < e) { sb.append(Character.toLowerCase(html.charAt(k))); k += 1 }
    sb.toString
  }

  /** Case-insensitive indexOf without allocating a lowercased copy. */
  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val hn = hay.length
    val nn = needle.length
    var i = math.max(from, 0)
    while (i + nn <= hn) {
      if (hay.regionMatches(true, i, needle, 0, nn)) return i
      i += 1
    }
    -1
  }

  /** Decode HTML character entities. Unknown entities pass through. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val decoded: String = ent match {
            case "amp"  => "&"
            case "lt"   => "<"
            case "gt"   => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case _ if ent.length > 1 && ent.charAt(0) == '#' =>
              try {
                val cp =
                  if (ent.charAt(1) == 'x' || ent.charAt(1) == 'X')
                    Integer.parseInt(ent.substring(2), 16)
                  else Integer.parseInt(ent.substring(1))
                if (Character.isValidCodePoint(cp) && cp >= 0x20)
                  new String(Character.toChars(cp))
                else ""
              } catch { case _: NumberFormatException => null }
            case _ => null
          }
          if (decoded != null) { sb.append(decoded); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Tokenize an HTML payload into a flat DOM node array, or null when the
    * payload has no complete element tag (undecodable).
    */
  def tokenize(html: String): Array[DomNode] = {
    if (html == null) return null
    val n = html.length
    val out = new ArrayBuffer[DomNode](32)
    // open-element stack: (tag, linkDepthAtPush)
    val stack = new ArrayBuffer[String](16)
    var linkDepth = 0    // nesting count of <a>
    var boilerDepth = 0  // nesting count of boilerplate containers
    var headDepth = 0    // nesting count of h1..h6
    var codeDepth = 0    // nesting count of pre/code
    var sawTag = false
    var i = 0

    def currentTag: String = if (stack.isEmpty) "" else stack(stack.length - 1)

    def emitText(start: Int, end: Int): Unit = {
      if (end <= start) return
      // skip pure-whitespace nodes BEFORE substring — they carry no
      // content signal and are the majority of inter-tag gaps
      var ws = true
      var k = start
      while (ws && k < end) { if (!Character.isWhitespace(html.charAt(k))) ws = false; k += 1 }
      if (ws) return
      val raw = html.substring(start, end)
      val decoded = decodeEntities(raw)
      out += DomNode(
        tag = currentTag,
        depth = stack.length,
        linkChars = if (linkDepth > 0) decoded.length else 0,
        boiler = boilerDepth > 0,
        heading = headDepth > 0,
        code = codeDepth > 0,
        text = decoded,
        srcStart = start,
        srcEnd = end)
    }

    def popTag(tag: String): Unit = {
      // pop to nearest matching open tag; ignore unmatched close
      var j = stack.length - 1
      while (j >= 0 && stack(j) != tag) j -= 1
      if (j < 0) return
      while (stack.length > j) {
        val t = stack.remove(stack.length - 1)
        if (t == "a") linkDepth -= 1
        if (BoilerTags.contains(t)) boilerDepth -= 1
        if (HeadingTags.contains(t)) headDepth -= 1
        if (CodeTags.contains(t)) codeDepth -= 1
      }
    }

    var textStart = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n) {
        val c1 = html.charAt(i + 1)
        if (c1 == '!' || c1 == '?') {
          // comment / doctype / PI
          emitText(textStart, i)
          if (html.startsWith("<!--", i)) {
            val e = html.indexOf("-->", i + 4)
            i = if (e < 0) n else e + 3
          } else {
            val e = html.indexOf('>', i + 1)
            i = if (e < 0) n else e + 1
          }
          textStart = i
        } else if (c1 == '/' || Character.isLetter(c1)) {
          val close = html.indexOf('>', i + 1)
          if (close < 0) {
            // dangling '<' with no close — treat rest as text
            i = n
          } else {
            emitText(textStart, i)
            sawTag = true
            // tag name parsed in place — no substring over the attribute
            // text (that copy dominated tokenizer time)
            val nameStart = i + (if (c1 == '/') 2 else 1)
            var te = nameStart
            while (te < close && Character.isLetterOrDigit(html.charAt(te))) te += 1
            val tag = internTag(html, nameStart, te)
            val selfClosing = close > nameStart && html.charAt(close - 1) == '/'
            if (c1 == '/') popTag(tag)
            else if (tag.nonEmpty && !selfClosing && !VoidTags.contains(tag)) {
              stack += tag
              if (tag == "a") linkDepth += 1
              if (BoilerTags.contains(tag)) boilerDepth += 1
              if (HeadingTags.contains(tag)) headDepth += 1
              if (CodeTags.contains(tag)) codeDepth += 1
              // raw-text elements: consume to the matching close tag
              if (tag == "script" || tag == "style") {
                val endTag = "</" + tag
                val e = indexOfIgnoreCase(html, endTag, close + 1)
                val contentEnd = if (e < 0) n else e
                // emit raw-text content as a boiler node (span preserved)
                val start0 = close + 1
                if (contentEnd > start0) {
                  val raw = html.substring(start0, contentEnd)
                  if (raw.exists(!Character.isWhitespace(_))) {
                    out += DomNode(tag, stack.length, 0, boiler = true,
                      heading = headDepth > 0, code = codeDepth > 0,
                      text = raw, srcStart = start0, srcEnd = contentEnd)
                  }
                }
                popTag(tag)
                i = if (e < 0) n else {
                  val gt = html.indexOf('>', e)
                  if (gt < 0) n else gt + 1
                }
                textStart = i
              } else {
                i = close + 1
                textStart = i
              }
            } else {
              i = close + 1
              textStart = i
            }
            if (c1 == '/') { i = close + 1; textStart = i }
          }
        } else {
          // '<' followed by non-tag char: literal text
          i += 1
        }
      } else {
        i += 1
      }
    }
    emitText(textStart, n)
    if (!sawTag) null else out.toArray
  }
}
