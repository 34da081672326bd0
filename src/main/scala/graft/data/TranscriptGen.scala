package graft.data

import graft.model.Turn
import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer

/** Deterministic synthetic transcript generator (FIXTURES.md §1).
  *
  * Pure functions of (seed, convIdx, turnIdx) — no wall clock, no global
  * RNG state — so the SAME rows are produced on the driver (golden tests)
  * and inside executors (`spark.range(nConvs).flatMap(turnsOf)` at bench
  * scale), and across runs. Mirrors the reference's deterministic-seeding
  * discipline (tools/program.py:138-157, set_random_seed).
  *
  * Conversation sizes are power-law (seeded Pareto, alpha=1.1, capped) to
  * force skew — the reference's width-bucketing problem
  * (pytocr/data/imaug/rec_img_aug.py:55-106) recast as long conversations.
  * Payload class per turn is chosen by hash: html | pdf | json | plain,
  * plus a malformed-html class that exercises the tokenizer null path.
  */
object TranscriptGen extends Serializable {

  val Seed = 0x5eed5eedL
  val BaseEpochMs = 1700000000000L // fixed epoch, no wall clock

  // --- splitmix64: the per-cell deterministic RNG -----------------------
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def h(parts: Long*): Long = parts.foldLeft(Seed)((a, b) => mix(a ^ b))
  /** uniform double in [0, 1) */
  def u01(x: Long): Double = ((x >>> 11).toDouble) / (1L << 53).toDouble

  private val Vocab: Array[String] =
    ("the quick brown fox jumps over lazy dog analytics engine spark " +
      "catalyst shuffle partition conversation transcript extraction " +
      "content boilerplate density heuristic layout column reading order " +
      "token block span golden equality throughput scaling efficiency " +
      "checkpoint manifest resume lineage metric skew salt broadcast " +
      "window aggregate join filter project scan sink source schema").split(" ")

  def words(cell: Long, n: Int): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb += ' '
      sb ++= Vocab((u01(mix(cell + i)) * Vocab.length).toInt)
      i += 1
    }
    sb.toString
  }

  def sentence(cell: Long, minW: Int, maxW: Int): String = {
    val n = minW + (u01(cell) * (maxW - minW + 1)).toInt
    words(mix(cell), n) + "."
  }

  /** Power-law conversation size in [2, cap]; conv 0 is forced huge
    * (cap) so skew handling is always exercised.
    */
  def convSize(convIdx: Long, cap: Int): Int = {
    if (convIdx == 0) return cap
    val u = math.max(u01(h(convIdx, 1L)), 1e-9)
    val pareto = 2.0 * math.pow(u, -1.0 / 1.1)
    math.max(2, math.min(cap, pareto.toInt))
  }

  // --- payload builders --------------------------------------------------

  def htmlPayload(cell: Long): String = {
    val title = sentence(h(cell, 10L), 3, 6)
    val nav = (0 until 4).map(i =>
      s"""<a href="/p${i}">${words(h(cell, 20L + i), 2)}</a>""").mkString(" | ")
    val paras = (0 until 2 + (u01(h(cell, 30L)) * 3).toInt).map { i =>
      s"<p>${sentence(h(cell, 40L + i), 8, 20)} ${sentence(h(cell, 60L + i), 6, 14)}</p>"
    }.mkString("\n")
    val aside = s"""<aside><a href="/x">${words(h(cell, 70L), 3)}</a> ${words(h(cell, 71L), 2)}</aside>"""
    val entity = "Fish &amp; Chips &lt;fresh&gt; &#64; caf&#xe9;"
    s"""<html><head><title>$title</title>
<script>var tracking = ${u01(cell)};</script></head>
<body><nav>$nav</nav>
<h1>$title</h1>
$paras
<p>$entity</p>
$aside
<footer>&copy; ${words(h(cell, 80L), 2)} | <a href="/t">terms</a></footer>
</body></html>"""
  }

  /** Malformed HTML: unclosed tags, stray closers — tokenizer must stay
    * lenient; a no-tag "html" payload tests the null path separately.
    */
  def malformedHtmlPayload(cell: Long): String =
    s"""<div><p>${sentence(h(cell, 90L), 6, 12)}<p>${sentence(h(cell, 91L), 6, 12)}</i></div><span>${words(h(cell, 92L), 4)}"""

  /** Two-column PDF-ish runs, emitted in scrambled order. */
  def pdfPayload(cell: Long): String = {
    val lines = new ArrayBuffer[(Double, Double, String)]
    val nLeft = 3 + (u01(h(cell, 100L)) * 3).toInt
    val nRight = 2 + (u01(h(cell, 101L)) * 3).toInt
    for (i <- 0 until nLeft) {
      val y = 72.0 + i * 14 + (if (u01(h(cell, 110L + i)) < 0.3) 3.0 else 0.0)
      // two runs on the same line sometimes (same-line x-order rule)
      lines += ((72.0, y, words(h(cell, 120L + i), 4)))
      if (u01(h(cell, 130L + i)) < 0.5)
        lines += ((180.0, y + 2.0, words(h(cell, 140L + i), 3)))
    }
    for (i <- 0 until nRight) {
      val y = 72.0 + i * 14
      lines += ((330.0, y, words(h(cell, 150L + i), 4)))
    }
    // deterministic scramble: sort by hash of index
    val scrambled = lines.zipWithIndex
      .sortBy { case (_, i) => h(cell, 160L + i) }
      .map(_._1)
    "%PDF-like\n" + scrambled.map { case (x, y, t) =>
      f"$x%.1f,$y%.1f,${40 + t.length}%d,12,$t"
    }.mkString("\n")
  }

  def jsonPayload(cell: Long): String = {
    val txt = sentence(h(cell, 200L), 8, 16)
    val inner = sentence(h(cell, 201L), 5, 10)
    s"""{"tool": "search", "status": 200, "result": {"text": "$txt", "items": [{"rank": 1, "content": "$inner"}], "score": ${u01(h(cell, 202L))}}}"""
  }

  def plainPayload(cell: Long): String =
    sentence(h(cell, 300L), 10, 25) + "  " + sentence(h(cell, 301L), 8, 20) +
      "\n\n" + sentence(h(cell, 302L), 6, 15)

  /** Truncated tool output: sniffs as json but fails the parser — the
    * undecodable-payload class (DecodeImage None path; drives the
    * bad-rows side channel).
    */
  def truncatedJsonPayload(cell: Long): String =
    jsonPayload(cell).dropRight(5 + (u01(h(cell, 210L)) * 20).toInt)

  def payloadFor(cell: Long): String = {
    val r = u01(h(cell, 400L))
    if (r < 0.35) htmlPayload(cell)
    else if (r < 0.40) malformedHtmlPayload(cell)
    else if (r < 0.60) pdfPayload(cell)
    else if (r < 0.78) jsonPayload(cell)
    else if (r < 0.80) truncatedJsonPayload(cell)
    else plainPayload(cell)
  }

  private val Roles = Array("user", "assistant", "tool", "system")

  /** All turns of one conversation. ~5% of turns get a duplicate turn_idx
    * row (a "retry") with a strictly later ts, exercising the ts
    * tie-break of the ordering window; (turn_idx, ts) stays unique so the
    * order is total and deterministic.
    */
  def turnsOf(convIdx: Long, cap: Int): Seq[Turn] = {
    val size = convSize(convIdx, cap)
    val convId = f"conv-$convIdx%06d"
    val out = new ArrayBuffer[Turn](size + size / 16)
    var tsMs = BaseEpochMs + convIdx * 3600L * 1000L
    var t = 0
    while (t < size) {
      val cell = h(convIdx, t.toLong, 7L)
      val role = Roles((u01(h(cell, 500L)) * Roles.length).toInt)
      val tool = if (role == "tool") "search" else null
      tsMs += 1000L + (u01(h(cell, 501L)) * 30000L).toLong
      out += Turn(convId, t, role, payloadFor(cell), tool,
        new Timestamp(tsMs))
      if (u01(h(cell, 502L)) < 0.05) {
        // retry row: same turn_idx, later ts, different payload
        tsMs += 500L
        out += Turn(convId, t, role, payloadFor(mix(cell)), tool,
          new Timestamp(tsMs))
      }
      t += 1
    }
    out.toSeq
  }

  /** Driver-side tiny fixture (unit/golden tests). */
  def tiny(nConvs: Int = 64, cap: Int = 64): Seq[Turn] =
    (0L until nConvs.toLong).flatMap(turnsOf(_, cap))
}
