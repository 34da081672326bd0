package graft

import graft.data.TranscriptGen
import graft.kernel.Extractor

/** Driver-side kernel micro-benchmark: per-payload-class extraction
  * cost, no Spark involved — isolates kernel time from plan overhead.
  */
object KernelProbe {
  def main(args: Array[String]): Unit = {
    val n = 20000
    val payloads: Map[String, IndexedSeq[String]] = Map(
      "html" -> (0 until n).map(i => TranscriptGen.htmlPayload(i.toLong)),
      "malformed" -> (0 until n).map(i => TranscriptGen.malformedHtmlPayload(i.toLong)),
      "pdf" -> (0 until n).map(i => TranscriptGen.pdfPayload(i.toLong)),
      "json" -> (0 until n).map(i => TranscriptGen.jsonPayload(i.toLong)),
      "plain" -> (0 until n).map(i => TranscriptGen.plainPayload(i.toLong)))

    payloads.toSeq.sortBy(_._1).foreach { case (kind, ps) =>
      // warmup
      var sink = 0L
      ps.foreach(p => sink += Extractor.extract(p).text.length)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        ps.foreach(p => sink += Extractor.extract(p).text.length)
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      val avgLen = ps.map(_.length).sum / ps.length
      println(f"[kernel] $kind%-10s ${n / best}%,9.0f turns/s/core  " +
        f"(${best * 1e9 / n}%6.0f ns/turn, avg payload $avgLen%5d chars, " +
        f"${n * avgLen / best / 1e6}%,.0f MB/s) sink=${sink % 10}")
    }

    // html stage breakdown: tokenize vs segment
    val htmls = payloads("html")
    var sink2 = 0L
    htmls.foreach(p => sink2 += graft.kernel.HtmlTokenizer.tokenize(p).length)
    val tTok = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      htmls.foreach(p => sink2 += graft.kernel.HtmlTokenizer.tokenize(p).length)
      (System.nanoTime() - t0) / 1e9
    }.min
    val nodesArr = htmls.map(graft.kernel.HtmlTokenizer.tokenize)
    nodesArr.foreach(a => sink2 += graft.kernel.BlockSegmenter.segment(a).length)
    val tSeg = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      nodesArr.foreach(a => sink2 += graft.kernel.BlockSegmenter.segment(a).length)
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"[kernel] html.tokenize ${tTok * 1e9 / n}%6.0f ns/turn; " +
      f"html.segment ${tSeg * 1e9 / n}%6.0f ns/turn (sink=${sink2 % 10})")
  }
}
