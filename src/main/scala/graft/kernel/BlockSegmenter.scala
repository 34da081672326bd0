package graft.kernel

import graft.model.{Block, DomNode, Span}
import scala.collection.mutable.ArrayBuffer

/** Node scoring + block segmentation + classification — the engine's
  * analogue of the DB postprocess chain
  * (pytocr/postprocess/db_postprocess.py:10-153):
  *
  *   prob map -> threshold mask -> connected components -> size filter
  *   -> mean-score filter -> unclip outward growth -> boxes
  *
  * becomes
  *
  *   node scores -> threshold mask -> contiguous runs -> min-chars filter
  *   -> mean-score filter -> unclip growth into adjacent low-score nodes
  *   -> blocks
  *
  * plus PAN-style similarity-gated merge (pan_postprocess_fast/pa.pyx:86-87):
  * adjacent blocks merge only when their structural features agree.
  *
  * All thresholds are pinned constants — they are the spec the golden
  * equality tests assert (mirroring DBPostProcess's thresh/box_thresh/
  * min_size/max_candidates defaults, db_postprocess.py:12-25,92,105-114).
  */
object BlockSegmenter {

  // DBPostProcess.thresh analogue: node enters the binary mask
  val NodeThresh = 0.20
  // DBPostProcess.box_thresh analogue: block mean score gate
  val BlockThresh = 0.45
  // DBPostProcess.min_size analogue: minimum decoded chars per block
  val MinChars = 2
  // DBPostProcess.max_candidates analogue (db_postprocess.py:92)
  val MaxCandidates = 1000
  // PSE-style weak threshold used by unclip growth (progressive widening)
  val GrowThresh = 0.05

  /** Score one node — Boilerpipe/Readability-style text-density +
    * link-density heuristic (the "prob map" of the extraction):
    *  - boilerplate-ancestor nodes score 0 (nav/footer/script/... strip)
    *  - otherwise score = lengthFactor * (1 - linkRatio)
    *    where lengthFactor = min(1, decodedLen / 60.0)
    *  - headings get a floor of 0.5 (they are short but main-content)
    *  - code blocks get a floor of 0.6
    */
  def score(node: DomNode): Double = {
    if (node.boiler) return 0.0
    val len = node.text.length
    if (len == 0) return 0.0
    val linkRatio = node.linkChars.toDouble / len
    val base = math.min(1.0, len / 60.0) * (1.0 - linkRatio)
    if (node.heading) math.max(base, 0.5)
    else if (node.code) math.max(base, 0.6)
    else base
  }

  def scores(nodes: Array[DomNode]): Array[Double] = nodes.map(score)

  /** Classify a block from its member nodes — the ClsPostProcess argmax
    * analogue (pytocr/postprocess/cls_postprocess.py:4-20). Priority is
    * pinned: title beats code beats main.
    */
  def classify(nodes: Seq[DomNode]): String = {
    if (nodes.nonEmpty && nodes.forall(_.heading)) "title"
    else if (nodes.nonEmpty && nodes.forall(_.code)) "code"
    else "main"
  }

  /** Segment a scored node array into content blocks. Pure, deterministic,
    * per-row (no shuffle — rows are independent, like the per-image C++
    * kernel db_postprocess.cpp:231-358).
    */
  def segment(nodes: Array[DomNode]): Array[Block] = {
    if (nodes == null || nodes.isEmpty) return Array.empty
    val sc = scores(nodes)
    val n = nodes.length
    val out = new ArrayBuffer[Block](8)
    var i = 0
    var frontier = 0 // first node not yet owned by an emitted block
    while (i < n && out.length < MaxCandidates) {
      if (sc(i) > NodeThresh) {
        // contiguous run of above-threshold nodes (connected component)
        var j = i
        while (j + 1 < n && sc(j + 1) > NodeThresh) j += 1
        // unclip: grow into adjacent weak (but non-zero) nodes — the
        // outward polygon offset (db_postprocess.py:146-153) / PSE BFS
        // widening (pse.pyx:13-69) analogue; never past the previous
        // block's territory (blocks stay disjoint)
        var lo = i
        var hi = j
        while (lo - 1 >= frontier && sc(lo - 1) > GrowThresh) lo -= 1
        while (hi + 1 < n && sc(hi + 1) > GrowThresh) hi += 1
        // slice-free stats + text build over [lo, hi] (hot path: no
        // intermediate arrays, single StringBuilder)
        var sum = 0.0
        var allHeading = true
        var allCode = true
        var k = lo
        val sb = new java.lang.StringBuilder
        while (k <= hi) {
          sum += sc(k)
          if (!nodes(k).heading) allHeading = false
          if (!nodes(k).code) allCode = false
          val t = TextDecoder.normalize(nodes(k).text)
          if (t.nonEmpty) {
            if (sb.length > 0) sb.append('\n')
            sb.append(t)
          }
          k += 1
        }
        val mean = sum / (hi - lo + 1)  // box_score analogue
        val text = sb.toString
        if (text.length >= MinChars && mean >= BlockThresh) {
          val kind = if (allHeading) "title" else if (allCode) "code" else "main"
          val span = Span(nodes(lo).srcStart, nodes(hi).srcEnd, kind)
          out += Block(span, kind, roundScore(mean), text)
          frontier = hi + 1
        }
        i = hi + 1
      } else i += 1
    }
    out.toArray
  }

  /** Pin score precision so golden equality is safe across JIT/codegen. */
  def roundScore(d: Double): Double = math.rint(d * 1e6) / 1e6
}
