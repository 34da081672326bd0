package graft.metrics

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF for the corpus span-overlap metric — the DIRECT recast of
  * DetectionIoUEvaluator.combine_results (pytocr/metrics/eval_det_iou.py:
  * 178-202): per-row partials {matched, nPred, nGold} accumulate in a
  * mutable buffer, merge across partitions, finalize to
  * precision/recall/hmean. Demonstrates the engine's typed-Aggregator
  * surface (SURVEY.md §2.9) with exactly the reference's
  * partial-update/final-merge contract (__call__ + get_metric).
  */
object SpanMetricsAggregator {

  /** Per-row input: counts already computed by Quality.spanMatches. */
  final case class RowCounts(matched: Long, nPred: Long, nGold: Long)

  final case class Buf(var matched: Long, var nPred: Long, var nGold: Long)

  final case class SpanMetrics(
      matched: Long, nPred: Long, nGold: Long,
      precision: Double, recall: Double, hmean: Double)

  val agg: Aggregator[RowCounts, Buf, SpanMetrics] =
    new Aggregator[RowCounts, Buf, SpanMetrics] {
      def zero: Buf = Buf(0L, 0L, 0L)
      def reduce(b: Buf, r: RowCounts): Buf = {
        b.matched += r.matched; b.nPred += r.nPred; b.nGold += r.nGold; b
      }
      def merge(a: Buf, b: Buf): Buf = {
        a.matched += b.matched; a.nPred += b.nPred; a.nGold += b.nGold; a
      }
      def finish(b: Buf): SpanMetrics = {
        val p = if (b.nPred > 0) b.matched.toDouble / b.nPred else 0.0
        val r = if (b.nGold > 0) b.matched.toDouble / b.nGold else 0.0
        val h = if (p + r > 0) 2 * p * r / (p + r) else 0.0
        SpanMetrics(b.matched, b.nPred, b.nGold, p, r, h)
      }
      def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      def outputEncoder: Encoder[SpanMetrics] = Encoders.product[SpanMetrics]
    }

  /** Use as ds.select(SpanMetricsAggregator.column). */
  def column: TypedColumn[RowCounts, SpanMetrics] = agg.toColumn
}
