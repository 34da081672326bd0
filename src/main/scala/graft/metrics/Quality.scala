package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quality metrics — the reference's streaming metric accumulators
  * (partial update per batch + final merge, SURVEY.md §2.7) recast as
  * Spark aggregations, which carry exactly that partial/final contract
  * natively.
  */
object Quality {

  /** RecMetric recast (pytocr/metrics/rec_metric.py:5-55): exact-match
    * accuracy + normalized Levenshtein similarity between predicted and
    * golden text, joined on (conv_id, rn). Output: one row
    * (n, n_exact, acc, norm_edit_sim) — acc must be 1.0 per north rule.
    */
  def equalityReport(pred: DataFrame, golden: DataFrame): DataFrame = {
    val p = pred.select(col("conv_id"), col("rn"), col("text").as("pred"))
    val g = golden.select(col("conv_id"), col("rn"), col("text").as("gold"))
    p.join(g, Seq("conv_id", "rn"), "full_outer")
      .agg(
        count(lit(1)).as("n"),
        sum((col("pred") <=> col("gold")).cast("long")).as("n_exact"),
        avg((col("pred") <=> col("gold")).cast("double")).as("acc"),
        avg(lit(1.0) - levenshtein(coalesce(col("pred"), lit("")),
            coalesce(col("gold"), lit(""))).cast("double") /
          greatest(length(coalesce(col("pred"), lit(""))),
            length(coalesce(col("gold"), lit(""))), lit(1)))
          .as("norm_edit_sim"))
  }

  /** Span-overlap IoU between two span arrays of one turn — the
    * DetectionIoUEvaluator greedy-match recast
    * (pytocr/metrics/eval_det_iou.py:130-153) as higher-order array
    * functions: a pred span is matched when some golden span overlaps it
    * with IoU > 0.5 (1-D IoU = intersection / union of char ranges).
    * Arrays are per-row small (MaxCandidates-capped), so this is pure
    * per-row compute — no shuffle.
    */
  def spanMatches(predSpans: Column, goldSpans: Column): Column = {
    def iouOk(p: Column, g: Column): Column = {
      val inter = greatest(lit(0),
        least(p.getField("end"), g.getField("end")) -
          greatest(p.getField("start"), g.getField("start")))
      val union = greatest(p.getField("end"), g.getField("end")) -
        least(p.getField("start"), g.getField("start"))
      inter > union * 0.5
    }
    size(filter(predSpans, p => exists(goldSpans, g => iouOk(p, g))))
  }

  /** DetMetric recast (pytocr/metrics/det_metric.py:6-55 +
    * eval_det_iou.py:178-202 combine_results): corpus precision/recall/
    * hmean over per-turn span arrays. Partial state (matched, nPred,
    * nGold) sums per row; final merge is one select — the classic
    * partial-aggregate/final-merge shape.
    */
  def spanOverlapReport(pred: DataFrame, golden: DataFrame): DataFrame = {
    val p = pred.select(col("conv_id"), col("rn"), col("spans").as("pred_spans"))
    val g = golden.select(col("conv_id"), col("rn"), col("spans").as("gold_spans"))
    p.join(g, Seq("conv_id", "rn"), "inner")
      .select(
        spanMatches(col("pred_spans"), col("gold_spans")).as("matched"),
        size(col("pred_spans")).as("n_pred"),
        size(col("gold_spans")).as("n_gold"))
      .agg(
        sum(col("matched")).as("matched"),
        sum(col("n_pred")).as("n_pred"),
        sum(col("n_gold")).as("n_gold"))
      .select(
        col("matched"), col("n_pred"), col("n_gold"),
        (col("matched") / greatest(col("n_pred"), lit(1))).as("precision"),
        (col("matched") / greatest(col("n_gold"), lit(1))).as("recall"))
      .withColumn("hmean",
        when(col("precision") + col("recall") > 0,
          lit(2) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(lit(0.0)))
  }

  /** TrainingStats recast (pytocr/utils/stats.py:27-58): sliding-window
    * MEDIAN smoothing of a per-partition stat over the last `window`
    * rows, via percentile_approx over a rows-window.
    *
    * SCALE CONTRACT: with no `partitionCols` this is a GLOBAL ordered
    * window — Spark moves all rows to one task. That is correct and cheap
    * for this function's intended input (one row per checkpoint bucket /
    * stage, i.e. thousands of rows max, like the reference's per-step
    * stat deque) but must NOT be fed a corpus; pass `partitionCols`
    * (e.g. the metric key) to keep the window distributed.
    */
  def smoothedMedian(df: DataFrame, orderCol: String, valueCol: String,
      window: Int = 20, partitionCols: Seq[String] = Nil): DataFrame = {
    val base =
      if (partitionCols.isEmpty) org.apache.spark.sql.expressions.Window
        .orderBy(col(orderCol))
      else org.apache.spark.sql.expressions.Window
        .partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val w = base.rowsBetween(-(window - 1), 0)
    df.withColumn(s"${valueCol}_median",
      percentile_approx(col(valueCol), lit(0.5), lit(10000)).over(w))
  }
}
