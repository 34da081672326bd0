package graft

import graft.data.TranscriptGen
import graft.metrics.Quality
import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality metric aggregators — RecMetric / DetMetric / TrainingStats
  * recast (SURVEY.md §2.7).
  */
class MetricsSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def extracted = {
    import spark.implicits._
    ExtractPipeline.extract(
      TranscriptGen.tiny(nConvs = 16, cap = 24)
        .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts"))
  }

  test("equality report: self-comparison is exact (acc=1, sim=1)") {
    val e = extracted.cache()
    val r = Quality.equalityReport(e, e).collect()(0)
    assert(r.getAs[Double]("acc") == 1.0)
    assert(r.getAs[Long]("n_exact") == r.getAs[Long]("n"))
    assert(math.abs(r.getAs[Double]("norm_edit_sim") - 1.0) < 1e-12)
  }

  test("equality report: a corrupted row drops accuracy below 1") {
    val e = extracted.cache()
    val bad = e.withColumn("text",
      when(col("rn") === 1, concat(col("text"), lit("CORRUPT")))
        .otherwise(col("text")))
    val r = Quality.equalityReport(bad, e).collect()(0)
    assert(r.getAs[Double]("acc") < 1.0)
    assert(r.getAs[Double]("norm_edit_sim") < 1.0)
    assert(r.getAs[Double]("norm_edit_sim") > 0.5)
  }

  test("span overlap report: self-comparison has hmean 1") {
    val e = extracted.cache()
    val r = Quality.spanOverlapReport(e, e).collect()(0)
    assert(r.getAs[Double]("precision") == 1.0)
    assert(r.getAs[Double]("recall") == 1.0)
    assert(r.getAs[Double]("hmean") == 1.0)
  }

  test("span overlap: the reference's inline self-test recast " +
      "(eval_det_iou.py:205-225 — one GT vs one detection)") {
    import spark.implicits._
    // GT span [0,100); prediction [10,90) -> 1-D IoU 80/100 > 0.5: match
    val gold = Seq(("c", 1, Seq((0, 100, "main")))).toDF("conv_id", "rn", "raw")
      .select(col("conv_id"), col("rn"),
        transform(col("raw"), s => struct(s.getField("_1").as("start"),
          s.getField("_2").as("end"), s.getField("_3").as("kind"))).as("spans"))
    val pred = Seq(("c", 1, Seq((10, 90, "main")))).toDF("conv_id", "rn", "raw")
      .select(col("conv_id"), col("rn"),
        transform(col("raw"), s => struct(s.getField("_1").as("start"),
          s.getField("_2").as("end"), s.getField("_3").as("kind"))).as("spans"))
    val r = Quality.spanOverlapReport(pred, gold).collect()(0)
    assert(r.getAs[Long]("matched") == 1L)
    // disjoint spans -> no match
    val predFar = Seq(("c", 1, Seq((200, 300, "main")))).toDF("conv_id", "rn", "raw")
      .select(col("conv_id"), col("rn"),
        transform(col("raw"), s => struct(s.getField("_1").as("start"),
          s.getField("_2").as("end"), s.getField("_3").as("kind"))).as("spans"))
    val r2 = Quality.spanOverlapReport(predFar, gold).collect()(0)
    assert(r2.getAs[Long]("matched") == 0L)
  }

  test("typed Aggregator (combine_results recast): partials merge to P/R/hmean") {
    import spark.implicits._
    import graft.metrics.SpanMetricsAggregator.RowCounts
    // 3 rows of partials across partitions: matched 3, pred 4, gold 6
    val ds = Seq(RowCounts(1, 2, 2), RowCounts(2, 2, 3), RowCounts(0, 0, 1))
      .toDS().repartition(3)
    val m = ds.select(graft.metrics.SpanMetricsAggregator.column).collect()(0)
    assert(m.matched == 3 && m.nPred == 4 && m.nGold == 6)
    assert(m.precision == 0.75 && m.recall == 0.5)
    assert(math.abs(m.hmean - 0.6) < 1e-12)
  }

  test("typed Aggregator agrees with the SQL-agg spanOverlapReport") {
    import spark.implicits._
    val e = extracted.cache()
    val sqlReport = Quality.spanOverlapReport(e, e).collect()(0)
    val p = e.select(col("conv_id"), col("rn"), col("spans").as("pred_spans"))
    val g = e.select(col("conv_id"), col("rn"), col("spans").as("gold_spans"))
    val counts = p.join(g, Seq("conv_id", "rn"))
      .select(
        Quality.spanMatches(col("pred_spans"), col("gold_spans"))
          .cast("long").as("matched"),
        size(col("pred_spans")).cast("long").as("nPred"),
        size(col("gold_spans")).cast("long").as("nGold"))
      .as[graft.metrics.SpanMetricsAggregator.RowCounts]
    val m = counts.select(graft.metrics.SpanMetricsAggregator.column).collect()(0)
    assert(m.matched == sqlReport.getAs[Long]("matched"))
    assert(m.precision == sqlReport.getAs[Double]("precision"))
    assert(m.hmean == sqlReport.getAs[Double]("hmean"))
  }

  test("smoothed median (TrainingStats recast): constant series unchanged") {
    import spark.implicits._
    val df = (1 to 50).map(i => (i, 10.0)).toDF("step", "v")
    val sm = Quality.smoothedMedian(df, "step", "v", window = 5).collect()
    assert(sm.forall(_.getAs[Double]("v_median") == 10.0))
  }

  test("throughput listener captures stage stats with skew ratio (ips/fps recast)") {
    val listener = graft.metrics.ThroughputListener.attach(spark)
    try {
      extracted.count()
      // listener bus is async and private[spark]; poll briefly instead
      var tries = 0
      while (listener.snapshot.isEmpty && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val stats = listener.snapshot
      assert(stats.nonEmpty, "no stages observed")
      val df = listener.toDF(spark)
      assert(df.columns.contains("rowsPerSec") && df.columns.contains("skewRatio"))
      assert(df.count() == stats.length)
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }
}
