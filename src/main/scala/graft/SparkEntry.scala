package graft

import graft.data.TranscriptGen
import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` are the operator inventory entries (SURVEY.md §2); each key
  * with an `oracleSql` entry is DuckDB-cross-checked by the driver at
  * sf0.01; extraction kernels without SQL equivalents are covered by the
  * golden-equality suite instead (sbt -batch test).
  */
object SparkEntry {

  /** Deterministic synthetic transcript table (FIXTURES.md §1), generated
    * DISTRIBUTED — one task per conversation seed, pure function of
    * (seed, conv, turn) — so generation itself scales with the cluster.
    */
  def transcripts(spark: SparkSession, nConvs: Int, cap: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, nConvs.toLong, 1,
        numPartitions = spark.sparkContext.defaultParallelism)
      .flatMap(c => TranscriptGen.turnsOf(c, cap))
      .toDF()
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the full
    * main-content extraction pipeline over the synthetic transcript table.
    */
  def entry(spark: SparkSession): DataFrame = {
    graft.expr.Functions.register(spark)
    ExtractPipeline.extract(transcripts(spark, nConvs = 64, cap = 64))
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- extraction pipeline (golden-tested; rows-only for the driver) --
    "x_extract_turns" -> ((s, _) =>
      ExtractPipeline.extract(transcripts(s, 256, 64))),
    "x_extract_blocks" -> ((s, _) =>
      ExtractPipeline.blocks(ExtractPipeline.extract(transcripts(s, 256, 64)))),
    "x_conv_docs" -> ((s, _) =>
      ExtractPipeline.convDocs(ExtractPipeline.extract(transcripts(s, 256, 64)))),

    // ---- ordering window (sort_boxes / stable turn order analogue) ------
    "q_order_window" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy(col("user_id"))
    }),

    // ---- grouped aggregation, decimal-exact (RecMetric partials shape) --
    "q_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the extraction kernels (they
    * are non-SQL-expressible; covered by golden-equality tests).
    */
  def oracleSql: Map[String, String] = Map(
    "q_order_window" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
