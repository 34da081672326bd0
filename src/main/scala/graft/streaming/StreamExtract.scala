package graft.streaming

import graft.expr.Functions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming flavor of the extraction pipeline. The reference is
  * batch-only (bounded epochs, SURVEY.md §2.8), so batch is primary; this
  * module exists because a transcript table at 10^12-turn scale is
  * usually APPENDED continuously — the same per-turn kernel runs
  * unchanged under Structured Streaming, with per-source-file ordering
  * instead of the global window (row_number over an unbounded stream is
  * undefined; stable global rn remains the batch job's contract).
  */
object StreamExtract {

  val turnSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))

  /** File-source stream -> per-turn extraction (same expression as batch). */
  def extractStream(spark: SparkSession, inputDir: String): DataFrame =
    spark.readStream
      .schema(turnSchema)
      .parquet(inputDir)
      .select(
        col("conv_id"), col("turn_idx"), col("ts"),
        Functions.extract_turn(col("text")).as("ex"))
      .select(col("conv_id"), col("turn_idx"), col("ts"),
        col("ex.kind").as("kind"),
        col("ex.text").as("text"),
        col("ex.spans").as("spans"))

  /** Watermarked windowed aggregation over the extracted stream:
    * turns + extracted chars per (10 min event-time window, kind).
    */
  def windowedStats(extracted: DataFrame): DataFrame =
    extracted
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("kind"))
      .agg(count(lit(1)).as("turns"),
        sum(length(col("text"))).as("chars"))
}
