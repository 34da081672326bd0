package graft.metrics

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Stage/task throughput observer — the reference's ips/fps logging
  * (tools/program.py:318-322, 472) recast as a SparkListener feeding a
  * queryable metrics table: per stage (rows in, wall ms, rows/sec, max
  * task ms vs median task ms = the skew signal).
  */
/** Top-level so Catalyst can derive an Encoder (inner case classes of a
  * non-object need an outer scope).
  */
final case class StageStat(stageId: Int, name: String, tasks: Int,
    rows: Long, wallMs: Long, maxTaskMs: Long, medianTaskMs: Long)

class ThroughputListener extends SparkListener {

  private val taskMs = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
  private val stats = mutable.ArrayBuffer.empty[StageStat]

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
    taskMs.getOrElseUpdate(e.stageId, mutable.ArrayBuffer.empty) +=
      e.taskInfo.duration
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
    synchronized {
      val info = e.stageInfo
      val durations = taskMs.remove(info.stageId)
        .getOrElse(mutable.ArrayBuffer.empty).sorted
      val rows = info.taskMetrics.inputMetrics.recordsRead +
        info.taskMetrics.shuffleReadMetrics.recordsRead
      stats += StageStat(
        info.stageId,
        info.name.takeWhile(_ != '\n').take(120),
        durations.length,
        rows,
        info.completionTime.getOrElse(0L) - info.submissionTime.getOrElse(0L),
        if (durations.nonEmpty) durations.last else 0L,
        if (durations.nonEmpty) durations(durations.length / 2) else 0L)
    }

  def snapshot: Seq[StageStat] = synchronized(stats.toSeq)

  /** Metrics table: (stageId, name, tasks, rows, wallMs, rowsPerSec,
    * maxTaskMs, medianTaskMs, skewRatio).
    */
  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    snapshot.toDF()
      .withColumn("rowsPerSec",
        when(col("wallMs") > 0, col("rows") / (col("wallMs") / 1000.0)))
      .withColumn("skewRatio",
        when(col("medianTaskMs") > 0,
          col("maxTaskMs") / col("medianTaskMs").cast("double")))
  }
}

object ThroughputListener {
  /** Attach a fresh listener to the session's SparkContext. */
  def attach(spark: SparkSession): ThroughputListener = {
    val l = new ThroughputListener
    spark.sparkContext.addSparkListener(l)
    l
  }
}
