package graft

import graft.expr.Functions
import org.apache.spark.sql.functions._

/** Stage-by-stage perf probe: where does extraction wall time go at a
  * given parallelism? scan-only vs map-only extraction vs full pipeline
  * (window included), at two thread counts.
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "120000").toInt
    val cap = sys.env.getOrElse("SPARK_GRAFT_BENCH_CAP", "512").toInt
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "8,32")
      .split(",").map(_.trim.toInt)

    levels.foreach { cpus =>
      val spark = Bench.makeSpark(cpus.toString)
      val (path, nTurns) = Bench.benchInput(spark, nConvs, cap)
      def timed(tag: String)(f: => Unit): Unit = {
        f // warmup
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        val best = times.min
        println(f"[probe] cpus=$cpus%2d $tag%-12s best=$best%7.3fs tps=${nTurns / best}%,.0f")
      }
      val raw = spark.read.parquet(path)
      timed("scan") {
        raw.select(sum(length(col("text")))).collect()
      }
      timed("map-extract") {
        raw.select(sum(length(Functions.extract_turn(col("text"))
          .getField("text")))).collect()
      }
      timed("full") {
        Bench.forceAll(graft.pipeline.ExtractPipeline.extract(raw))
      }
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
