package graft

import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.functions._

/** Interleaved A/B: extract() vs extractEqualized() on a uniform layout
  * AND a length-clustered layout of the SAME rows (BENCH.md noise
  * protocol: one window, round-robin, per-config minima, all-cores spin
  * probes bracketing every pass).
  *
  * The claim under test (round-3 ask #5): the equalizer costs ~nothing
  * on a uniform layout (its conv_id exchange REPLACES the window's, one
  * shuffle either way — plan-asserted in ScaleSpec) and wins on a
  * clustered layout where whole input splits are stragglers.
  */
object EqualizeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "600000").toInt
    val cap = sys.env.getOrElse("SPARK_GRAFT_BENCH_CAP", "512").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_EQ_ROUNDS", "3").toInt
    val spark = Bench.makeSpark(cpus)
    val (uniform, nTurns) = Bench.benchInput(spark, nConvs, cap)

    // the same rows, range-clustered by payload length into 256 files —
    // the sorted-dump / per-source layout the equalizer exists for
    val clustered = s"${uniform}_lenclustered"
    if (!graft.io.FsUtil.successExists(clustered))
      spark.read.parquet(uniform)
        .repartitionByRange(256, length(col("text")))
        .write.mode("overwrite").parquet(clustered)

    def time(path: String, equalized: Boolean): Double = {
      val in = spark.read.parquet(path)
      val df = if (equalized) ExtractPipeline.extractEqualized(in)
        else ExtractPipeline.extract(in)
      val t0 = System.nanoTime()
      Bench.forceAll(df)
      (System.nanoTime() - t0) / 1e9
    }

    val configs = Seq(
      ("uniform_extract", uniform, false),
      ("uniform_equalized", uniform, true),
      ("clustered_extract", clustered, false),
      ("clustered_equalized", clustered, true))
    configs.foreach { case (_, p, eq) => time(p, eq) } // warm all four
    Bench.spinProbeMops(1000000L)
    val nThreads = cpus.toInt
    val probes = scala.collection.mutable.ArrayBuffer(
      Bench.parallelSpinMops(nThreads))
    val raw: Seq[Seq[Double]] = (1 to rounds).map { _ =>
      configs.map { case (_, p, eq) =>
        val s = time(p, eq)
        probes += Bench.parallelSpinMops(nThreads)
        s
      }
    }
    val mins = configs.indices.map(i => raw.map(_(i)).min)
    val minJson = configs.zipWithIndex
      .map { case ((name, _, _), i) => "\"" + name + "\":" + f"${mins(i)}%.3f" }
      .mkString("{", ",", "}")
    val rawJson = raw.zipWithIndex.map { case (r, i) =>
      "\"round" + i + "\":" + r.map(s => f"$s%.2f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val probeJson = probes.map(p => f"$p%.0f").mkString("[", ",", "]")
    val windowClean = probes.min / probes.max >= 0.7
    println(
      s"""{"metric":"equalize_ab","unit":"sec","n_turns":$nTurns,"min_sec":$minJson,"uniform_ratio":${f"${mins(1) / mins(0)}%.3f"},"clustered_ratio":${f"${mins(3) / mins(2)}%.3f"},"raw_sec":$rawJson,"spin_par_mops":$probeJson,"window_clean":$windowClean,"cpus":$cpus}""")
    spark.stop()
  }
}
