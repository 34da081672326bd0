package graft

import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.functions._

/** Interleaved A/B: extract() vs extractEqualized() on a uniform layout
  * AND two clustered layouts of the SAME rows (BENCH.md noise protocol:
  * one window, round-robin, per-config minima, all-cores spin probes
  * bracketing every pass).
  *
  * The claim under test (round-3 ask #5): the equalizer costs ~nothing
  * on a uniform layout (its conv_id exchange REPLACES the window's, one
  * shuffle either way — plan-asserted in ScaleSpec) and wins on layouts
  * where whole input splits are stragglers. Two clustered fixtures
  * because they stress DIFFERENT skew mechanisms:
  *  - lenclustered (rows range-sorted by payload length): parquet
  *    splits are byte-balanced, and per-turn kernel cost is ~linear in
  *    bytes, so this layout is NOT expected to straggle — it measures
  *    that the equalizer's cost stays bounded when it has nothing to fix;
  *  - kindclustered (rows range-sorted by payload prefix ≈ per-source
  *    files): per-BYTE kernel cost varies ~3x across payload kinds
  *    (KernelProbe: pdf 46 MB/s vs plain 140 MB/s), so byte-balanced
  *    splits are work-IMBALANCED — the straggler case the equalizer
  *    exists for.
  */
object EqualizeProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "600000").toInt
    val cap = sys.env.getOrElse("SPARK_GRAFT_BENCH_CAP", "512").toInt
    val rounds = sys.env.getOrElse("SPARK_GRAFT_EQ_ROUNDS", "3").toInt
    val spark = Bench.makeSpark(cpus)
    val (uniform, nTurns) = Bench.benchInput(spark, nConvs, cap)

    def materialize(suffix: String)(layout: org.apache.spark.sql.DataFrame
        => org.apache.spark.sql.DataFrame): String = {
      val path = s"${uniform}_$suffix"
      if (!graft.io.FsUtil.successExists(path))
        layout(spark.read.parquet(uniform))
          .write.mode("overwrite").parquet(path)
      path
    }
    val lenClustered = materialize("lenclustered")(
      _.repartitionByRange(256, length(col("text"))))
    val kindClustered = materialize("kindclustered")(
      _.repartitionByRange(256, substring(col("text"), 1, 8)))

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
      ("lencluster_extract", lenClustered, false),
      ("lencluster_equalized", lenClustered, true),
      ("kindcluster_extract", kindClustered, false),
      ("kindcluster_equalized", kindClustered, true))
    configs.foreach { case (_, p, eq) => time(p, eq) } // warm every config
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
      s"""{"metric":"equalize_ab","unit":"sec","n_turns":$nTurns,"min_sec":$minJson,"uniform_ratio":${f"${mins(1) / mins(0)}%.3f"},"lencluster_ratio":${f"${mins(3) / mins(2)}%.3f"},"kindcluster_ratio":${f"${mins(5) / mins(4)}%.3f"},"raw_sec":$rawJson,"spin_par_mops":$probeJson,"window_clean":$windowClean,"cpus":$cpus}""")
    spark.stop()
  }
}
