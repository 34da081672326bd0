package graft

/** N-vs-4N scaling evidence (north rule: efficiency >= 0.8 between two
  * cluster sizes). No real cluster exists in this sandbox, so the same
  * job runs on the same input at several local[N] levels.
  *
  * Measurement protocol: the sandbox is a shared VM whose available CPU
  * drifts on a minutes scale (raw-CPU control: 8 vs 32 parallel sha256
  * workers deliver anywhere between 2.9x and 4x depending on the
  * minute). So all levels are measured INTERLEAVED round-robin within
  * one time window, and each level's floor (min) over the rounds is the
  * reported number — paired sampling against a drifting baseline.
  * Per-round raw values are included in the JSON for transparency.
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "4,8,16,32")
      .split(",").map(_.trim.toInt).toSeq
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "600000").toInt
    val cap = sys.env.getOrElse("SPARK_GRAFT_BENCH_CAP", "512").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_SCALE_PASSES", "3").toInt

    val warmed = scala.collection.mutable.Set.empty[Int]
    var nTurns = 0L
    // every measured pass is bracketed by an all-cores spin probe (the
    // same host-steal control Bench embeds): a loaded window is
    // machine-readable from the JSON instead of argued from tps shape
    val probeThreads = levels.max
    def passAt(cpus: Int): (Double, Double, Double) = {
      val spark = Bench.makeSpark(cpus.toString)
      val (path, n) = Bench.benchInput(spark, nConvs, cap)
      nTurns = n
      if (!warmed.contains(cpus)) {
        Bench.spinProbeMops(1000000L) // JIT the probe loop
        Bench.timeExtraction(spark, path, n) // JIT/codegen/page-cache warmup
        warmed += cpus
      }
      // EVERY pass runs in a FRESH SparkSession, so codegen compilation
      // and session init would otherwise land inside the MEASURED pass
      // on every round after a level's first (observed round-5 window B:
      // level-16 floors climbing 496k -> 560k -> 784k across rounds —
      // the floor never converged inside a 3-round window). A short
      // slice warms the new session's generated code before the clock
      // starts; the first-visit FULL warm pass above still covers
      // page-cache and JVM-wide JIT.
      Bench.forceAll(graft.pipeline.ExtractPipeline.extract(
        spark.read.parquet(path).limit(20000)))
      val probe = Bench.parallelSpinMops(probeThreads)
      val r = Bench.timeExtraction(spark, path, n)
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      (r._1, r._2, probe)
    }

    val rounds: Seq[Seq[(Int, Double, Double, Double)]] = (1 to passes).map { _ =>
      levels.map { l => val (sec, tps, probe) = passAt(l); (l, sec, tps, probe) }
    }
    // trailing probe: the per-pass probes run BEFORE each pass, so steal
    // starting during the final pass would otherwise be invisible and a
    // stolen window could read as clean — bracket the last pass too
    val finalProbe = Bench.parallelSpinMops(probeThreads)
    val floor: Map[Int, (Double, Double)] = levels.map { l =>
      l -> rounds.flatten.filter(_._1 == l).map(t => (t._2, t._3)).minBy(_._1)
    }.toMap

    val tpsJson = levels.map(l => "\"" + l + "\":" + f"${floor(l)._2}%.0f")
      .mkString("{", ",", "}")
    val secJson = levels.map(l => "\"" + l + "\":" + f"${floor(l)._1}%.3f")
      .mkString("{", ",", "}")
    val raw = rounds.zipWithIndex.map { case (r, i) =>
      "\"round" + i + "\":" + r.map(t => f"${t._3}%.0f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val probesJson = rounds.zipWithIndex.map { case (r, i) =>
      "\"round" + i + "\":" + r.map(t => f"${t._4}%.0f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val allProbes = rounds.flatten.map(_._4) :+ finalProbe
    val windowClean = allProbes.min / allProbes.max >= 0.7
    val pairs = levels.filter(l => levels.contains(l * 4)).map { n =>
      val eff = (floor(n * 4)._2 / floor(n)._2) / 4
      "\"" + n + "->" + (n * 4) + "\":" + f"$eff%.3f"
    }.mkString("{", ",", "}")
    println(
      s"""{"metric":"scaling_efficiency","unit":"ratio","n_turns":$nTurns,"levels":[${levels.mkString(",")}],"tps":$tpsJson,"sec":$secJson,"efficiency":$pairs,"raw_tps":$raw,"spin_par_mops":$probesJson,"final_probe_mops":${f"$finalProbe%.0f"},"window_clean":$windowClean}""")
  }
}
