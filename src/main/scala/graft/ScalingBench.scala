package graft

/** N-vs-4N scaling evidence (north rule: efficiency >= 0.8 between two
  * cluster sizes). No real cluster exists in this sandbox, so the same
  * job runs on the same input at local[N] and local[4N] (default 8 and
  * 32 threads); turns/sec at both plus efficiency (tps4N/tpsN)/4 are
  * printed as one JSON line and recorded in BENCH.md / BASELINE.md.
  */
object ScalingBench {

  def main(args: Array[String]): Unit = {
    val nSmall = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "8").toInt
    val factor = 4
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "60000").toInt
    val cap = sys.env.getOrElse("SPARK_GRAFT_BENCH_CAP", "512").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_SCALE_PASSES", "3").toInt

    def tpsAt(cpus: Int): (Long, Double, Double) = {
      val spark = Bench.makeSpark(cpus.toString)
      val (path, nTurns) = Bench.benchInput(spark, nConvs, cap)
      // warmup (JIT + codegen + page cache)
      Bench.timeExtraction(spark, path, nTurns)
      // best-of-N measured passes (median would need an odd run count;
      // min is the standard noise floor for throughput)
      val runs = (1 to passes).map(_ => Bench.timeExtraction(spark, path, nTurns))
      val (sec, tps) = runs.minBy(_._1)
      spark.stop()
      // allow a fresh master for the next session in this JVM
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      (nTurns, sec, tps)
    }

    val (nTurns, secN, tpsN) = tpsAt(nSmall)
    val (_, sec4N, tps4N) = tpsAt(nSmall * factor)
    val eff = (tps4N / tpsN) / factor
    println(
      f"""{"metric":"scaling_efficiency","value":$eff%.3f,"unit":"ratio","n_turns":$nTurns%d,"cpus_small":$nSmall%d,"cpus_large":${nSmall * factor}%d,"sec_small":$secN%.3f,"sec_large":$sec4N%.3f,"tps_small":$tpsN%.0f,"tps_large":$tps4N%.0f}""")
  }
}
