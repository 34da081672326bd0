package graft

/** Prints the FINAL (post-execution, AQE-resolved) plan of named driver
  * queries — the pre-execution explain shows duplicated subtrees that
  * AQE's runtime stage cache may already dedup; optimization decisions
  * must read the plan that actually ran (guide §7.2).
  */
object FinalPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.makeSpark(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize THIS QueryExecution's adaptive plan
      val plan = df.queryExecution.executedPlan.toString
      val reused = plan.linesIterator.count(_.contains("ReusedQueryStage"))
      val stages = plan.linesIterator.count(_.contains("ShuffleQueryStage"))
      println(s"[fp] $name reusedStages=$reused shuffleStages=$stages")
      println(plan.linesIterator.filter(l =>
        l.contains("QueryStage") || l.contains("Exchange") ||
          l.contains("Scan parquet")).take(40).mkString("\n"))
    }
    spark.stop()
  }
}
