package graft

/** Round-6 optimization harness (guide §1): isolate individual declared
  * queries — time each with the noop sink (same action Bench uses) over
  * several repeats, and dump `.explain("formatted")` for plan-shape
  * evidence. The driver-facing Bench is FROZEN; this main exists so
  * per-query iteration does not need the full extraction windows.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.BenchExtra [plans=<dir>] [reps=N] [q1 q2 ...]"
  * With no query args, runs all declared queries. With plans=<dir>, also
  * writes <dir>/<query>.txt containing the formatted plan.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val plansDir = args.collectFirst {
      case a if a.startsWith("plans=") => a.stripPrefix("plans=")
    }
    val reps = args.collectFirst {
      case a if a.startsWith("reps=") => a.stripPrefix("reps=").toInt
    }.getOrElse(3)
    val names = args.filterNot(a =>
      a.startsWith("plans=") || a.startsWith("reps="))
    val spark = Bench.makeSpark(cpus)
    val qs =
      if (names.isEmpty) SparkEntry.queries.toSeq.sortBy(_._1)
      else names.toSeq.map(n => n -> SparkEntry.queries(n))
    plansDir.foreach(d => new java.io.File(d).mkdirs())
    val out = qs.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(s"bench-extra: $name")
      plansDir.foreach { d =>
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new java.io.PrintWriter(s"$d/$name.txt")
        try w.write(plan) finally w.close()
      }
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Bench.forceAll(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[bx] $name%-18s min=${times.min}%7.3f  all=" +
        times.map(t => f"$t%.3f").mkString(","))
      name -> times.min
    }
    spark.sparkContext.setJobDescription(null)
    println("[bx-summary] total_min=" + f"${out.map(_._2).sum}%.3f")
    spark.stop()
  }
}
