package graft

import graft.pipeline.ExtractPipeline

/** Prints formatted physical plans of the flagship pipeline — the
  * plan-shape audit (one exchange, whole-stage codegen around the
  * extraction projection, pushed filters/pruned scans).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Bench.makeSpark(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val (path, _) = Bench.benchInput(spark, 1000, 64)

    println("==== flagship extraction ====")
    ExtractPipeline.extract(spark.read.parquet(path)).explain("formatted")

    println("==== conv docs (salted two-phase agg) ====")
    ExtractPipeline.convDocs(
      ExtractPipeline.extract(spark.read.parquet(path))).explain("formatted")

    println("==== column pruning proof: kind-only projection ====")
    ExtractPipeline.extract(spark.read.parquet(path))
      .select("conv_id", "kind").explain("formatted")

    println("==== dd_minhash ====")
    SparkEntry.queries("dd_minhash")(spark, "/root/testdata/sf0.001")
      .explain("formatted")

    spark.stop()
  }
}
