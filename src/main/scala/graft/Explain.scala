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

    println("==== ann_ivf: partition-pruned index probe ====")
    // the probe must read only the probed centroid_id partitions of the
    // index — look for PartitionFilters/PartitionCount << total cells
    SparkEntry.queries("ann_ivf")(spark, "/root/testdata/sf0.001")
      .explain("formatted")

    println("==== distributed rank (no per-conversation window task) ====")
    ExtractPipeline.extractDistributedRank(spark.read.parquet(path), nPart = 8)
      .explain("formatted")

    println("==== width-bucket equalizer (hash exchange + in-partition sort) ====")
    graft.ops.Rebalance.equalizeByLength(
      spark.read.parquet(path),
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")),
      Seq(org.apache.spark.sql.functions.col("conv_id"),
        org.apache.spark.sql.functions.col("turn_idx")),
      nPart = 8).explain("formatted")

    println("==== equalized extraction (ONE exchange: the equalizer's) ====")
    // the conv_id hash exchange up front must satisfy the window's
    // required distribution — no second Exchange below the Window
    ExtractPipeline.extractEqualized(spark.read.parquet(path), nPart = 8)
      .explain("formatted")

    println("==== long-rank mode (rn: bigint, distributed) ====")
    ExtractPipeline.extractDistributedRankLong(
      spark.read.parquet(path), nPart = 8).explain("formatted")

    println("==== simhash candidates (ONE banding exchange + ReusedExchange) ====")
    // round-5 shape: count-window valve over the single exchange; the
    // self-join's second side must be a ReusedExchange — the per-row
    // hashing runs once (BandingSpec counts it)
    graft.ops.DedupOps.simhashCandidates(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      maxHamming = 4).explain("formatted")

    println("==== composed corpus tail (docs hub persisted; no re-extraction) ====")
    // the tail over a materialized hub: InMemoryTableScans feed exact
    // dedup / near-dup / gate; extract_turn must appear ONLY inside the
    // cached relation's build (CorpusSpec walks the tree to assert it)
    val corpusDocs = graft.pipeline.CorpusPipeline.corpusDocs(
        spark.read.parquet(path).limit(20000))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.pipeline.CorpusPipeline.corpus(corpusDocs).explain("formatted")

    println("==== codegen check: extract_turn inside WholeStageCodegen ====")
    val df = ExtractPipeline.extract(spark.read.parquet(path))
    df.collect() // force execution so the final (AQE-resolved) plan exists
    val executed = df.queryExecution.executedPlan.toString
    val wscSpans = executed.linesIterator
      .filter(l => l.contains("WholeStageCodegen") || l.contains("extract_turn"))
      .take(10).mkString("\n")
    println(wscSpans)

    spark.stop()
  }
}
