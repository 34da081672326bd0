package graft

import org.apache.spark.sql.functions._

/** Round-6 phase probe for the composed-corpus driver queries: times
  * each stage of the x_corpus tail in isolation (dump read + exact
  * survivors, candidate verify, the eager clusterLabels loop, the final
  * gate) so optimization targets the stage that actually costs, not the
  * query total. Also counts the Spark jobs the cluster loop fires.
  */
object CorpusProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.makeSpark(cpus)
    val reps = 3

    def timed(tag: String)(f: => Unit): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[cp] $tag%-28s min=${times.min}%6.3f all=" +
        times.map(t => f"$t%.3f").mkString(","))
    }
    var jobs = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs += 1
      })

    // warm dumps exactly as the bench sees them
    val docsDf = spark.read.parquet(Dumps.ensure(Dumps.corpusDocs(sfDir))(
      graft.pipeline.CorpusPipeline.corpusDocs(
        SparkEntry.transcripts(spark, 256, 64))))
    def exact = graft.pipeline.CorpusPipeline.exactSurvivors(docsDf)
    val candsPath = Dumps.ensure(Dumps.corpusCands(sfDir))(
      graft.ops.DedupOps.minhashCandidates(exact, minJaccard = 0.5))
    def cands = spark.read.parquet(candsPath)
    def pairs = graft.ops.DedupOps.verifyJaccard(cands, exact,
      minJaccard = 0.5).select(col("id_a"), col("id_b"))

    timed("exactSurvivors")(Bench.forceAll(exact))
    timed("verifyJaccard")(Bench.forceAll(pairs))
    timed("clusterLabels") {
      val j0 = jobs
      Bench.forceAll(graft.ops.DedupOps.clusterLabels(pairs))
      println(s"[cp]   clusterLabels jobs=${jobs - j0}")
    }
    timed("full x_corpus") {
      val j0 = jobs
      Bench.forceAll(SparkEntry.queries("x_corpus")(spark, sfDir))
      println(s"[cp]   x_corpus jobs=${jobs - j0}")
    }
    timed("full x_corpus_incr") {
      val j0 = jobs
      Bench.forceAll(SparkEntry.queries("x_corpus_incr")(spark, sfDir))
      println(s"[cp]   x_corpus_incr jobs=${jobs - j0}")
    }
    spark.stop()
  }
}
