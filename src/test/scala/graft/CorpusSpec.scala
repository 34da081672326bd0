package graft

import graft.ops.{DedupOps, TextOps}
import graft.pipeline.CorpusPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end composed pipeline (round-5 ask 1): extract -> convDocs ->
  * exact dedup -> near-dup candidates -> verify -> clusters -> survivors
  * -> quality/lang gate, as ONE composition — cross-family invariants
  * and the no-re-extraction plan audit.
  */
class CorpusSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private val minJ = 0.45
  private val minQ = 0.8
  private lazy val turns = SparkEntry.transcripts(spark, 128, 32)
  private lazy val docs = CorpusPipeline.corpusDocs(turns)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  private lazy val out = CorpusPipeline.corpus(docs, minJ, minQ, Seq("en"))

  test("composed corpus == step-by-step composition, and the tail is non-vacuous") {
    val exact = CorpusPipeline.exactSurvivors(docs)
    val pairs = DedupOps.minhashNearDups(exact, minJ)
      .select(col("id_a"), col("id_b"))
    assert(pairs.count() > 0, "fixture has no near-dup pairs — tail vacuous")
    val manual = TextOps.qualityFilter(
      DedupOps.dedupSurvivors(exact, DedupOps.clusterLabels(pairs)),
      minQ, Seq("en"))
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.select("doc_id", "text", "quality", "lang_pred").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getString(3))).toSet
    assert(key(out) == key(manual))
    assert(out.count() > 0)
  }

  test("cross-family invariants hold on the composed output") {
    val rows = out.collect()
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    // 1. exact dedup held: no two output docs share a text
    val texts = rows.map(_.getAs[String]("text"))
    assert(texts.length == texts.distinct.length)
    // 2. near-dup resolution held: no VERIFIED pair survives whole
    val survivedPairs = DedupOps.minhashNearDups(
        CorpusPipeline.exactSurvivors(docs), minJ)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => ids.contains(a) && ids.contains(b) }
    assert(survivedPairs.isEmpty,
      s"near-dup pairs fully present in output: ${survivedPairs.take(5).toSeq}")
    // 3. gate held: every kept row passes both thresholds
    rows.foreach { r =>
      assert(r.getAs[Double]("quality") >= minQ)
      assert(r.getAs[String]("lang_pred") == "en")
    }
    // 4. accounting: kept + gate-rejected + dedup losses == corpus size
    val exact = CorpusPipeline.exactSurvivors(docs)
    val nExact = exact.count()
    val nDocs = docs.count()
    val clusters = DedupOps.clusterLabels(
      DedupOps.minhashNearDups(exact, minJ).select(col("id_a"), col("id_b")))
    val nNearLoss = clusters.filter(col("doc_id") =!= col("cluster_id")).count()
    val nRejected = TextOps.qualityRejected(
      DedupOps.dedupSurvivors(exact, clusters), minQ, Seq("en")).count()
    assert(nDocs == nExact + (nDocs - nExact)) // exact losses
    assert(rows.length + nRejected + nNearLoss == nExact,
      s"${rows.length} kept + $nRejected rejected + $nNearLoss near-dup " +
        s"losses != $nExact exact survivors")
  }

  test("plan audit: the tail never re-extracts — extraction ran once into the hub") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    out.collect()
    // walk the EXECUTED tail, stopping at cache boundaries: everything
    // below an InMemoryTableScan ran exactly once into the hub (plan
    // STRINGS re-render the cached build under every consumer, which is
    // why this walks the tree instead of grepping the string)
    var cacheScans = 0
    def tailExprs(p: SparkPlan): Seq[String] = p match {
      case _: InMemoryTableScanExec => cacheScans += 1; Nil
      case a: AdaptiveSparkPlanExec => tailExprs(a.executedPlan)
      case q: QueryStageExec => tailExprs(q.plan)
      case other => other.expressions.map(_.toString) ++
        other.children.flatMap(tailExprs)
    }
    val exprs = tailExprs(out.queryExecution.executedPlan)
    val reExtract = exprs.filter(_.contains("extract_turn"))
    assert(reExtract.isEmpty,
      s"a tail stage re-runs extraction: ${reExtract.take(3)}")
    assert(cacheScans > 0, "tail must read the materialized docs hub")
  }

  test("composed corpus swallows INJECTED exact and near duplicates across corpus shapes") {
    import org.apache.spark.sql.functions.{concat, lit => flit}
    // three corpus shapes, each salted with deterministic duplicate
    // injections: an exact copy (+100000 id) and a near copy with a
    // short appended tail (+200000 id, jaccard ~0.95 on these doc
    // lengths) of every `stride`-th doc. The copies carry HIGHER ids
    // than their sources, so the min-id survivor contract demands that
    // NO injected id ever survives the composed pipeline.
    for ((nConvs, cap, stride) <- Seq((48, 12, 3), (64, 16, 5))) {
      val baseDocs = CorpusPipeline.corpusDocs(
        SparkEntry.transcripts(spark, nConvs, cap))
      val seedRows = baseDocs.filter(pmod(col("doc_id"), lit(stride)) === 0)
      val exactCopies = seedRows
        .withColumn("doc_id", col("doc_id") + 100000)
        .withColumn("conv_id", concat(flit("dupx-"), col("conv_id")))
      val nearCopies = seedRows
        .withColumn("doc_id", col("doc_id") + 200000)
        .withColumn("conv_id", concat(flit("dupn-"), col("conv_id")))
        .withColumn("text", concat(col("text"), flit(" tail marker")))
      val salted = baseDocs.unionByName(exactCopies).unionByName(nearCopies)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val kept = CorpusPipeline.corpus(salted, minJaccard = 0.5,
          minQuality = 0.0, langs = Seq("en", "und", "fr", "de", "es"))
        .collect()
      val keptIds = kept.map(_.getAs[Long]("doc_id")).toSet
      val injected = keptIds.filter(_ >= 100000)
      assert(injected.isEmpty,
        s"($nConvs,$cap,$stride): injected duplicates survived: " +
          s"${injected.take(5)}")
      assert(kept.nonEmpty)
      // and the output is still exact-dup-free
      val texts = kept.map(_.getAs[String]("text"))
      assert(texts.length == texts.distinct.length)
      salted.unpersist(blocking = false)
    }
  }

  test("incremental composed route == batch composed route (the daily job)") {
    // day 0 is indexed; day 1 rides incrementalMinhashCandidates; the
    // unioned pair set must resolve to the SAME final corpus the pure
    // batch composition produces — the x_corpus_incr contract, proven
    // in-JVM (the driver gate hashes both against the same oracle)
    val exact = CorpusPipeline.exactSurvivors(docs)
    val day0 = exact.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val day1 = exact.filter(pmod(col("doc_id"), lit(4)) === 0)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_corpus_incr").toString + "/index"
    val (idxBands, idxSigs) = graft.ops.DedupOps.ensureMinhashIndex(
      spark, day0, idxPath)
    val cands = graft.ops.DedupOps.minhashCandidates(day0, minJ)
      .unionByName(graft.ops.DedupOps.incrementalMinhashCandidates(
        day1, idxBands, idxSigs, minJ))
      .distinct()
    val pairs = graft.ops.DedupOps.verifyJaccard(cands, exact, minJ)
      .select(col("id_a"), col("id_b"))
    val viaIncr = TextOps.qualityFilter(
        graft.ops.DedupOps.dedupSurvivors(exact,
          graft.ops.DedupOps.clusterLabels(pairs)), minQ, Seq("en"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val viaBatch = out.collect().map(_.getAs[Long]("doc_id")).toSet
    assert(viaIncr == viaBatch && viaIncr.nonEmpty)
  }

  test("runCorpus: same result as corpus(), all internal caches released after") {
    spark.sharedState.cacheManager.clearCache()
    val freshDocs = CorpusPipeline.corpusDocs(
        SparkEntry.transcripts(spark, 48, 12))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val viaRun = CorpusPipeline.runCorpus(freshDocs, minJ, minQ, Seq("en")) {
      df => df.collect().map(_.getAs[Long]("doc_id")).toSet
    }
    // only the CALLER's docs cache may remain — both internal caches
    // (exact hub, sig pass) must be gone
    val cached = spark.sharedState.cacheManager
    freshDocs.unpersist(blocking = true)
    assert(cached.isEmpty,
      "runCorpus must release its internal caches")
    val viaLazy = CorpusPipeline.corpus(
        freshDocs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
        minJ, minQ, Seq("en"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(viaRun == viaLazy && viaRun.nonEmpty)
  }

  test("runMinhashNearDups: pairs == lazy op, sig cache released after") {
    import spark.implicits._
    spark.sharedState.cacheManager.clearCache()
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val viaRun = graft.ops.DedupOps.runMinhashNearDups(d, minJaccard = 0.6) {
      pairs => pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(spark.sharedState.cacheManager.isEmpty,
      "runMinhashNearDups must release the sig cache")
    val viaLazy = graft.ops.DedupOps.minhashNearDups(d, minJaccard = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaRun == viaLazy && viaRun.nonEmpty)
    spark.sharedState.cacheManager.clearCache()
  }

  test("doc_id derivation matches the conv id suffix and is unique") {
    val m = docs.select(col("doc_id"), col("conv_id")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(m.map(_._1).distinct.length == m.length)
    m.foreach { case (id, conv) =>
      assert(conv == f"conv-$id%06d")
    }
  }
}
