package graft

import graft.expr.Functions._
import graft.ops.DedupOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 item: the LSH candidate generators must evaluate their per-row
  * hashing ONCE per row. The old shape fed the banded frame to the
  * bucket-size aggregate AND both self-join sides — at corpus scale the
  * expensive hashing (minhash sig / simhash / hyperplane dots) ran 2-4x.
  * The new shape uses a count-window valve over the single banding
  * exchange, whose two self-join consumers share it via ReuseExchange.
  *
  * Evidence here: (a) the candidate SETS are bit-identical to the old
  * recipe (inlined below), (b) the final plan reads the corpus ONCE and
  * carries a ReusedExchange. The wall-clock win is quantified by
  * graft.BandProbe (BENCH.md).
  */
class BandingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private def embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  // --- the OLD recipes, inlined verbatim (groupBy-count + join-back
  //     valve; bands straight off the text) — the equality oracles ------

  private def oldValve(banded: DataFrame, keys: Seq[String],
      maxBucket: Int): DataFrame = {
    val sizes = banded.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") > 1 && col("bsize") <= maxBucket)
    banded.join(sizes, keys)
  }

  private def oldMinhashCandidates(d: DataFrame, maxBucket: Int): DataFrame = {
    val eligible = d.filter(length(col("text")) >= graft.kernel.TextHash.ShingleK)
    val banded = eligible.select(col("doc_id"),
      posexplode(minhash_bands(col("text"))).as(Seq("band_idx", "band_key")))
    val pruned = oldValve(banded, Seq("band_idx", "band_key"), maxBucket)
    pruned.as("a").join(pruned.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
  }

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash: new candidate set == old recipe (incl. sig-derived bands)") {
    // replicate the OLD full op: text-derived bands + separate sig pass
    // + the same signature screen, then assert bit-identical output
    val minJaccard = 0.6
    val sigs = docs.filter(length(col("text")) >= 5)
      .select(col("doc_id"), minhash_sig(col("text")).as("sig"))
    val oldScreened = oldMinhashCandidates(docs, maxBucket = 10000)
      .join(sigs.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("sig", "sig_a"), Seq("id_a"))
      .join(sigs.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("sig", "sig_b"), Seq("id_b"))
      .withColumn("est",
        aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => (x === y).cast("int")),
          lit(0), (acc, v) => acc + v) /
          lit(graft.kernel.TextHash.NumHashes.toDouble))
      .filter(col("est") >= minJaccard - 0.15)
    val newPairs = pairs(DedupOps.minhashCandidates(docs, minJaccard))
    assert(newPairs == pairs(oldScreened))
    assert(newPairs.nonEmpty)
    // and bands-from-sig == bands-from-text, row by row
    val drift = docs.filter(length(col("text")) >= 5)
      .select(minhash_bands(col("text")).as("bt"),
        minhash_bands_of_sig(minhash_sig(col("text"))).as("bs"))
      .filter(col("bt") =!= col("bs")).count()
    assert(drift == 0, s"$drift rows band differently via the sig route")
  }

  test("simhash: new candidate set == old recipe at radius 4 and pair-bands 6") {
    def oldSimhash(maxHamming: Int, pairBands: Boolean): DataFrame = {
      val chunked = DedupOps.simhashBands(docs, maxHamming, pairBands)
      val pruned = oldValve(chunked, Seq("chunk_idx", "chunk_key"), 10000)
      pruned.as("a").join(pruned.as("b"),
          col("a.chunk_idx") === col("b.chunk_idx") &&
            col("a.chunk_key") === col("b.chunk_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
    }
    assert(pairs(DedupOps.simhashCandidates(docs, maxHamming = 4)) ==
      pairs(oldSimhash(4, pairBands = false)))
    assert(pairs(DedupOps.simhashCandidates(docs, maxHamming = 6,
        pairBands = true)) ==
      pairs(oldSimhash(6, pairBands = true)))
  }

  test("embedding: new candidate set == old recipe") {
    val signs = DedupOps.hyperplaneSigns(8, 4,
      embs.select(size(col("embedding"))).head().getInt(0))
    def key(t: Int) = DedupOps.hyperplaneTableKey(signs, t, 4, col("embedding"))
    val bucketed = embs.filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        posexplode(array((0 until 8).map(key): _*)).as(Seq("table_idx", "bucket")))
    val pruned = oldValve(bucketed, Seq("table_idx", "bucket"), 10000)
    val old = pruned.as("a").join(pruned.as("b"),
        col("a.table_idx") === col("b.table_idx") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
      .distinct()
    assert(pairs(DedupOps.embeddingCandidates(embs, nPlanes = 4, nTables = 8))
      == pairs(old))
  }

  // --- plan shape: hashing once per row ---------------------------------

  private def finalTree(df: DataFrame): String = {
    df.collect() // resolve the AQE plan
    df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .split("== Initial Plan ==").head
  }

  // plain Exchange nodes only (not ReusedExchange/BroadcastExchange)
  private def exchanges(tree: String): Int =
    "(?<![A-Za-z])Exchange \\(\\d+\\)".r.findAllIn(tree).length

  test("simhash candidates: corpus scanned ONCE, self-join reuses the banding exchange") {
    val tree = finalTree(DedupOps.simhashCandidates(docs, maxHamming = 4))
    assert("Scan parquet".r.findAllIn(tree).length == 1,
      s"corpus must be read once (hashing once per row):\n$tree")
    assert(tree.contains("ReusedExchange"),
      s"self-join sides must share the banding exchange:\n$tree")
    assert(exchanges(tree) == 2, // banding + the distinct agg
      s"expected exactly 2 plain exchanges (banding, distinct):\n$tree")
  }

  test("embedding candidates: corpus scanned ONCE, exchange reused") {
    val tree = finalTree(DedupOps.embeddingCandidates(embs,
      nPlanes = 4, nTables = 8))
    assert("Scan parquet".r.findAllIn(tree).length == 1,
      s"hyperplane dots must fold once per row:\n$tree")
    assert(tree.contains("ReusedExchange"), s"exchange not reused:\n$tree")
    assert(exchanges(tree) == 2, s"expected banding + distinct only:\n$tree")
  }

  test("minhash candidates: the sig pass runs EXACTLY once per eligible row (counted)") {
    // counted fact, not plan-string inference: the kernel bridge counts
    // every signature evaluation (text-shingle pass). Banding, both
    // self-join sides, and both screen joins must all be fed by the ONE
    // cached pass. Cache cleared first — a prior test's cache would
    // hide recomputes by showing zero instead.
    spark.sharedState.cacheManager.clearCache()
    val eligible = docs.filter(length(col("text")) >= 5).count()
    graft.expr.TextExprKernels.sigEvals.reset()
    DedupOps.minhashCandidates(docs, minJaccard = 0.6).collect()
    val evals = graft.expr.TextExprKernels.sigEvals.sum()
    assert(evals == eligible,
      s"sig pass ran $evals times for $eligible eligible rows " +
        "(old shape: 3-4x)")
    // and the plan reads the signatures from the cache
    val cands = DedupOps.minhashCandidates(docs, minJaccard = 0.6)
    assert(finalTree(cands).contains("InMemoryTableScan"),
      "sig cache missing from the plan")
  }

  test("simhash candidates: simhash64 runs EXACTLY once per non-blank row (counted)") {
    spark.sharedState.cacheManager.clearCache()
    val nonBlank = docs.filter(length(trim(col("text"))) > 0).count()
    graft.expr.TextExprKernels.simhashEvals.reset()
    DedupOps.simhashCandidates(docs, maxHamming = 4).collect()
    val evals = graft.expr.TextExprKernels.simhashEvals.sum()
    assert(evals == nonBlank,
      s"simhash ran $evals times for $nonBlank rows (old shape: 2-3x)")
  }
}
