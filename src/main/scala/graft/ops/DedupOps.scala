package graft.ops

import graft.expr.Functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for the large-scale training-data pipeline:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard. All designed as
  * shuffle-on-small-keys plans: the candidate-generation joins move
  * (id, key) pairs — never document text — and the verify step joins the
  * text back only for the tiny candidate set.
  */
object DedupOps {

  /** Exact dedup via content hash: one row per distinct text, keeping the
    * smallest doc_id (deterministic winner). Single hash-shuffle on a
    * 16-byte key; text never shuffles (md5 computed map-side).
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("text_md5"))
      .groupBy(col("text_md5"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("group_size"))

  /** Exact-dup groups only (group_size > 1) — the filterable side output. */
  def exactDupGroups(docs: DataFrame): DataFrame =
    exactDedup(docs).filter(col("group_size") > 1)

  /** MinHash + LSH near-dup candidate pairs, verified by exact n-gram
    * Jaccard:
    *   1. map-side: 64-hash MinHash signature -> 16 band keys (one pass
    *      over the text, custom codegen'd expression),
    *   2. explode band keys, self-join on (band_idx, band_key) — the
    *      LSH bucket join; only (doc_id, band) pairs shuffle,
    *   3. distinct candidate pairs (a < b),
    *   4. verify: join text back (broadcast-sized candidate set at these
    *      thresholds), exact jaccard >= minJaccard.
    *
    * At 100 TB: step 2's shuffle is ~16 longs/doc; the text join in step
    * 4 is a shuffled hash join keyed by doc_id, proportional to the
    * candidate count, not the corpus.
    */
  def minhashNearDups(docs: DataFrame, minJaccard: Double = 0.6,
      maxBucket: Int = 10000): DataFrame = {
    // texts shorter than one shingle all share the empty signature — at
    // corpus scale they would form one quadratic LSH bucket; they cannot
    // be near-dups under shingle jaccard anyway, so gate them out
    val eligible = docs.filter(
      length(col("text")) >= graft.kernel.TextHash.ShingleK)
    val banded = eligible
      .select(col("doc_id"), posexplode(minhash_bands(col("text")))
        .as(Seq("band_idx", "band_key")))
    // skew valve: a band bucket of B docs yields B^2/2 candidate pairs;
    // mega-clusters (B > maxBucket, i.e. near-identical boilerplate
    // repeated millions of times) are exact-dedup's job, not LSH's —
    // drop those buckets instead of letting one key own the stage
    // (the max_candidates cap of the dedup world, db_postprocess.py:92)
    val bucketSizes = banded.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("bsize"))
      .filter(col("bsize") > 1 && col("bsize") <= maxBucket)
    val pruned = banded.join(bucketSizes, Seq("band_idx", "band_key"))
    val candidates = pruned.as("a")
      .join(pruned.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // cheap screen BEFORE the text join: the signature is already
    // computed; its positional-match fraction is an unbiased jaccard
    // estimator. Banding passes many j≈0.2-0.4 pairs on similar-
    // vocabulary corpora; screening them on 64 longs instead of
    // joining full texts cuts the verify stage's shuffle by ~10x.
    // Margin 0.15 below the target keeps estimator variance (sigma
    // ≈ sqrt(j(1-j)/64) ≈ 0.06) from costing recall.
    val sigs = eligible.select(col("doc_id"), minhash_sig(col("text")).as("sig"))
    val screened = candidates
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
      .select(col("id_a"), col("id_b"))
    val txt = eligible.select(col("doc_id"), col("text"))
    screened
      .join(txt.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("text", "text_a"), Seq("id_a"))
      .join(txt.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("text", "text_b"), Seq("id_b"))
      .withColumn("jaccard", ngram_jaccard(col("text_a"), col("text_b")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** SimHash near-dups: 64-bit fingerprint; pigeonhole banding on the 4
    * 16-bit chunks (hamming distance <= 3 implies at least one chunk is
    * equal), verified with bit_count(a XOR b) <= maxHamming.
    */
  def simhashNearDups(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // same bucket-explosion guard as minhash: all-whitespace texts hash
    // to simhash 0 and would form one quadratic chunk bucket at scale
    val hashed = docs.filter(length(trim(col("text"))) > 0)
      .select(col("doc_id"), simhash64(col("text")).as("sh"))
    val chunked = hashed.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map(i =>
        struct(lit(i).as("chunk_idx"),
          shiftrightunsigned(col("sh"), i * 16)
            .bitwiseAND(lit(0xffffL)).as("chunk_key"))): _*)).as("c"))
      .select(col("doc_id"), col("sh"),
        col("c.chunk_idx").as("chunk_idx"), col("c.chunk_key").as("chunk_key"))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk_idx") === col("b.chunk_idx") &&
          col("a.chunk_key") === col("b.chunk_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** All-pairs n-gram Jaccard above a threshold WITHOUT LSH — the exact
    * (quadratic) baseline used to validate the LSH recall in tests; at
    * scale this is only runnable per-bucket, never corpus-wide.
    */
  def ngramJaccardPairsExact(docs: DataFrame, minJaccard: Double): DataFrame = {
    val t = docs.select(col("doc_id"), col("text"))
    t.as("a").join(t.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        ngram_jaccard(col("a.text"), col("b.text")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Embedding-cosine near-dup pairs via random-hyperplane LSH with
    * OR-amplification: nTables independent tables of nPlanes sign bits;
    * a pair is a candidate when ANY table buckets them together
    * (recall 1-(1-p^planes)^tables). Verified by exact cosine >= minCos.
    * Hyperplane components are xxhash64-derived +-1 — deterministic, no
    * driver-side randomness, identical on every executor.
    */
  def embeddingNearDups(embs: DataFrame, minCos: Double = 0.95,
      nPlanes: Int = 8, nTables: Int = 4): DataFrame = {
    def tableKey(t: Int) = (0 until nPlanes).map { p =>
      // sign bit of sum_i(vec[i] * sign(hash(table, plane, i)))
      val dotCol = aggregate(
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (v, i) => v * when(
            pmod(xxhash64(lit(t), lit(p), i), lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0))),
        lit(0.0d), (acc, x) => acc + x)
      when(dotCol >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }.reduce(_ + _)
    val bucketed = embs.select(col("vec_id"), col("embedding"),
      posexplode(array((0 until nTables).map(tableKey): _*))
        .as(Seq("table_idx", "bucket")))
    val cands = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.table_idx") === col("b.table_idx") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        graft.expr.Functions.cosine_sim(
          col("a.embedding"), col("b.embedding")).as("cos"))
      .distinct()
    cands.filter(col("cos") >= minCos)
  }
}
