package graft.ops

import graft.expr.Functions.cosine_sim
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>).
  *
  * Two paths, as the scale ladder demands:
  *  - bruteForceTopK: exact cosine top-k, broadcast queries x corpus —
  *    the correctness baseline; linear in corpus size, fine per-batch.
  *  - ivfTopK: IVF-style two-stage search — assign every vector to its
  *    nearest centroid (k-means-free: centroids are a deterministic
  *    hash-sample of the corpus, good enough for bucketing), probe the
  *    nProbe nearest centroids per query, exact re-rank only inside
  *    probed cells. At 100 TB the corpus scan becomes a partition-pruned
  *    read when the table is written partitioned by centroid_id.
  */
object SimilarityOps {

  /** Exact cosine top-k per query. `queries` must be small (broadcast). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      k: Int = 10): DataFrame = {
    val scored = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(queries.select(
        col("vec_id").as("query_id"), col("embedding").as("q_emb"))))
      .select(col("query_id"), col("vec_id"),
        cosine_sim(col("embedding"), col("q_emb")).as("cos"))
      .filter(col("query_id") =!= col("vec_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic centroid sample: every vector whose xxhash64(vec_id)
    * lands in 1/rate — no RNG, reproducible across runs/executors.
    */
  def centroids(corpus: DataFrame, rate: Int = 32): DataFrame =
    corpus.filter(pmod(xxhash64(col("vec_id")), lit(rate)) === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("c_emb"))

  /** Assign each corpus vector to its nearest centroid (broadcast
    * centroids; one narrow pass).
    */
  def assign(corpus: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("centroid_id"))
    corpus.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("centroid_id"),
        cosine_sim(col("embedding"), col("c_emb")).as("c_cos"))
      .withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .drop("r", "c_cos")
  }

  /** IVF search: probe the nProbe nearest centroids per query, exact
    * cosine re-rank within probed cells only.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 10,
      nProbe: Int = 4, rate: Int = 32): DataFrame = {
    val cents = centroids(corpus, rate)
    val assigned = assign(corpus, cents)
    val qw = Window.partitionBy(col("query_id"))
      .orderBy(col("qc_cos").desc, col("centroid_id"))
    val probes = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("q_emb"), col("centroid_id"),
        cosine_sim(col("q_emb"), col("c_emb")).as("qc_cos"))
      .withColumn("r", row_number().over(qw))
      .filter(col("r") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("centroid_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    assigned.join(probes, Seq("centroid_id"))
      .select(col("query_id"), col("vec_id"),
        cosine_sim(col("embedding"), col("q_emb")).as("cos"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
