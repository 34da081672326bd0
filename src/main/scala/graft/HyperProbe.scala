package graft

import org.apache.spark.sql.functions._

/** One-off interleaved A/B: embedding-LSH bucketing with the round-2
  * per-row xxhash64 recipe vs the round-3 precomputed sign matrix, same
  * window, per-level minima (BENCH.md noise protocol).
  */
object HyperProbe {
  def main(args: Array[String]): Unit = {
    val spark = Bench.makeSpark(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val embs = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") +
        "/embeddings.parquet")
    val nPlanes = 4; val nTables = 8
    val dim = embs.select(size(col("embedding"))).head().getInt(0)
    val signs = graft.ops.DedupOps.hyperplaneSigns(nTables, nPlanes, dim)
    def oldKey(t: Int) = (0 until nPlanes).map { p =>
      val dotCol = aggregate(
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (v, i) => v * when(
            pmod(xxhash64(lit(t), lit(p), i), lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0))),
        lit(0.0d), (acc, x) => acc + x)
      when(dotCol >= 0, lit(1L)).otherwise(lit(0L)) * lit(1L << p)
    }.reduce(_ + _)
    // the PRODUCTION key builder, not a local copy — the probe measures
    // exactly what embeddingCandidates runs
    def newKey(t: Int) =
      graft.ops.DedupOps.hyperplaneTableKey(signs, t, nPlanes,
        col("embedding"))
    def time(key: Int => org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      embs.select(col("vec_id"),
        posexplode(array((0 until nTables).map(key): _*))
          .as(Seq("table_idx", "bucket")))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(newKey); time(oldKey) // warm both codegen paths
    val rounds = (1 to 3).map(_ => (time(oldKey), time(newKey)))
    println(f"""{"old_sec":${rounds.map(_._1).min}%.3f,"new_sec":${rounds
      .map(_._2).min}%.3f,"rounds":${rounds
      .map(r => f"[${r._1}%.2f,${r._2}%.2f]").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
