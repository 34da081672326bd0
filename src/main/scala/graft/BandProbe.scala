package graft

import graft.expr.Functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off interleaved A/B (HyperProbe protocol): LSH candidate
  * generation with the round-4 shape (groupBy-count + join-back valve —
  * the banding subtree and its per-row hashing evaluated for the
  * bucket-size branch AND the join probe side AND both self-join sides)
  * vs the round-5 shape (count-window valve over ONE exchange,
  * ReuseExchange for the self-join, minhash sig persisted and bands
  * derived from it). Per-level minima over interleaved rounds
  * (BENCH.md noise protocol). Prints one JSON line per family.
  */
object BandProbe {
  def main(args: Array[String]): Unit = {
    val spark = Bench.makeSpark(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val docs = spark.read.parquet(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1") +
        "/documents.parquet")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // --- old recipes, inlined (same as BandingSpec's equality oracles) --
    def oldValve(banded: DataFrame, keys: Seq[String]): DataFrame = {
      val sizes = banded.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("bsize"))
        .filter(col("bsize") > 1 && col("bsize") <= 10000)
      banded.join(sizes, keys)
    }
    def oldSimhash(): DataFrame = {
      val chunked = graft.ops.DedupOps.simhashBands(docs, 6, pairBands = true)
      val pruned = oldValve(chunked, Seq("chunk_idx", "chunk_key"))
      pruned.as("a").join(pruned.as("b"),
          col("a.chunk_idx") === col("b.chunk_idx") &&
            col("a.chunk_key") === col("b.chunk_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
    }
    def oldMinhash(): DataFrame = {
      val eligible = docs.filter(length(col("text")) >= 5)
      val banded = eligible.select(col("doc_id"),
        posexplode(minhash_bands(col("text"))).as(Seq("band_idx", "band_key")))
      val pruned = oldValve(banded, Seq("band_idx", "band_key"))
      val cands = pruned.as("a").join(pruned.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
        .distinct()
      val sigs = eligible.select(col("doc_id"), minhash_sig(col("text")).as("sig"))
      cands
        .join(sigs.withColumnRenamed("doc_id", "id_a")
          .withColumnRenamed("sig", "sig_a"), Seq("id_a"))
        .join(sigs.withColumnRenamed("doc_id", "id_b")
          .withColumnRenamed("sig", "sig_b"), Seq("id_b"))
        .withColumn("est",
          aggregate(zip_with(col("sig_a"), col("sig_b"),
              (x, y) => (x === y).cast("int")),
            lit(0), (acc, v) => acc + v) / lit(64.0))
        .filter(col("est") >= 0.45)
        .select(col("id_a"), col("id_b"))
    }

    def newSimhash(): DataFrame =
      graft.ops.DedupOps.simhashCandidates(docs, maxHamming = 6,
        pairBands = true)
    def newMinhash(): DataFrame = {
      // fresh cache per pass: unpersist so a warm cache cannot flatter
      // the new path (the probe measures the whole op incl. the sig pass)
      spark.sharedState.cacheManager.clearCache()
      graft.ops.DedupOps.minhashCandidates(docs, minJaccard = 0.6)
    }

    def time(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      force(mk())
      (System.nanoTime() - t0) / 1e9
    }

    // warm codegen on every path, then interleave
    Seq(() => oldSimhash(), () => newSimhash(),
      () => oldMinhash(), () => newMinhash()).foreach(time)
    val rounds = (1 to 3).map { _ =>
      (time(() => oldSimhash()), time(() => newSimhash()),
        time(() => oldMinhash()), time(() => newMinhash()))
    }
    def mn(f: ((Double, Double, Double, Double)) => Double) = rounds.map(f).min
    println(f"""{"simhash_old_sec":${mn(_._1)}%.3f,"simhash_new_sec":${mn(_._2)}%.3f,""" +
      f""""minhash_old_sec":${mn(_._3)}%.3f,"minhash_new_sec":${mn(_._4)}%.3f,""" +
      s""""rounds":${rounds.map(r =>
          f"[${r._1}%.2f,${r._2}%.2f,${r._3}%.2f,${r._4}%.2f]")
        .mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
