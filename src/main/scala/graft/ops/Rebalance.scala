package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Width-bucketed work equalization — the Spark recast of the
  * reference's only skew-balancing primitive, RecResizeImgForTest
  * (rec_img_aug.py:55-106): sort rows by size, group into batches, pad
  * to the per-batch max so no worker burns time on one oversized batch.
  *
  * The distributed restatement has two halves:
  *  1. equalize ACROSS partitions: per-row work is ~ payload length, and
  *     real corpora arrive CLUSTERED by length (sorted dumps, per-source
  *     files), so whole input splits can be all-long rows — a hash
  *     repartition on the row key spreads them uniformly, bounding every
  *     task's total work at ~corpus_work/nPart regardless of input
  *     layout.
  *  2. pack WITHIN partitions: sortWithinPartitions(length) co-locates
  *     similar-length rows, the analogue of the reference's
  *     sort-by-width batch packing (vectorized kernels and page-cache
  *     behavior both prefer runs of like-sized rows; on the reference it
  *     minimized batch padding).
  *
  * Neither half changes row content — ordering-sensitive consumers (the
  * rn window) key on (conv_id, turn_idx, ts), not partition layout.
  */
object Rebalance {

  /** Fixed-width integer length bucket, capped — exact integer math on
    * both engines so the DuckDB oracle replicates it bit-for-bit (a
    * log2-based bucket would ride float rounding at the boundaries).
    */
  def lengthBucket(len: Column, width: Int = 200, maxBucket: Int = 12): Column =
    least(floor(len / width.toDouble), lit(maxBucket.toLong)).cast("int")

  /** Bucket histogram over a documents table — the observable the
    * equalizer is driven by (and the oracle-checked driver query).
    */
  def bucketHistogram(docs: DataFrame, width: Int = 200,
      maxBucket: Int = 12): DataFrame =
    docs
      .groupBy(lengthBucket(length(col("text")), width, maxBucket)
        .as("len_bucket"))
      .agg(count(lit(1)).as("n"),
        sum(length(col("text"))).cast("long").as("sum_chars"))
      .orderBy(col("len_bucket"))

  /** Equalize per-partition work for a length-skewed input: hash
    * repartition on `keys` (destroys any length clustering in the input
    * layout) + sortWithinPartitions on the work column (the width-bucket
    * packing half). Deterministic — partition assignment is a pure hash
    * of the keys.
    */
  def equalizeByLength(df: DataFrame, lenCol: Column, keys: Seq[Column],
      nPart: Int): DataFrame =
    df.repartition(nPart, keys: _*).sortWithinPartitions(lenCol)

  /** Per-partition total work (sum of the work column) — the balance
    * observable the tests assert on (max/median ratio).
    */
  def partitionWork(df: DataFrame, lenCol: Column): Array[Long] =
    df.select(spark_partition_id().as("pid"), lenCol.as("w"))
      .groupBy(col("pid"))
      .agg(sum(col("w")).cast("long").as("work"))
      .collect().map(_.getAs[Long]("work"))
}
