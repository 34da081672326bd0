package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio payloads ride as opaque
  * BINARY columns with typed metadata; decode / feature-extract runs as
  * a batched per-partition operator.
  *
  * The DECODE ITSELF IS A STUB — no image/audio codecs exist in this
  * container — but everything Spark-side is real and tested: the binary
  * schema, the deterministic synthesis of payloads, partition-batched
  * processing (mapPartitions over a typed Dataset — the Scala-native
  * equivalent of mapInPandas batch processing), and the feature-table
  * output shape. Swap `decodeStub` for a real codec on a cluster and
  * nothing else changes.
  */
object MultimodalOps {

  final case class MediaRow(doc_id: Long, media_type: String,
      payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String,
      byte_len: Int, width: Int, height: Int, channels: Int,
      mean_byte: Double, header_ok: Boolean)

  /** Deterministic fake media payload: a 16-byte header
    * (magic "GRFT", width, height, channels) + pseudo-pixels derived
    * from the doc text bytes. Stands in for real image bytes.
    */
  def synthesize(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      when(pmod(col("doc_id"), lit(2)) === 0, lit("image"))
        .otherwise(lit("audio")).as("media_type"),
      concat(
        lit("GRFT".getBytes("UTF-8")),
        // width = 1 + doc_id % 64, height = 1 + doc_id % 48, ch = 3
        // encoded as 4-byte big-endian ints via substring of hex -> bin
        to_binary(lpad(hex((col("doc_id") % 64 + 1).cast("int")), 8, "0"), lit("hex")),
        to_binary(lpad(hex((col("doc_id") % 48 + 1).cast("int")), 8, "0"), lit("hex")),
        to_binary(lpad(hex(lit(3)), 8, "0"), lit("hex")),
        encode(substring(col("text"), 1, 256), "UTF-8")).as("payload"))

  /** STUBBED decode: parses the fake header and computes byte stats.
    * A real implementation would call an image codec here — per
    * partition, batched, exactly this shape.
    */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
    rows.map { r =>
      val p = r.payload
      val ok = p.length >= 16 &&
        p(0) == 'G' && p(1) == 'R' && p(2) == 'F' && p(3) == 'T'
      def be(off: Int): Int =
        ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
          ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
      val (w, hgt, c) = if (ok) (be(4), be(8), be(12)) else (0, 0, 0)
      val body = if (p.length > 16) p.drop(16) else Array.empty[Byte]
      val mean = if (body.isEmpty) 0.0
        else body.map(b => (b & 0xff).toDouble).sum / body.length
      MediaFeatures(r.doc_id, r.media_type, p.length, w, hgt, c,
        math.rint(mean * 1e6) / 1e6, ok)
    }

  /** Full pipeline: docs -> binary media column -> partition-batched
    * feature extraction -> typed feature table.
    */
  def mediaFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = synthesize(docs).as[MediaRow]
    media.mapPartitions(decodeStub).toDF().orderBy(col("doc_id"))
  }

  final case class MediaTransform(doc_id: Long, n_frames: Int,
      sampled_mean: Double, resized_len: Int, resized_mean: Double)

  /** Frame-sample + resize over the payload body, batched per partition
    * (the remaining multimodal verbs of the round brief). Same honesty
    * split as decodeStub: the byte-level ops are real and deterministic
    * over the synthesized payloads — a real video/image codec slots in
    * at this exact seam with the same batch shape.
    *
    *  - frame-sample: body cut into 16-byte frames (tail dropped),
    *    every 2nd frame kept, mean byte over the kept frames.
    *  - resize: nearest-neighbor resample of the body to 64 bytes
    *    (src index = i * len / 64, integer division), mean byte.
    *
    * All arithmetic is integer-exact until the final mean (double sum of
    * ints, rint-pinned to 1e-6) so the DuckDB oracle replicates it
    * bit-for-bit.
    */
  def transformStub(rows: Iterator[MediaRow]): Iterator[MediaTransform] =
    rows.map { r =>
      val p = r.payload
      val body = if (p.length > 16) java.util.Arrays.copyOfRange(p, 16, p.length)
        else Array.empty[Byte]
      val frame = 16
      val nFrames = body.length / frame
      var sum = 0.0
      var cnt = 0
      var f = 0
      while (f < nFrames) {
        if (f % 2 == 0) {
          var j = f * frame
          val end = j + frame
          while (j < end) { sum += (body(j) & 0xff); cnt += 1; j += 1 }
        }
        f += 1
      }
      val sampledMean =
        if (cnt == 0) 0.0 else math.rint(sum / cnt * 1e6) / 1e6
      val n = 64
      var rsum = 0.0
      if (body.nonEmpty) {
        var i = 0
        while (i < n) {
          rsum += (body((i.toLong * body.length / n).toInt) & 0xff)
          i += 1
        }
      }
      val resizedMean =
        if (body.isEmpty) 0.0 else math.rint(rsum / n * 1e6) / 1e6
      MediaTransform(r.doc_id, nFrames, sampledMean, n, resizedMean)
    }

  /** docs -> binary media -> batched frame-sample + resize. */
  def mediaTransforms(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = synthesize(docs).as[MediaRow]
    media.mapPartitions(transformStub).toDF().orderBy(col("doc_id"))
  }
}
