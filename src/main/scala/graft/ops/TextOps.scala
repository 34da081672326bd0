package graft.ops

import graft.expr.Functions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Text-analysis operators over a documents table: token counting,
  * quality scoring, language ID, fingerprinting. All narrow per-row
  * transforms (SQL functions or codegen'd custom expressions); the only
  * shuffles here are the final small aggregations.
  */
object TextOps {

  /** Token counts: whitespace tokens + a BPE-ish regex token count
    * (letter runs | digit runs | single non-alnum-non-space).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")
        .as("re_tokens"),
      length(col("text")).cast("long").as("chars"))
      .orderBy(col("doc_id"))

  /** Quality features + pinned blended score (see TextHash.qualityScore),
    * plus the same features expressed as plain SQL columns so the oracle
    * can cross-check feature extraction.
    */
  def qualityReport(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("chars"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("words"),
      (length(regexp_replace(col("text"), "[^A-Za-z]", "")).cast("double") /
        length(col("text"))).as("alpha_ratio"),
      (length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("double") /
        length(col("text"))).as("punct_ratio"),
      quality_score(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  /** Language ID + distribution rollup. */
  def langIdReport(docs: DataFrame): DataFrame =
    docs.select(lang_id(col("text")).as("lang_pred"))
      .groupBy(col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang_pred"))

  /** Document fingerprint: md5 of whitespace-normalized lowercase text
    * (SQL-expressible on both engines), plus the 64-bit simhash
    * fingerprint from the custom expression.
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(lower(regexp_replace(trim(col("text")), "\\s+", " ")))
        .as("fp_md5"),
      simhash64(col("text")).as("fp_simhash"))
      .orderBy(col("doc_id"))
}
