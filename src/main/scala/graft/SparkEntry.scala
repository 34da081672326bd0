package graft

import graft.data.TranscriptGen
import graft.pipeline.ExtractPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` are the operator inventory entries (SURVEY.md §2); each key
  * with an `oracleSql` entry is DuckDB-cross-checked by the driver at
  * sf0.01; extraction kernels without SQL equivalents are covered by the
  * golden-equality suite instead (sbt -batch test).
  */
object SparkEntry {

  /** Deterministic synthetic transcript table (FIXTURES.md §1), generated
    * DISTRIBUTED — one task per conversation seed, pure function of
    * (seed, conv, turn) — so generation itself scales with the cluster.
    */
  def transcripts(spark: SparkSession, nConvs: Int, cap: Int): DataFrame = {
    import spark.implicits._
    spark.range(0, nConvs.toLong, 1,
        numPartitions = spark.sparkContext.defaultParallelism)
      .flatMap(c => TranscriptGen.turnsOf(c, cap))
      .toDF()
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0: the full
    * main-content extraction pipeline over the synthetic transcript table.
    */
  def entry(spark: SparkSession): DataFrame = {
    graft.expr.Functions.register(spark)
    ExtractPipeline.extract(transcripts(spark, nConvs = 64, cap = 64))
  }

  private def docs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")
  private def embs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- extraction pipeline (golden-tested; rows-only for the driver) --
    "x_extract_turns" -> ((s, _) =>
      ExtractPipeline.extract(transcripts(s, 256, 64))),
    "x_extract_blocks" -> ((s, _) =>
      ExtractPipeline.blocks(
        ExtractPipeline.extractWithBlocks(transcripts(s, 256, 64)))),
    "x_conv_docs" -> ((s, _) =>
      ExtractPipeline.convDocs(ExtractPipeline.extract(transcripts(s, 256, 64)))),
    // error-side output: rows whose payload failed its sniffed decoder
    // (the reference's per-row try/except path, simple_dataset.py:94-120)
    "x_bad_rows" -> ((s, _) =>
      ExtractPipeline.extract(transcripts(s, 256, 64))
        .filter(!col("ok"))
        .select(col("conv_id"), col("turn_idx"), col("rn"), col("kind"))),
    // A/B variant audit (DistillationModel analogue): pipeline vs itself
    // must be exact — acc 1.0, n_exact == n
    "x_ab_audit" -> ((s, _) => {
      val e = ExtractPipeline.extract(transcripts(s, 128, 32))
      graft.metrics.Quality.equalityReport(e, e)
    }),
    // rollup over extraction metrics by payload kind (SURVEY §2.8's
    // "rollup over metrics" extra; NULL kind row = corpus totals)
    "x_kind_rollup" -> ((s, _) =>
      ExtractPipeline.extract(transcripts(s, 256, 64))
        .rollup(col("kind"))
        .agg(count(lit(1)).as("turns"),
          sum(length(col("text"))).as("chars"),
          sum(size(col("spans"))).as("blocks"),
          sum(when(col("ok"), 0L).otherwise(1L)).as("bad"))
        .orderBy(col("kind").asc_nulls_first)),
    // checkpointed run + per-partition lineage stats (FIXTURES.md §5)
    "x_partition_stats" -> ((s, _) => {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ckpt_q").toString
      graft.io.TableIO.runCheckpointed(s, transcripts(s, 128, 32),
        ExtractPipeline.extract, dir, nBuckets = 8, waveSize = 4)
      graft.io.TableIO.partitionStats(s, dir, 8)
        .select(col("bucket"), col("rows"), col("convs"), col("attempt"))
        .orderBy(col("bucket"))
    }),

    // ---- dedup (training-data pipeline) ---------------------------------
    "dd_exact" -> ((s, dir) =>
      graft.ops.DedupOps.exactDedup(docs(s, dir)).orderBy(col("text_md5"))),
    "dd_minhash" -> ((s, dir) =>
      graft.ops.DedupOps.minhashNearDups(docs(s, dir), minJaccard = 0.6)
        .orderBy(col("id_a"), col("id_b"))),
    "dd_simhash" -> ((s, dir) =>
      graft.ops.DedupOps.simhashNearDups(docs(s, dir), maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))),
    // quadratic baseline: subset capped so cost stays bounded at any sf
    // (the exact all-pairs path is a validation tool, not a scale path)
    "dd_jaccard_exact" -> ((s, dir) =>
      graft.ops.DedupOps.ngramJaccardPairsExact(
        docs(s, dir).filter(
          pmod(col("doc_id"), lit(10)) === 0 && col("doc_id") < 2000), 0.25)
        .orderBy(col("id_a"), col("id_b"))),
    "dd_embed_cos" -> ((s, dir) =>
      graft.ops.DedupOps.embeddingNearDups(embs(s, dir), minCos = 0.35, nPlanes = 8, nTables = 4)
        .orderBy(col("id_a"), col("id_b"))),

    // ---- similarity search ---------------------------------------------
    "ann_brute" -> ((s, dir) => {
      val e = embs(s, dir)
      graft.ops.SimilarityOps.bruteForceTopK(
        e, e.filter(pmod(col("vec_id"), lit(101)) === 0), k = 5)
        .select(col("query_id"), col("rank"), col("vec_id"))
        .orderBy(col("query_id"), col("rank"))
    }),
    "ann_ivf" -> ((s, dir) => {
      val e = embs(s, dir)
      graft.ops.SimilarityOps.ivfTopK(
        e, e.filter(pmod(col("vec_id"), lit(101)) === 0),
        k = 5, nProbe = 8, rate = 16)
        .select(col("query_id"), col("rank"), col("vec_id"), col("cos"))
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- text analysis ---------------------------------------------------
    "ta_tokens" -> ((s, dir) => graft.ops.TextOps.tokenCounts(docs(s, dir))),
    "ta_quality" -> ((s, dir) =>
      graft.ops.TextOps.qualityReport(docs(s, dir)).drop("quality")),
    "ta_scores" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        graft.expr.Functions.quality_score(col("text")).as("quality"),
        graft.expr.Functions.lang_id(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),
    "ta_langid" -> ((s, dir) => graft.ops.TextOps.langIdReport(docs(s, dir))),
    "ta_fingerprint" -> ((s, dir) =>
      graft.ops.TextOps.fingerprints(docs(s, dir)).drop("fp_simhash")),

    // ---- multimodal plumbing (stubbed decode, real schema/batching) ----
    "mm_features" -> ((s, dir) =>
      graft.ops.MultimodalOps.mediaFeatures(s, docs(s, dir))),

    // ---- union + deterministic sample (simple_dataset.py:45-57) ---------
    "q_union_sample" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
        .filter(substring(md5(concat(col("l_orderkey").cast("string"),
          lit("-"), col("l_linenumber").cast("string"))), 1, 1) < "8")
        .select(col("l_orderkey").as("key"), lit("li").as("src"))
      val ord = s.read.parquet(s"$dir/orders.parquet")
        .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) < "4")
        .select(col("o_orderkey").as("key"), lit("ord").as("src"))
      li.unionByName(ord).groupBy(col("src"))
        .agg(count(lit(1)).as("n"),
          sum(col("key").cast("decimal(18,0)")).cast("double").as("key_sum"))
        .orderBy(col("src"))
    }),

    // ---- top-k (BalanceLoss topk analogue) ------------------------------
    "q_topk" -> ((s, dir) =>
      s.read.parquet(s"$dir/orders.parquet")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)),

    // ---- per-group limit (max_candidates cap analogue) ------------------
    "q_group_limit" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 2)
        .select(col("event_type"), col("rk"), col("event_id"), col("value"))
        .orderBy(col("event_type"), col("rk"))
    }),

    // ---- semi/anti joins -------------------------------------------------
    "q_semi_join" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),
    "q_anti_join" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      c.join(o.filter(col("o_orderpriority") === "1-URGENT"),
          c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey")).orderBy(col("c_custkey"))
    }),

    // ---- broadcast join + agg -------------------------------------------
    "q_join_agg" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val c = s.read.parquet(s"$dir/customer.parquet")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
            .as("total"))
        .orderBy(col("c_mktsegment"))
    }),

    // ---- label encode (ClsLabelEncode: label -> index via broadcast
    //      list, unknown -> row drop; label_ops.py:6-16) ------------------
    "q_label_encode" -> ((s, dir) => {
      val labels = array(lit("click"), lit("view"), lit("purchase"))
      s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"),
          (array_position(labels, col("event_type")) - 1)
            .cast("int").as("label_idx"))
        .filter(col("label_idx") >= 0)
        .orderBy(col("event_id"))
    }),

    // ---- distinct counting -----------------------------------------------
    "q_distinct" -> ((s, dir) =>
      s.read.parquet(s"$dir/orders.parquet")
        .agg(countDistinct(col("o_custkey")).as("n_cust"),
          countDistinct(col("o_orderpriority")).as("n_prio"))),

    // ---- exact percentiles (OHEM rank-select / TrainingStats median) ----
    "q_percentile" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(col("event_type"))
        .agg(
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"))
        .orderBy(col("event_type"))),

    // ---- rollup (metrics two-level rollup, eval_det_iou combine) --------
    "q_rollup" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .rollup(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("v"))
        .orderBy(col("event_type").asc_nulls_first)),

    // ---- lag window (turn-context features) ------------------------------
    "q_lag" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .select(col("user_id"), col("event_id"), col("value"),
          col("prev_value"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- range self-join (IoU theta-join analogue over time) ------------
    "q_range_join" -> ((s, dir) => {
      val e = s.read.parquet(s"$dir/events.parquet")
        .select(col("event_id"), col("user_id"), col("ts"))
      e.as("a").join(e.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("b.ts") > col("a.ts") &&
            col("b.ts") <= col("a.ts") + expr("INTERVAL 60 SECONDS"))
        .groupBy(col("a.user_id").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("user_id"))
    }),

    // ---- ordering window (sort_boxes / stable turn order analogue) ------
    "q_order_window" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      s.read.parquet(s"$dir/events.parquet")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"))
        .orderBy(col("user_id"))
    }),

    // ---- grouped aggregation, decimal-exact (RecMetric partials shape) --
    "q_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for the extraction kernels (they
    * are non-SQL-expressible; covered by golden-equality tests).
    */
  def oracleSql: Map[String, String] = Map(
    "dd_exact" ->
      """SELECT md5(text) AS text_md5, min(doc_id) AS keep_id,
        |  count(*) AS group_size
        |FROM documents GROUP BY md5(text) ORDER BY text_md5""".stripMargin,
    "ta_tokens" ->
      """SELECT doc_id,
        |  length(regexp_split_to_array(trim(text), '\s+')) AS ws_tokens,
        |  length(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]', 0)) AS re_tokens,
        |  length(text) AS chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ta_quality" ->
      """SELECT doc_id, length(text) AS chars,
        |  length(regexp_split_to_array(trim(text), '\s+')) AS words,
        |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) AS alpha_ratio,
        |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "ta_fingerprint" ->
      """SELECT doc_id,
        |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_union_sample" ->
      """SELECT src, count(*) AS n,
        |  CAST(SUM(CAST(key AS DECIMAL(18,0))) AS DOUBLE) AS key_sum
        |FROM (
        |  SELECT l_orderkey AS key, 'li' AS src FROM lineitem
        |  WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)), 1, 1) < '8'
        |  UNION ALL
        |  SELECT o_orderkey AS key, 'ord' AS src FROM orders
        |  WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) < '4'
        |) GROUP BY src ORDER BY src""".stripMargin,
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q_group_limit" ->
      """SELECT event_type, rk, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
        |  FROM events) WHERE rk <= 2 ORDER BY event_type, rk""".stripMargin,
    "q_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_label_encode" ->
      """SELECT event_id,
        |  CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
        |    WHEN 'purchase' THEN 2 END AS label_idx
        |FROM events
        |WHERE event_type IN ('click', 'view', 'purchase')
        |ORDER BY event_id""".stripMargin,
    "q_distinct" ->
      """SELECT count(DISTINCT o_custkey) AS n_cust,
        |  count(DISTINCT o_orderpriority) AS n_prio FROM orders""".stripMargin,
    "q_percentile" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.9) AS p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_rollup" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
        |FROM events GROUP BY ROLLUP(event_type)
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,
    "q_lag" ->
      """SELECT user_id, event_id, value,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q_range_join" ->
      """SELECT a.user_id AS user_id, count(*) AS n_pairs
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 60 SECOND
        |GROUP BY a.user_id ORDER BY user_id""".stripMargin,
    "q_order_window" ->
      """SELECT user_id, event_id, event_type FROM (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events) WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
