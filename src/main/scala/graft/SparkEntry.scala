package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from per-cluster objects under
  * [[graft.queries]]; every entry has a DuckDB oracle unless the operator
  * is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship pipeline on sf0.001 (SURVEY §7.2 minimal end-to-end
    * slice): base64-wire events → D1/D2 decode with unusable routing →
    * config-driven I3/I4 identify (ids from the message, keys/seqNos
    * via the record fallback chain) → Q5 per-key sequencing → §2.7
    * structural counts per chain. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val cfg = graft.model.ConsumerConfig(
      sequencingRequired = true, sequencingPerKey = true,
      idPropertyNames = Seq("k"),
      keyPropertyNames = Seq("user_id"),
      seqNoPropertyNames = Seq("ts"))
    val nullStr = lit(null).cast("string")
    val raw = Tables.events(spark, dir)
      .withColumn("data", base64(encode(col("props"), "UTF-8")))
      .withColumn("shard_id",
        concat(lit("S|"), pmod(col("user_id"), lit(4)).cast("string")))
    val decoded = graft.operators.Decode.extractJsonMessages(raw, col("data"))
    val rec = to_json(struct(col("event_id"), col("user_id"),
      expr("ts div 1000").as("ts")))
    val identified = graft.operators.Identify.idsKeysSeqNos(cfg, decoded,
      col("message"), nullStr, rec, col("ts").cast("string"),
      lit(null).cast("int"))
    val usable = identified.filter(col("reason_unusable").isNull &&
      col("reason_rejected").isNull)
    val seq = graft.operators.Identify.sequence(cfg, usable, col("shard_id"),
      col("message"), nullStr, rec, col("ts").cast("string"),
      col("event_id"))
    seq.groupBy("shard_id", "user_id")
      .agg(count(lit(1)).as("messages"),
        sum(when(col("is_first_to_process"), 1).otherwise(0)).as("heads"),
        max(col("seq_rn")).as("chain_len"))
      .orderBy("shard_id", "user_id")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ConsumerQueries.all ++ BatchQueries.all ++ TrainingQueries.all ++
      SimilarityQueries.all ++ MultimodalQueries.all ++
      TemporalQueries.all ++ RetrievalQueries.all ++ OpsQueries.all ++
      WebQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ConsumerQueries.oracle ++ BatchQueries.oracle ++
      TrainingQueries.oracle ++ SimilarityQueries.oracle ++
      MultimodalQueries.oracle ++ TemporalQueries.oracle ++
      RetrievalQueries.oracle ++ OpsQueries.oracle ++
      WebQueries.oracle

  /** Bench name list, in a fixed order. Since round 11 this covers the
    * FULL registry — every CORRECTNESS-green query also has a measured
    * cost (the r10 verdict flagged 16 correct-but-unbenched shapes);
    * the cheap consumer-tier additions cost well under a second each.
    * Exposed as a name list so EntrySpec can assert every name
    * resolves — `flatMap(queries.get)` would otherwise silently drop a
    * typo'd entry from the bench. */
  val benchNames: Seq[String] = Seq(
      // stream-consumer clusters
      "decode_json", "decode_base64", "identify_ids", "seq_per_key",
      "seq_per_shard", "seq_heads", "seq_config_perkey", "task_lifecycle",
      "task_multi", "batch_counts", "q1_agg", "q_join_agg",
      "state_upsert", "windowed_counts",
      // temporal cluster
      "asof_join", "sessionize", "funnel_stages", "retention_cohorts",
      "range_join_binned",
      // training-data clusters
      "text_stats", "text_repetition", "text_redact", "text_normalize",
      "text_winnowing", "vocab_topk", "tfidf_topk", "collocations_topk",
      "vocab_drift", "doc_surprisal", "quality_gate", "salted_counts",
      "dedup_exact",
      "dedup_simhash", "dedup_simhash_pairs", "dedup_minhash_lsh",
      "dedup_ngram_jaccard", "dedup_components", "dedup_survivors",
      "dedup_incremental", "train_split",
      "source_cap", "decontaminate", "contamination_overlap",
      "mixture_sample",
      "dedup_incremental_bloom",
      "ann_topk_brute", "ann_topk_native", "ann_topk_ivf",
      "ann_topk_ivf_trained", "ann_topk_ivf_pruned", "embedding_quantize",
      "ann_topk_quantized", "embedding_dups",
      "embedding_survivors",
      "multimodal_features", "corpus_pipeline", "corpus_quantiles",
      "corpus_rollup", "length_outliers",
      // round-11 additions: the previously correct-but-unbenched tail
      "asof_tolerance", "sample_stratified", "corpus_stats",
      "multimodal_resize", "multimodal_frames",
      "batch_key", "decode_split", "identify_config", "identify_strict",
      "seq_none", "task_master_slave", "task_subtree",
      "dead_letters", "dead_letter_parse", "dynamo_attrs",
      "kpl_passthrough", "corpus_write_read",
      "pack_sequences", "mixture_upsample", "adaptive_quality",
      // round-12 additions
      "bpe_pair_counts", "vocab_fof", "dedup_cluster_report",
      "dup_span_report", "dedup_source_matrix", "snapshot_diff",
      "dedup_span_trim", "dedup_survivors_quality",
      "winnow_overlap_pairs", "seq_gaps", "shard_skew_report",
      "lang_margin", "bigram_surprisal", "ann_recall_report",
      "ann_recall_trained",
      // round-13 additions
      "ann_topk_ivf_sampled", "winnow_overlap_words", "bpe_merges",
      "multimodal_dedup_pairs", "seq_gaps_bucketed", "bpe_encode",
      "hot_keys", "ann_topk_pq", "ann_recall_pq", "ann_topk_pq_rerank",
      "dedup_modality_agreement", "vocab_coverage",
      "ann_topk_ivf_append", "embedding_code_dups", "audio_features",
      "ann_topk_ivfpq", "chunk_report", "hot_bigrams",
      "semantic_dedup", "ivf_balance_report", "epoch_shuffle",
      "kn_surprisal", "quality_audit", "quantizer_drift",
      "bm25_topk", "hybrid_retrieval",
      "asof_forward", "dedup_recall_report", "ann_topk_filtered",
      "ann_topk_ivfpq_pruned", "event_transitions", "rate_anomalies",
      "pagerank_hubs", "k_anonymity_report",
      "dedup_lsh_probe", "mixture_temperature", "window_topk",
      "ann_range_search", "leakage_safe_split",
      "knn_join", "decayed_counts", "funnel_wilson", "value_quantiles",
      "minhash_calibration", "session_stats",
      "q3_topk", "q5_local_revenue", "ivf_purity", "cluster_labels",
      "quality_dup_crosstab", "stickiness_report",
      "ngram_novelty", "multimodal_dedup_survivors",
      "ivf_probe_sweep", "bm25_batch", "source_manifest",
      // governance + warehouse-ops tier
      "erasure_sweep", "l_diversity_report", "scd2_dimension",
      "q18_big_orders", "seasonality_profile", "salt_advisor",
      "fuzzy_name_pairs",
      "matryoshka_topk", "ann_topk_binary",
      "heaps_law", "token_budget_plan", "pack_efficiency_sweep",
      "dedup_containment",
      "rfm_segments", "ltv_cohorts", "attribution_report",
      "length_drift_report",
      "session_path_topk", "media_format_report",
      "simhash_calibration",
      "containment_survivors", "ingest_changepoint",
      "dup_triangle_count", "ann_ndcg_report",
      "q10_returns", "rolling_revenue", "cdc_merge",
      "q17_small_qty", "bpe_fertility", "image_search_topk",
      // round-14 additions: crawl front-end (HTML + URL governance)
      "html_extract", "boilerplate_report", "domain_rollup",
      "domain_cap", "bpe_merges50", "image_phash_pairs",
      "rfm_segments_approx", "bpe_compression_curve", "url_dedup",
      "domain_dup_matrix",
      // round-15 additions
      "interval_overlap", "t_closeness_report", "cross_doc_span_trim",
      "dp_count_release", "frontier_refresh_plan",
      // round-16 additions
      "dp_histogram_release", "hll_shingle_report", "quota_sample",
      "robots_policy", "redirect_resolve", "cms_bigram_report",
      "hdr_value_quantiles", "crawl_depth_bfs", "anchor_text_topk",
      // round-17 additions
      "hll_shingle_sketch", "cms_bigram_sketch", "robots_wildcard",
      "hll_merge_shards", "cms_merge_shards", "politeness_schedule",
      "hll_pair_overlap",
      // round-18 additions
      "hll_pair_estimate", "kmv_pair_overlap", "kmv_pair_estimate",
      "kmv_merge_shards", "hll_sliding_users", "hdr_merge_shards",
      "hdr_sliding_quantiles",
      // round-19 additions: the sketch-only sliding production twins
      // + the parquet-persisted sketch-table pair + ingest paths
      "hll_sliding_estimate", "hdr_sliding_sketch",
      "hll_pair_from_table", "hll_table_ingest",
      // round-20 additions: durability symmetry — the persisted
      // day-grain sliding estimators (distinct AND quantiles) + the
      // persisted-table pair path for the measured-better KMV
      // estimator
      "hll_sliding_from_table", "kmv_pair_from_table",
      "hdr_sliding_from_table", "cms_table_ingest",
      "kmv_table_ingest")

  def benchQueries: Seq[(String, (SparkSession, String) => DataFrame)] =
    benchNames.flatMap(n => queries.get(n).map(n -> _))
}
