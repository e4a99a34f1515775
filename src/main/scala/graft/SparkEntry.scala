package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3JoinGroupSort(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"            -> (Relational.q1Agg _),
    "q2_filter_project" -> (Relational.q2FilterProject _),
    "q3_join_group_sort"-> (Relational.q3JoinGroupSort _),
    "q4_global_rollup"  -> (Relational.q4GlobalRollup _),
    "q5_topn"           -> (Relational.q5TopN _),
    "q6_pagination"     -> (Relational.q6Pagination _),
    "q7_search_regex"   -> (Relational.q7SearchRegex _),
    "q8_semijoin_in"    -> (Relational.q8SemijoinIn _),
    "q9_antijoin"       -> (Relational.q9Antijoin _),
    "q10_distinct_count"-> (Relational.q10DistinctCount _),
    "q11_latest_per_key"-> (Relational.q11LatestPerKey _),
    "q12_cost_calc"     -> (Relational.q12CostCalc _),
    "q13_sql"           -> (Relational.q13Sql _),
    "q14_multijoin"     -> (Analytics.q14Multijoin _),
    "q15_percentiles"   -> (Analytics.q15Percentiles _),
    "q16_rollup"        -> (Analytics.q16Rollup _),
    "q17_json"          -> (Analytics.q17Json _),
    "q18_asof"          -> (Analytics.q18AsOf _),
    "q19_moving_avg"    -> (Analytics.q19MovingAvg _),
    "q20_set_ops"       -> (Analytics.q20SetOps _),
    "q21_array_agg"     -> (Analytics.q21ArrayAgg _),
    "q22_or_exists"     -> (Relational.q22OrExists _),
    "q23_patch_update"  -> (Mutations.q23PatchUpdate _),
    "q24_dml"           -> (Mutations.q24Dml _),
    "q25_shipping_priority" -> (Warehouse.q25ShippingPriority _),
    "q26_bilateral_volume"  -> (Warehouse.q26BilateralVolume _),
    "q27_large_volume_cust" -> (Warehouse.q27LargeVolumeCustomers _),
    "q28_group_push"        -> (Lookups.q28GroupPushFlat _),
    "q29_left_lookup"       -> (Lookups.q29LeftLookup _),
    "q30_user_activity_page"-> (Lookups.q30UserActivityPage _),
    "q31_exists_returned"   -> (Warehouse.q31ExistsReturned _),
    "q32_cust_distribution" -> (Warehouse.q32CustDistribution _),
    "q33_pivot_activity"    -> (Analytics.q33PivotActivity _),
    "q34_bucket_histogram"  -> (Analytics.q34BucketHistogram _),
    "q35_addtoset_merge"    -> (Mutations.q35AddToSetMerge _),
    "q36_page_with_total"   -> (Lookups.q36PageWithTotal _),
    "q37_last_n_per_key"    -> (Relational.q37LastNPerKey _),
    "q38_small_qty_revenue" -> (Warehouse.q38SmallQtyRevenue _),
    "q39_cube"          -> (Analytics.q39Cube _),
    "q40_share_of_day"  -> (Analytics.q40ShareOfDay _),
    "q41_scd2_intervals"-> (Mutations.q41Scd2Intervals _),
    "s1_bruteforce_topk"-> (Similarity.s1BruteForceTopK _),
    "s2_lsh_topk"       -> (Similarity.s2LshTopK _),
    "s3_knn_join"       -> ((s, d) => Similarity.s3KnnJoinCollapsed(s, d)),
    "s4_ivf_topk"       -> (Similarity.s4IvfTopK _),
    "s5_filtered_ann"   -> (Similarity.s5FilteredTopK _),
    "s6_recall_eval"    -> (Similarity.s6RecallEval _),
    "s7_tuning_curve"   -> (Similarity.s7TuningCurve _),
    "s8_pq_adc"         -> ((s, d) => Similarity.s8PqAdc(s, d)),
    "s9_pq_trained"     -> ((s, d) => Similarity.s9PqTrained(s, d)),
    "s10_ivf_adc"       -> ((s, d) => Similarity.s10IvfAdc(s, d)),
    "s11_sq8_topk"      -> (Similarity.s11Sq8TopK _),
    "v1_upsert"         -> (Similarity.v1Upsert _),
    "v2_delete_namespace" -> (Similarity.v2DeleteNamespace _),
    "v3_index_stats"    -> (Similarity.v3IndexStats _),
    "v4_label_centroid" -> (Similarity.v4LabelCentroid _),
    "v5_delete_by_ids"  -> (Similarity.v5DeleteByIds _),
    "t1_token_count"    -> (TextAnalysis.t1TokenCount _),
    "t2_quality_score"  -> (TextAnalysis.t2QualityScore _),
    "t3_lang_id"        -> (TextAnalysis.t3LangId _),
    "t4_fingerprint"    -> (TextAnalysis.t4Fingerprint _),
    "t5_chunking"       -> (TextAnalysis.t5Chunking _),
    "t6_recursive_chunk"-> (TextAnalysis.t6RecursiveChunk _),
    "t7_redact"         -> (TextAnalysis.t7Redact _),
    "t8_gopher_quality" -> (Quality.t8GopherQuality _),
    "t9_repetition"     -> (Quality.t9Repetition _),
    "t10_contamination" -> (Quality.t10Contamination _),
    "t11_vocab_topk"    -> (Quality.t11VocabTopK _),
    "t12_tfidf"         -> (Quality.t12Tfidf _),
    "t13_pack_sequences"-> (Corpus.t13PackSequences _),
    "t14_mixture_weights" -> (Corpus.t14MixtureWeights _),
    "t15_shard_assign"  -> (Corpus.t15ShardAssign _),
    "t16_apply_mixture" -> (Corpus.t16ApplyMixture _),
    "t17_unigram_lm"    -> (Quality.t17UnigramLm _),
    "t18_fuzzy_decontam" -> (Quality.t18FuzzyDecontam _),
    "t19_dsir_weights"  -> (Quality.t19DsirWeights _),
    "t20_ccnet_buckets" -> (Quality.t20CcnetBuckets _),
    "t21_bpe_count"     -> (TextAnalysis.t21BpeCount _),
    "t22_bpe_cost"      -> (TextAnalysis.t22BpeCost _),
    "t23_bpe_train"     -> (TextAnalysis.t23BpeTrain _),
    "t24_temperature_mix" -> (Corpus.t24TemperatureMix _),
    "t25_domain_screen" -> (Quality.t25DomainScreen _),
    "d1_exact_dedup"    -> (Dedup.d1ExactDedup _),
    "d2_ngram_jaccard"  -> (Dedup.d2NgramJaccardCollapsed _),
    "d3_minhash_lsh"    -> (Dedup.d3MinHashLsh _),
    "d4_simhash"        -> (Dedup.d4SimHash _),
    "d5_embedding_neardup" -> ((s, d) => Dedup.d5EmbeddingNearDupCollapsedSalted(s, d)),
    "d6_winnowing"      -> (Dedup.d6WinnowingCollapsed _),
    "d7_dup_clusters"   -> (Dedup.d7DupClusters _),
    "d8_stratified_sample" -> (Sampling.d8StratifiedSample _),
    "d9_incremental_dedup" -> (Dedup.d9IncrementalDedup _),
    "d10_line_dedup"    -> (Dedup.d10LineDedup _),
    // registered default is the salted dominance join — identical output
    // to the broadcast form (spec-asserted), nothing corpus-sized broadcast
    "d11_semantic_dedup" -> ((s, dir) => Dedup.d11SemanticDedupSalted(s, dir)),
    "d12_fuzzy_dedup"   -> (Dedup.d12FuzzyDedup _),
    "d13_split_leakage" -> (Dedup.d13SplitLeakage _),
    "d14_cluster_split" -> (Dedup.d14ClusterSplit _),
    "d15_bloom_dedup"   -> (Dedup.d15BloomDedup _),
    "d16_dup_profile"   -> (Dedup.d16DupProfile _),
    "d17_substring_dedup" -> (Dedup.d17SubstringDedup _),
    "d18_cluster_rep"   -> (Dedup.d18ClusterRep _),
    "d19_banding_curve" -> (Dedup.d19BandingCurve _),
    "d20_dup_passages"  -> (Dedup.d20DupPassages _),
    "p1_pipeline_budget" -> (Corpus.p1PipelineBudget _),
    "p2_dataset_card"   -> (Corpus.p2DatasetCard _),
    "p3_pretraining_cut" -> (Corpus.p3PretrainingCut _),
    "e1_sessionize"     -> (Events.e1Sessionize _),
    "e2_tumbling_window"-> (Events.e2TumblingWindow _),
    "e3_funnel"         -> (Events.e3Funnel _),
    "e4_retention"      -> (Events.e4Retention _),
    "e5_event_paths"    -> (Events.e5EventPaths _),
    "e6_spike_days"     -> (Events.e6SpikeDays _),
    "e7_wau"            -> (Events.e7Wau _),
    "e8_debounce"       -> (Events.e8Debounce _),
    "e9_churn"          -> (Events.e9Churn _),
    "e10_anomaly_days"  -> (Events.e10AnomalyDays _),
    "e11_gap_percentiles" -> (Events.e11GapPercentiles _),
    "m1_binary_meta"    -> (Multimodal.m1BinaryMeta _),
    "m2_frame_sample"   -> (Multimodal.m2FrameSample _),
    "m3_semantic_dedup" -> ((s, dir) => Multimodal.m3SemanticDedup(s, dir)),
    "a1_hll_bounds"     -> ((s, dir) => Approx.a1HllBounds(s, dir)),
    "a2_quantile_bounds" -> ((s, dir) => Approx.a2QuantileBounds(s, dir)),
    "a3_cms_heavy_hitters" -> (Approx.a3CmsHeavyHitters _),
    "t26_bm25"          -> (Retrieval.t26Bm25 _),
    "s12_mmr"           -> (Similarity.s12MmrRerank _),
    "s13_rrf_hybrid"    -> (Retrieval.s13RrfHybrid _),
    "d21_containment"   -> (Dedup.d21Containment _),
    "a4_hll_union"      -> (Approx.a4HllUnion _),
    "p4_rag_context"    -> (Retrieval.p4RagContext _),
    "t28_novelty"       -> (Dedup.t28Novelty _),
    "m4_phash_neardup"  -> (Multimodal.m4PhashNearDup _),
    "s14_binary_topk"   -> (Similarity.s14BinaryTopK _),
    "s15_external_topk" -> (Similarity.s15ExternalTopK _),
    "s16_external_recall" -> (Similarity.s16ExternalRecall _),
    "t27_bm25_batch"    -> ((s, d) => Retrieval.t27Bm25Batch(s, d)),
    "d22_snapshot_diff" -> (Corpus.d22SnapshotDiff _),
    // same τ-Jaccard contract as d2, candidates via the PPJoin prefix
    // screen instead of per-block all-pairs — the hot-block scale escape,
    // driver-gated against the same oracle (outputs are identical)
    "d23_prefix_jaccard" -> (Dedup.d2PrefixScreened _),
    "d24_fuzzy_incremental" -> (Dedup.d24FuzzyIncremental _),
    "t29_c4_filter"     -> (Quality.t29C4Filter _),
    "s17_external_adc_serve" -> ((s, d) => Similarity.s17ExternalAdcServe(s, d)),
    "t30_bpe_encode"    -> (TextAnalysis.t30BpeEncode _),
    "p5_training_shards" -> (Corpus.p5TrainingShards _),
    "a5_hist_union"     -> ((s, d) => Approx.a5HistUnion(s, d)),
    // engine-defined dHash => spec-validated class (d4/d6/t6/m4): no
    // oracle row by design, the driver records a rows-only check
    "m5_incremental_phash" -> (Multimodal.m5IncrementalPhash _),
    "q42_cascade_delete" -> (Mutations.q42CascadeDelete _),
    "t31_pii_scan"      -> (TextAnalysis.t31PiiScan _),
    "t32_tokenizer_fertility" -> (TextAnalysis.t32TokenizerFertility _),
    "d25_proto_prune"   -> (Dedup.d25ProtoPrune _),
    "t33_bigram_lm"     -> (Quality.t33BigramLm _),
    "s18_range_search"  -> (Similarity.s18RangeSearch _),
    "p6_rag_index_build" -> (Retrieval.p6RagIndexBuild _),
    "e12_markov_transitions" -> (Events.e12MarkovTransitions _),
  )

  /** DuckDB-equivalent SQL per query key (same column names + ORDER BY —
    * the driver sorts columns by name and hash-compares values). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | cast(sum(cast(l_quantity AS decimal(18,2))) AS double) AS sum_qty,
        | cast(sum(cast(l_extendedprice AS decimal(18,2))) AS double) AS sum_base_price,
        | cast(sum(cast(l_extendedprice AS decimal(18,2)) * (1 - cast(l_discount AS decimal(18,2)))) AS double) AS sum_disc_price,
        | count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
        |  AND o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin,
    "q3_join_group_sort" ->
      """SELECT year(ts) AS y, month(ts) AS m, dayofmonth(ts) AS d, user_id, c_name,
        | cast(sum(cast(value AS decimal(18,2))) AS double) AS total_value,
        | count(*) AS cnt
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY 1, 2, 3, 4, 5
        |ORDER BY y, m, d, user_id""".stripMargin,
    "q4_global_rollup" ->
      """SELECT cast(sum(cast(value AS decimal(18,2))) AS double) AS total_value,
        | count(*) AS total_events,
        | count(DISTINCT user_id) AS distinct_users
        |FROM events""".stripMargin,
    "q5_topn" ->
      """SELECT n_name,
        | cast(sum(cast(value AS decimal(18,2))) AS double) AS total_value,
        | count(*) AS total_events
        |FROM events JOIN customer ON user_id = c_custkey
        |            JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY total_value DESC, n_name LIMIT 10""".stripMargin,
    "q6_pagination" ->
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |ORDER BY o_orderdate DESC, o_orderkey ASC LIMIT 10 OFFSET 20""".stripMargin,
    "q7_search_regex" ->
      """SELECT p_brand, count(*) AS cnt FROM part
        |WHERE regexp_matches(lower(p_name), '(green|blue)')
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q8_semijoin_in" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin,
    "q9_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1995-07-01')
        |ORDER BY c_custkey""".stripMargin,
    "q10_distinct_count" ->
      """SELECT event_type, count(DISTINCT user_id) AS distinct_users, count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q11_latest_per_key" ->
      """SELECT user_id, event_id, event_type, value FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
        |ORDER BY user_id""".stripMargin,
    "q12_cost_calc" ->
      """WITH e AS (
        | SELECT event_type,
        |  CASE WHEN event_type IN ('click','view','purchase') THEN 'openai'
        |       WHEN event_type = 'signup' THEN 'gemini'
        |       ELSE 'claude' END AS provider,
        |  cast(value AS decimal(18,2)) AS in_tok,
        |  cast(floor(value / 2) AS decimal(18,2)) AS out_tok,
        |  cast(coalesce(in_price, 0.01) AS decimal(18,4)) AS in_price,
        |  cast(coalesce(out_price, 0.01) AS decimal(18,4)) AS out_price
        | FROM events LEFT JOIN (VALUES ('click',0.50,1.50),('view',0.25,0.75),
        |                               ('purchase',5.00,15.00)) AS p(model,in_price,out_price)
        |   ON event_type = model),
        |g AS (
        | SELECT event_type, provider,
        |  cast(sum(cast(in_tok + out_tok AS decimal(28,6))) AS double) AS total_tokens,
        |  cast(sum(cast(in_tok * in_price + out_tok * out_price AS decimal(28,6))) AS decimal(28,6)) AS blended_sum
        | FROM e GROUP BY event_type, provider)
        |SELECT event_type, provider, total_tokens,
        | CASE WHEN provider = 'openai'
        |        THEN cast(blended_sum * cast(0.001 AS decimal(4,3)) AS double)
        |      WHEN provider = 'gemini' THEN cast(blended_sum AS double)
        |      ELSE 0.0 END AS total_cost
        |FROM g ORDER BY event_type""".stripMargin,
    "q13_sql" ->
      """SELECT n.n_name AS nation, count(*) AS customers,
        | cast(sum(cast(c.c_acctbal AS decimal(18,2))) AS double) AS total_acctbal
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin,
    "q14_multijoin"     -> Analytics.q14Sql,
    "q15_percentiles"   -> Analytics.q15Sql,
    "q16_rollup"        -> Analytics.q16Sql,
    "q17_json"          -> Analytics.q17Sql,
    "q18_asof"          -> Analytics.q18Sql,
    "q19_moving_avg"    -> Analytics.q19Sql,
    "q20_set_ops"       -> Analytics.q20Sql,
    "q21_array_agg"     -> Analytics.q21Sql,
    "q22_or_exists"     -> Relational.q22Sql,
    "q23_patch_update"  -> Mutations.q23Sql,
    "q24_dml"           -> Mutations.q24Sql,
    "q25_shipping_priority" -> Warehouse.q25Sql,
    "q26_bilateral_volume"  -> Warehouse.q26Sql,
    "q27_large_volume_cust" -> Warehouse.q27Sql,
    "q28_group_push"        -> Lookups.q28Sql,
    "q29_left_lookup"       -> Lookups.q29Sql,
    "q30_user_activity_page"-> Lookups.q30Sql,
    "q31_exists_returned"   -> Warehouse.q31Sql,
    "q32_cust_distribution" -> Warehouse.q32Sql,
    "q33_pivot_activity"    -> Analytics.q33Sql,
    "q34_bucket_histogram"  -> Analytics.q34Sql,
    "q35_addtoset_merge"    -> Mutations.q35Sql,
    "q36_page_with_total"   -> Lookups.q36Sql,
    "q37_last_n_per_key"    -> Relational.q37Sql,
    "q38_small_qty_revenue" -> Warehouse.q38Sql,
    "q39_cube"          -> Analytics.q39Sql,
    "q40_share_of_day"  -> Analytics.q40Sql,
    "q41_scd2_intervals"-> Mutations.q41Sql,
    "s1_bruteforce_topk"  -> Similarity.s1Sql,
    "s2_lsh_topk"         -> Similarity.s2Sql,
    "s3_knn_join"         -> Similarity.s3Sql,
    "s4_ivf_topk"         -> Similarity.s4Sql,
    "s5_filtered_ann"     -> Similarity.s5Sql,
    "s6_recall_eval"      -> Similarity.s6Sql,
    "s7_tuning_curve"     -> Similarity.s7Sql,
    "s8_pq_adc"           -> Similarity.s8Sql,
    "s9_pq_trained"       -> Similarity.s9Sql,
    "s10_ivf_adc"         -> Similarity.s10Sql,
    "s11_sq8_topk"        -> Similarity.s11Sql,
    "v1_upsert"           -> Similarity.v1Sql,
    "v2_delete_namespace" -> Similarity.v2Sql,
    "v5_delete_by_ids"  -> Similarity.v5Sql,
    "v3_index_stats"      -> Similarity.v3Sql,
    "v4_label_centroid"   -> Similarity.v4Sql,
    "t1_token_count"    -> TextAnalysis.t1Sql,
    "t2_quality_score"  -> TextAnalysis.t2Sql,
    "t3_lang_id"        -> TextAnalysis.t3Sql,
    "t4_fingerprint"    -> TextAnalysis.t4Sql,
    "t5_chunking"       -> TextAnalysis.t5Sql,
    "t7_redact"         -> TextAnalysis.t7Sql,
    "t8_gopher_quality" -> Quality.t8Sql,
    "t9_repetition"     -> Quality.t9Sql,
    "t10_contamination" -> Quality.t10Sql,
    "t11_vocab_topk"    -> Quality.t11Sql,
    "t12_tfidf"         -> Quality.t12Sql,
    "t13_pack_sequences"-> Corpus.t13Sql,
    "t14_mixture_weights" -> Corpus.t14Sql,
    "t15_shard_assign"  -> Corpus.t15Sql,
    "t16_apply_mixture" -> Corpus.t16Sql,
    "t17_unigram_lm"    -> Quality.t17Sql,
    "t18_fuzzy_decontam" -> Quality.t18Sql,
    "t19_dsir_weights"  -> Quality.t19Sql,
    "t20_ccnet_buckets" -> Quality.t20Sql,
    "t21_bpe_count"     -> TextAnalysis.t21Sql,
    "t22_bpe_cost"      -> TextAnalysis.t22Sql,
    "t23_bpe_train"     -> TextAnalysis.t23Sql,
    "t24_temperature_mix" -> Corpus.t24Sql,
    "t25_domain_screen" -> Quality.t25Sql,
    "d1_exact_dedup"    -> Dedup.d1Sql,
    "d2_ngram_jaccard"  -> Dedup.d2Sql,
    "d3_minhash_lsh"    -> Dedup.d3Sql,
    "d5_embedding_neardup" -> Dedup.d5Sql,
    "d7_dup_clusters"   -> Dedup.d7Sql,
    "d8_stratified_sample" -> Sampling.d8Sql,
    "d9_incremental_dedup" -> Dedup.d9Sql,
    "d10_line_dedup"    -> Dedup.d10Sql,
    "d11_semantic_dedup" -> Dedup.d11Sql,
    "d12_fuzzy_dedup"   -> Dedup.d12Sql,
    "d13_split_leakage" -> Dedup.d13Sql,
    "d14_cluster_split" -> Dedup.d14Sql,
    "d15_bloom_dedup"   -> Dedup.d15Sql,
    "d16_dup_profile"   -> Dedup.d16Sql,
    "d17_substring_dedup" -> Dedup.d17Sql,
    "d18_cluster_rep"   -> Dedup.d18Sql,
    "d19_banding_curve" -> Dedup.d19Sql,
    "d20_dup_passages"  -> Dedup.d20Sql,
    "p1_pipeline_budget" -> Corpus.p1Sql,
    "p2_dataset_card"   -> Corpus.p2Sql,
    "p3_pretraining_cut" -> Corpus.p3Sql,
    "e1_sessionize"     -> Events.e1Sql,
    "e2_tumbling_window"-> Events.e2Sql,
    "e3_funnel"         -> Events.e3Sql,
    "e4_retention"      -> Events.e4Sql,
    "e5_event_paths"    -> Events.e5Sql,
    "e6_spike_days"     -> Events.e6Sql,
    "e7_wau"            -> Events.e7Sql,
    "e8_debounce"       -> Events.e8Sql,
    "e9_churn"          -> Events.e9Sql,
    "e10_anomaly_days"  -> Events.e10Sql,
    "e11_gap_percentiles" -> Events.e11Sql,
    "m1_binary_meta"    -> Multimodal.m1Sql,
    "m2_frame_sample"   -> Multimodal.m2Sql,
    "m3_semantic_dedup" -> Multimodal.m3Sql,
    "a1_hll_bounds"     -> Approx.a1Sql,
    "a2_quantile_bounds" -> Approx.a2Sql,
    "a3_cms_heavy_hitters" -> Approx.a3Sql,
    "t26_bm25"          -> Retrieval.t26Sql,
    "s12_mmr"           -> Similarity.s12Sql,
    "s13_rrf_hybrid"    -> Retrieval.s13Sql,
    "d21_containment"   -> Dedup.d21Sql,
    "a4_hll_union"      -> Approx.a4Sql,
    "p4_rag_context"    -> Retrieval.p4Sql,
    "t28_novelty"       -> Dedup.t28Sql,
    "s14_binary_topk"   -> Similarity.s14Sql,
    "s15_external_topk" -> Similarity.s15Sql,
    "s16_external_recall" -> Similarity.s16Sql,
    "t27_bm25_batch"    -> Retrieval.t27Sql,
    "d22_snapshot_diff" -> Corpus.d22Sql,
    "d23_prefix_jaccard" -> Dedup.d2Sql,
    "d24_fuzzy_incremental" -> Dedup.d24Sql,
    "t29_c4_filter"     -> Quality.t29Sql,
    "s17_external_adc_serve" -> Similarity.s17Sql,
    "t30_bpe_encode"    -> TextAnalysis.t30Sql,
    "p5_training_shards" -> Corpus.p5Sql,
    "a5_hist_union"     -> Approx.a5Sql,
    "q42_cascade_delete" -> Mutations.q42Sql,
    "t31_pii_scan"      -> TextAnalysis.t31Sql,
    "t32_tokenizer_fertility" -> TextAnalysis.t32Sql,
    "d25_proto_prune"   -> Dedup.d25Sql,
    "t33_bigram_lm"     -> Quality.t33Sql,
    "s18_range_search"  -> Similarity.s18Sql,
    "p6_rag_index_build" -> Retrieval.p6Sql,
    "e12_markov_transitions" -> Events.e12Sql,
  )
}
