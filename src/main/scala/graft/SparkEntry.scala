package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.Analytics
import graft.queries.{OracleSql, Q}

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  * Every `queries` key with an `oracleSql` entry is hash-checked against
  * DuckDB; the rest get a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // analytics / streaming-batch backbone
    "q1_agg" -> (Analytics.q1 _),
    "q3_join" -> (Analytics.q3 _),
    "q5_multijoin" -> (Analytics.q5 _),
    "q4_semijoin" -> (Analytics.q4 _),
    "q6_filter" -> (Analytics.q6 _),
    "q12_condagg" -> (Analytics.q12 _),
    "q14_promo" -> (Analytics.q14 _),
    "q7_volume" -> (Analytics.q7 _),
    "q10_returns" -> (Analytics.q10 _),
    "q13_custdist" -> (Analytics.q13 _),
    "q17_smallqty" -> (Analytics.q17 _),
    "q18_bigorders" -> (Analytics.q18 _),
    "q19_disjunct" -> (Analytics.q19 _),
    "q15_topsupplier" -> (Analytics.q15 _),
    "q8_marketshare" -> (Analytics.q8 _),
    "q9_profit" -> (Analytics.q9 _),
    "q21_waiting" -> (Analytics.q21 _),
    "events_anomaly" -> (Analytics.eventsAnomaly _),
    "events_anomaly_robust" -> (Analytics.eventsAnomalyRobust _),
    "events_heatmap" -> (Analytics.eventsHeatmap _),
    "events_json" -> (Analytics.eventsJson _),
    "asof_join" -> (Q.asofJoin _),
    "asof_nearest" -> (Q.asofNearest _),
    "profile_numeric" -> (graft.analytics.Profile.lineitemProfile _),
    "profile_categorical" -> (graft.analytics.Profile.customerCategoricalProfile _),
    "topn_window" -> (Analytics.topnPerGroup(_, _)),
    "events_sessionize" -> (Analytics.sessionize(_, _)),
    "events_window" -> (Analytics.eventsWindow _),
    "events_funnel" -> (Analytics.eventsFunnel _),
    "events_cohort" -> (Analytics.eventsCohort _),
    "events_rolling" -> (Analytics.eventsRolling _),
    "events_gap_fill" -> (Analytics.eventsGapFill _),
    "events_stickiness" -> (Analytics.eventsStickiness _),
    "events_markov" -> (Analytics.eventsMarkov _),
    "events_ewma" -> (Analytics.eventsEwma _),
    "range_join" -> (Analytics.promoRangeJoin _),
    "merge_upsert" -> (Q.mergeUpsert _),
    "imp_pool" -> (Q.impPool _),
    "dq_check" -> (Q.dqCheck _),
    "agg_incremental" -> (Q.aggIncremental _),
    "events_path" -> (Analytics.eventsPath _),
    "events_attribution" -> (Q.eventsAttribution _),
    "orders_rfm" -> (Analytics.ordersRfm _),
    "orders_backlog" -> (Analytics.ordersBacklog _),
    "q_basket" -> (Analytics.qBasket _),
    "q22_antijoin" -> (Analytics.q22 _),
    "events_pivot" -> (Analytics.eventsPivot _),
    "q_cube" -> (Analytics.qCube _),
    "q_rollup" -> (Analytics.qRollup _),
    "profile_group_quantiles" -> (graft.analytics.Profile.lineitemGroupQuantiles _),
    "profile_corr" -> (graft.analytics.Profile.lineitemCorr _),
    "profile_drift" -> (Q.profileDrift _),
    // imputer core
    "imp_missing_indicator" -> (Q.impMissingIndicator _),
    "imp_missing_metrics" -> (Q.impMissingMetrics _),
    "imp_missing_patterns" -> (Q.impMissingPatterns _),
    "imp_ffill_bfill" -> (Q.impFfillBfill _),
    "imp_class_threshold" -> (Q.impClassThreshold _),
    "imp_onehot" -> (Q.impOnehot _),
    "imp_minmax_scale" -> (Q.impMinmaxScale _),
    "imp_mean" -> (Q.impMean _),
    "imp_median" -> (Q.impMedian _),
    "imp_mode" -> (Q.impMode _),
    "imp_zscore" -> (Q.impZscore _),
    "imp_trimmed_mean" -> (Q.impTrimmedMean _),
    "imp_constant" -> (Q.impConstant _),
    "imp_interpolate" -> (Q.impInterpolate _),
    "imp_group_mean" -> (Q.impGroupMean _),
    "imp_knn" -> (Q.impKnn _),
    "imp_group_mode" -> (Q.impGroupMode _),
    "imp_regression" -> (Q.impRegression _),
    "imp_iterative" -> (Q.impIterative _),
    "imp_simulation" -> (Q.impSimulation _),
    "imp_select_model" -> (Q.impSelectModel _),
    "imp_variance" -> (Q.impVariance _),
    "imp_feature_matrix" -> (Q.impFeatureMatrix _),
    // text analysis
    "text_tokens" -> (Q.textTokens _),
    "text_pack" -> (Q.textPack _),
    "pipeline_curate" -> (Q.pipelineCurate _),
    "text_quality" -> (Q.textQuality _),
    "text_langid" -> (Q.textLangid _),
    "text_fingerprint" -> (Q.textFingerprint _),
    "text_ngrams" -> (Q.textNgrams _),
    "text_tfidf" -> (Q.textTfidf _),
    "text_scrub" -> (Q.textScrub _),
    "text_boilerplate" -> (Q.textBoilerplate _),
    "text_contamination" -> (Q.textContamination _),
    "text_logprob" -> (Q.textLogprob _),
    "text_chunk" -> (Q.textChunk _),
    "text_repetition" -> (Q.textRepetition _),
    "text_entropy" -> (Q.textEntropy _),
    "text_hashfeat" -> (Q.textHashfeat _),
    "clip_outliers" -> (Q.clipOutliers _),
    // dedup
    "sample_stratified" -> (Q.sampleStratified _),
    "sample_split" -> (Q.sampleSplit _),
    "corpus_shuffle" -> (Q.corpusShuffle _),
    "feat_target_encode" -> (Q.featTargetEncode _),
    "corpus_mix" -> (Q.corpusMix _),
    "dedup_incremental" -> (Q.dedupIncremental _),
    "feat_rank" -> (Q.featRank _),
    "feat_lag" -> (Q.featLag _),
    "feat_bucketize" -> (Q.featBucketize _),
    "hot_keys" -> (Q.hotKeys _),
    "dedup_exact" -> (Q.dedupExact _),
    "dedup_jaccard" -> (Q.dedupJaccard _),
    "dedup_cluster" -> (Q.dedupCluster _),
    "dedup_stats" -> (Q.dedupStats _),
    "dedup_embed" -> (Q.dedupEmbed _),
    // similarity
    "ann_topk" -> (Q.annTopk _),
    "ann_range" -> (Q.annRange _),
    "embed_quantize" -> (Q.embedQuantize _),
    "embed_cluster" -> (Q.embedCluster _),
    // multimodal
    "mm_binary" -> (Q.mmBinary _),
    "mm_dedup" -> (Q.mmDedup _),
    // rows-only: model-based / hash-family / sketch operators
    "profile_approx" -> (graft.analytics.Profile.lineitemProfileApprox _),
    "imp_ml_tree" -> (Q.impMlTree _),
    "imp_als" -> (Q.impAls _),
    "dedup_minhash" -> (Q.dedupMinhash _),
    "pipeline_neardup" -> (Q.pipelineNearDup _),
    "dedup_simhash" -> (Q.dedupSimhash _),
    "ann_lsh" -> (Q.annLsh _),
    "ann_ivf" -> (Q.annIvf _),
    "ann_pq" -> (Q.annPq _),
    "ann_ivfpq" -> (Q.annIvfPq _),
    "embed_pca" -> (Q.embedPca _),
    "embed_cluster_lsh" -> (Q.embedClusterLsh _),
    "mm_features" -> (Q.mmFeatures _),
    "mm_resize" -> (Q.mmResize _),
    "mm_frames" -> (Q.mmFrames _),
    "text_compress" -> (Q.textCompress _),
    "ann_recall" -> (Q.annRecall _),
    "embed_kmeans" -> (Q.embedKmeans _),
    "events_distinct_rollup" -> (Q.eventsDistinctRollup _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] = OracleSql.sql
}
