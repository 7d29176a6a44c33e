package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.{Analytics, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.cdc.{CdcOps, Reconcile}
import graft.streaming.CdcStream

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Analytics.q1Agg _),
    "q2_filter_project" -> (Analytics.q2FilterProject _),
    "q3_join_agg" -> (Analytics.q3JoinAgg _),
    "q4_semi_join" -> (Analytics.q4SemiJoin _),
    "q5_anti_join" -> (Analytics.q5AntiJoin _),
    "q6_window_running" -> (Analytics.q6WindowRunning _),
    "q7_topk_per_group" -> (Analytics.q7TopkPerGroup _),
    "q8_distinct_agg" -> (Analytics.q8DistinctAgg _),
    "q8_approx_distinct" -> (Analytics.q8ApproxDistinct _),
    "q9_rollup" -> (Analytics.q9Rollup _),
    "q10_case_classify" -> (Analytics.q10CaseClassify _),
    "q11_json_extract" -> (Analytics.q11JsonExtract _),
    "q12_sessionize" -> (Analytics.q12Sessionize _),
    "q13_set_ops" -> (Analytics.q13SetOps _),
    "q14_pivot" -> (Analytics.q14Pivot _),
    "q15_cross_like" -> (Analytics.q15CrossLike _),
    "q16_asof_join" -> (Analytics.q16AsofJoin _),
    "q17_percentile" -> (Analytics.q17Percentile _),
    "q18_correlated" -> (Analytics.q18Correlated _),
    "cdc_latest_state" -> (CdcOps.latestState _),
    "cdc_apply_upsert_delete" -> (CdcOps.applyUpsertDelete _),
    "cdc_changelog_stats" -> (CdcOps.changelogStats _),
    "cdc_batch_ledger" -> (CdcOps.batchLedger _),
    "cdc_dedup_events" -> (CdcOps.dedupEvents _),
    "recon_count" -> (Reconcile.reconCount _),
    "recon_row_diff" -> (Reconcile.reconRowDiff _),
    "recon_hash_bucket" -> (Reconcile.reconHashBucket _),
    "batch_status" -> (Reconcile.batchStatus _),
    "latest_batch_status" -> (Reconcile.latestBatchStatus _),
    "multi_table_health" -> (Reconcile.multiTableHealth _),
    "dedup_exact" -> (Dedup.dedupExact _),
    "dedup_ngram_jaccard" -> (Dedup.dedupNgramJaccard _),
    "dedup_minhash" -> (Dedup.dedupMinhash _),
    "dedup_simhash" -> (Dedup.dedupSimhash _),
    "dedup_embedding" -> (Similarity.dedupEmbedding _),
    "knn_brute" -> (Similarity.knnBrute _),
    "knn_lsh" -> (Similarity.knnLsh _),
    "knn_ivf" -> (Similarity.knnIvf _),
    "text_langid" -> (TextAnalysis.textLangid _),
    "text_quality" -> (TextAnalysis.textQuality _),
    "text_tokens" -> (TextAnalysis.textTokens _),
    "text_fingerprint" -> (TextAnalysis.textFingerprint _),
    "mm_features" -> (Multimodal.mmFeatures _),
    "stream_cdc_apply" -> (CdcStream.streamCdcApply _),
    "stream_window_agg" -> (CdcStream.streamWindowAgg _),
    "stream_sessionize" -> (CdcStream.streamSessionize _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Analytics.q1AggSql,
    "q2_filter_project" -> Analytics.q2FilterProjectSql,
    "q3_join_agg" -> Analytics.q3JoinAggSql,
    "q4_semi_join" -> Analytics.q4SemiJoinSql,
    "q5_anti_join" -> Analytics.q5AntiJoinSql,
    "q6_window_running" -> Analytics.q6WindowRunningSql,
    "q7_topk_per_group" -> Analytics.q7TopkPerGroupSql,
    "q8_distinct_agg" -> Analytics.q8DistinctAggSql,
    "q9_rollup" -> Analytics.q9RollupSql,
    "q10_case_classify" -> Analytics.q10CaseClassifySql,
    "q11_json_extract" -> Analytics.q11JsonExtractSql,
    "q12_sessionize" -> Analytics.q12SessionizeSql,
    "q13_set_ops" -> Analytics.q13SetOpsSql,
    "q14_pivot" -> Analytics.q14PivotSql,
    "q15_cross_like" -> Analytics.q15CrossLikeSql,
    "q16_asof_join" -> Analytics.q16AsofJoinSql,
    "q17_percentile" -> Analytics.q17PercentileSql,
    "q18_correlated" -> Analytics.q18CorrelatedSql,
    "cdc_latest_state" -> CdcOps.latestStateSql,
    "cdc_apply_upsert_delete" -> CdcOps.applyUpsertDeleteSql,
    "cdc_changelog_stats" -> CdcOps.changelogStatsSql,
    "cdc_batch_ledger" -> CdcOps.batchLedgerSql,
    "cdc_dedup_events" -> CdcOps.dedupEventsSql,
    "recon_count" -> Reconcile.reconCountSql,
    "recon_row_diff" -> Reconcile.reconRowDiffSql,
    "recon_hash_bucket" -> Reconcile.reconHashBucketSql,
    "batch_status" -> Reconcile.batchStatusSql,
    "latest_batch_status" -> Reconcile.latestBatchStatusSql,
    "multi_table_health" -> Reconcile.multiTableHealthSql,
    "dedup_exact" -> Dedup.dedupExactSql,
    "dedup_ngram_jaccard" -> Dedup.dedupNgramJaccardSql,
    "dedup_embedding" -> Similarity.dedupEmbeddingSql,
    "knn_brute" -> Similarity.knnBruteSql,
    "text_langid" -> TextAnalysis.textLangidSql,
    "text_quality" -> TextAnalysis.textQualitySql,
    "text_tokens" -> TextAnalysis.textTokensSql,
    "text_fingerprint" -> TextAnalysis.textFingerprintSql,
  )
}
