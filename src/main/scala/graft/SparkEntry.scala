package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators.Analytics
import graft.cdc.{CdcOps, Reconcile}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Analytics.q1Agg _),
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
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Analytics.q1AggSql,
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
  )
}
