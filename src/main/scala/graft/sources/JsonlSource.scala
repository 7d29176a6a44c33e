package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines corpus ingestion — the de-facto interchange format of
  * web-scale text corpora (one JSON document per line: id, text,
  * source/url metadata). The LLM-side twin of [[FeedSource]]'s CSV
  * discipline, with the same scale rules:
  *
  *  - explicit schema, never `inferSchema` (a second full pass of a
  *    100 TB dump just to guess types);
  *  - PERMISSIVE parse with `_corrupt` capture — a torn or truncated
  *    line quarantines instead of failing the load, and the raw line
  *    is preserved for repair;
  *  - a shard ledger (per input file: rows, corrupt rows, byte volume)
  *    so ingestion is auditable shard-by-shard, like the reference's
  *    batch_control ledger.
  *
  * The corrupt-capture interaction with column pruning applies here as
  * in CSV: a JSON field that is never referenced is never parsed, so
  * its type errors don't reach `_corrupt`. `shardLedger` aggregates
  * every data column for that reason. (Spark additionally refuses a
  * query that references ONLY the corrupt column of a raw JSON scan —
  * keep a data column in any quarantine inspection query.) */
object JsonlSource {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("source", StringType),
    StructField("lang", StringType),
    StructField("_corrupt", StringType)))

  /** Read every `*.jsonl` shard under `dir`. */
  def readCorpus(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema(docSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(s"$dir/*.jsonl")
      .withColumn("shard", regexp_extract(input_file_name(), "([^/]+)\\.jsonl", 1))

  /** Clean documents only (the corpus a pipeline consumes). */
  def cleanDocs(corpus: DataFrame): DataFrame =
    corpus.filter(col("_corrupt").isNull && col("doc_id").isNotNull)
      .select(col("doc_id"), col("text"), col("source"), col("lang"))

  /** Per-shard ingestion ledger: row / corrupt / null-field counts and
    * text byte volume. Every data column is aggregated so JSON column
    * pruning cannot hide a field's parse errors from `_corrupt`. */
  def shardLedger(corpus: DataFrame): DataFrame =
    corpus.groupBy(col("shard"))
      .agg(
        count(lit(1)).as("row_count"),
        count(col("_corrupt")).as("corrupt_rows"),
        count(col("doc_id")).as("doc_id_rows"),
        count(col("text")).as("text_rows"),
        count(col("source")).as("source_rows"),
        count(col("lang")).as("lang_rows"),
        sum(octet_length(col("text"))).as("text_bytes")) // UTF-8 bytes, not chars
      .withColumn("status",
        when(col("corrupt_rows") > 0, "FAILED").otherwise("COMPLETED"))
}
