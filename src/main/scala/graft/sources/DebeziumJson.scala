package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debezium JSON change-event parsing (SURVEY.md §2.A; reference:
  * debezium-connector-config.json — JsonConverter envelopes, and the
  * `unwrap` ExtractNewRecordState SMT with
  * delete.handling.mode=rewrite).
  *
  * Works identically on a batch DataFrame and a streaming DataFrame
  * (e.g. a Kafka `value` column) — `from_json` is a pure projection, so
  * the parse keeps whole-stage codegen and imposes no shuffle. The
  * output shape plugs straight into CdcOps.latestStateOf /
  * applyLogOf / CdcStream.applyLatest.
  */
object DebeziumJson {

  /** Spark schema for a Debezium envelope whose row payload has schema
    * `row` (reference table: orders(order_id, customer_id, amount,
    * timestamp, batch_id), init-scripts/source/01-init.sql:1-9). */
  def envelopeSchema(row: StructType): StructType = StructType(Seq(
    StructField("before", row),
    StructField("after", row),
    StructField("source", StructType(Seq(
      StructField("lsn", LongType),
      StructField("ts_ms", LongType),
      StructField("db", StringType),
      StructField("schema", StringType),
      StructField("table", StringType)))),
    StructField("op", StringType), // c / u / d / r (snapshot read)
    StructField("ts_ms", LongType)))

  /** The reference's orders-row schema. */
  val ordersRow: StructType = StructType(Seq(
    StructField("order_id", LongType),
    StructField("customer_id", LongType),
    StructField("amount", DoubleType),
    StructField("timestamp", StringType),
    StructField("batch_id", StringType)))

  /** Parse raw Debezium envelopes from a JSON string column into a
    * normalized change-event frame:
    * (key, op I/U/D, lsn, ts_ms, payload struct — after-image, or
    * before-image for deletes). Snapshot reads ('r') normalize to I. */
  def parseEnvelope(df: DataFrame, jsonCol: String, row: StructType,
                    keyField: String): DataFrame = {
    val env = from_json(col(jsonCol), envelopeSchema(row))
    df.withColumn("_e", env)
      .select(
        coalesce(col(s"_e.after.$keyField"), col(s"_e.before.$keyField")).as("key"),
        when(col("_e.op") === "d", "D")
          .when(col("_e.op") === "u", "U")
          .otherwise("I").as("op"),
        col("_e.source.lsn").as("lsn"),
        col("_e.ts_ms").as("ts_ms"),
        coalesce(col("_e.after"), col("_e.before")).as("payload"))
      .filter(col("key").isNotNull)
  }

  /** Parse unwrapped (ExtractNewRecordState, delete.handling.mode=
    * rewrite) records: the row is flattened and deletes carry
    * `__deleted = "true"`. No LSN survives the SMT, so ordering falls to
    * a caller-supplied offset (e.g. the Kafka offset column). */
  def parseUnwrapped(df: DataFrame, jsonCol: String, row: StructType,
                     keyField: String): DataFrame = {
    val withDeleted = StructType(row.fields :+ StructField("__deleted", StringType))
    val rec = from_json(col(jsonCol), withDeleted)
    df.withColumn("_r", rec)
      .select(
        col(s"_r.$keyField").as("key"),
        when(col("_r.__deleted") === "true", "D").otherwise("U").as("op"),
        col("_r").dropFields("__deleted").as("payload"))
      .filter(col("key").isNotNull)
  }
}
