package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Kafka change-topic ingestion — the deployment path the reference
  * actually runs (Debezium → Kafka topic → sink connector;
  * debezium-connector-config.json routes `dbserver1.public.*`).
  *
  * Discipline encoded here rather than left to callers:
  *  - `startingOffsets=earliest` + a bounded `maxOffsetsPerTrigger`:
  *    an unbounded first micro-batch on a 100 TB backlog is one giant
  *    task set; bounding it turns backfill into steady-state batches.
  *  - `failOnDataLoss=false` left to the CALLER to decide — silently
  *    skipping compacted-away offsets is a correctness choice, not a
  *    default.
  *  - key/value arrive as binary; `decoded()` casts to string and keeps
  *    (topic, partition, offset) — the offset triple is the monotonic
  *    LSN analog every downstream CDC operator keys on.
  *
  * Kafka itself is absent from this container, so `options` only
  * assembles the standard public source options (same pattern as
  * JdbcSource); `decoded` is pure column logic and is ScalaTest-covered
  * on hand-built frames, and the parse stage downstream of it
  * (DebeziumJson.parseEnvelope) is MemoryStream-tested.
  *
  * Embedded-broker attempt (round 9, mirroring the Derby move that
  * closed the JDBC gap): an in-proc round-trip needs BOTH the broker
  * (kafka server or kraft test-kit jars) and Spark's
  * spark-sql-kafka-0-10 connector. Neither exists anywhere in this
  * sandbox — /opt/spark/jars ships no kafka artifact at all, and the
  * offline coursier/ivy caches have zero org.apache.kafka entries
  * (verified by filesystem search; resolution is COURSIER_MODE=offline
  * with no egress, so the dependency cannot be fetched or vendored).
  * The gap therefore stays documented rather than closed: everything
  * from the raw (key, value, topic, partition, offset) frame onward —
  * decode, envelope parse, stateful apply, lake sink, recovery — is
  * tested; only the socket between a live broker and `load()` is not. */
object KafkaSource {

  /** Standard option set for a Debezium change topic subscription. */
  def options(bootstrap: String, topicPattern: String,
              maxOffsetsPerTrigger: Long = 1000000L): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribePattern" -> topicPattern,
    "startingOffsets" -> "earliest",
    "maxOffsetsPerTrigger" -> maxOffsetsPerTrigger.toString)

  /** readStream assembly: `spark.readStream.format("kafka")` with the
    * options above. Untestable without a broker; kept trivially thin. */
  def readTopic(spark: SparkSession, bootstrap: String, topicPattern: String,
                maxOffsetsPerTrigger: Long = 1000000L): DataFrame =
    options(bootstrap, topicPattern, maxOffsetsPerTrigger)
      .foldLeft(spark.readStream.format("kafka")) { case (r, (k, v)) => r.option(k, v) }
      .load()

  /** Decode the raw Kafka frame: binary key/value to strings plus the
    * (topic, partition, offset) coordinates. Works identically on a
    * batch frame (tests) and a streaming frame (deployment). */
  def decoded(raw: DataFrame): DataFrame =
    raw.select(
      col("topic"), col("partition"), col("offset"),
      col("key").cast("string").as("key_json"),
      col("value").cast("string").as("value_json"))
}
