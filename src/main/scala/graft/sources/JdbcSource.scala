package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned JDBC ingestion (reference: the source/target Postgres
  * databases of docker-compose.yml; Debezium reads the WAL, the
  * verifier reads both DBs directly).
  *
  * Discipline encoded here rather than left to callers:
  *  - ALWAYS a partitioned read (partitionColumn/lowerBound/upperBound/
  *    numPartitions) — a bare jdbc() read is a single-task full pull,
  *    which at 100 TB means one executor dragging the whole table.
  *  - `fetchsize` raised from the driver default (Postgres defaults to
  *    materializing the whole result set client-side otherwise).
  *  - pushdown: Spark pushes filters/required columns into the JDBC
  *    query automatically; callers should filter/select on the result
  *    before any action.
  *
  * Integration-tested live against embedded Apache Derby (the one JDBC
  * engine in the Spark distribution): stripe count, bounds-don't-filter
  * semantics, filter/projection pushdown into the JDBC scan, and a
  * write→read round-trip (JdbcIntegrationSpec). */
object JdbcSource {

  def readPartitioned(spark: SparkSession, url: String, table: String,
                      partitionColumn: String, lowerBound: Long, upperBound: Long,
                      numPartitions: Int, props: Properties = new Properties()): DataFrame =
    spark.read
      .option("fetchsize", 10000)
      .jdbc(url, table,
        columnName = partitionColumn,
        lowerBound = lowerBound, upperBound = upperBound,
        numPartitions = numPartitions,
        connectionProperties = props)
}
