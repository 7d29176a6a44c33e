package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Q-narrowed sf1 oracle replay for the two ANN queries whose full
  * DuckDB oracles do not fit the sandbox at sf1 (knn_recall_audit OOMs
  * RAM, knn_ivfpq exceeds temp disk — both because the oracle
  * materializes the Q×N×M ADC join declaratively). The round-9
  * directive: shrink Q until the oracle fits, so the two queries get
  * SOME oracle evidence at 10× the bench scale instead of staying
  * pinned at sf0.01.
  *
  * The narrowing is a pure post-predicate `query_id % mod = 0` applied
  * identically to BOTH engines — the Spark plan keeps the exact
  * production operators (the filter prunes the broadcast query batch
  * before the scan on the Spark side, and DuckDB pushes it through the
  * window/joins on the oracle side), so what is compared is the
  * unmodified per-query pipeline over a 1/`mod`-sample of the serving
  * batch. knn_recall_audit's two aggregate rows are recomputed over
  * the narrowed pair sets with the same hit-join arithmetic as the
  * production audit (Similarity.knnRecallAudit).
  *
  * Output follows the Verify protocol (per-query parquet +
  * oracle_sql.json) so scripts/compare.py runs unchanged.
  *
  * Usage: runMain graft.tools.NarrowReplay <sfDir> <outDir> [mod=1000]
  */
object NarrowReplay {

  private def narrowSql(sql: String, mod: Long): String =
    s"SELECT * FROM (\n$sql\n) WHERE query_id % $mod = 0"

  /** knn_ivfpq restricted to the narrowed serving batch. */
  def knnIvfpqNarrow(spark: SparkSession, dir: String, mod: Long): DataFrame =
    Similarity.knnIvfPq(spark, dir).filter(col("query_id") % mod === 0)

  def knnIvfpqNarrowSql(mod: Long): String =
    narrowSql(Similarity.knnIvfPqSql, mod)

  /** knn_recall_audit recomputed over the narrowed query sample: recall
    * of each ANN method against exact brute force, same hit-join as the
    * production audit. */
  def knnRecallAuditNarrow(spark: SparkSession, dir: String, mod: Long): DataFrame = {
    val brute = Similarity.knnBrute(spark, dir)
      .filter(col("query_id") % mod === 0)
      .select(col("query_id"), col("neighbor_id")).persist()
    val nPairs = brute.agg(count(lit(1)).as("n_pairs"))
    def methodRow(name: String, df: DataFrame): DataFrame =
      df.filter(col("query_id") % mod === 0)
        .select(col("query_id"), col("neighbor_id"))
        .join(brute, Seq("query_id", "neighbor_id"))
        .agg(count(lit(1)).as("n_hits"))
        .crossJoin(broadcast(nPairs))
        .select(lit(name).as("method"), col("n_pairs"), col("n_hits"),
          (col("n_hits").cast("double") / col("n_pairs")).as("recall_at_k"))
    methodRow("knn_ivfpq", Similarity.knnIvfPq(spark, dir))
      .unionByName(methodRow("knn_lsh", Similarity.knnLsh(spark, dir)))
      .orderBy(col("method"))
  }

  def knnRecallAuditNarrowSql(mod: Long): String = {
    def methodSql(name: String, sql: String): String =
      s"""SELECT '$name' AS method,
        |  (SELECT COUNT(*) FROM brute) AS n_pairs,
        |  (SELECT COUNT(*) FROM (SELECT query_id, neighbor_id FROM (${narrowSql(sql, mod)})) a
        |     JOIN brute b ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id)
        |    AS n_hits""".stripMargin
    s"""WITH brute AS (SELECT query_id, neighbor_id FROM (${narrowSql(Similarity.knnBruteSql, mod)}))
      |SELECT method, n_pairs, n_hits,
      |  CAST(n_hits AS DOUBLE) / n_pairs AS recall_at_k
      |FROM (
      |${methodSql("knn_ivfpq", Similarity.knnIvfPqSql)}
      |UNION ALL
      |${methodSql("knn_lsh", Similarity.knnLshSql)}
      |)
      |ORDER BY method""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, mod) = args match {
      case Array(s, o)    => (s, o, 1000L)
      case Array(s, o, m) => (s, o, m.toLong)
      case _ =>
        System.err.println("usage: graft.tools.NarrowReplay <sfDir> <outDir> [mod=1000]")
        sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val queries: Map[String, DataFrame] = Map(
      "knn_ivfpq_narrow" -> knnIvfpqNarrow(spark, sfDir, mod),
      "knn_recall_audit_narrow" -> knnRecallAuditNarrow(spark, sfDir, mod))
    queries.foreach { case (name, df) =>
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      spark.catalog.clearCache()
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val sqls = Map(
      "knn_ivfpq_narrow" -> knnIvfpqNarrowSql(mod),
      "knn_recall_audit_narrow" -> knnRecallAuditNarrowSql(mod))
    val json = sqls.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
