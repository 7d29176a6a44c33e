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

  /** Narrow the serving batch INSIDE the oracle SQL: every query-batch
    * site in the knn oracles is the literal `vec_id % 100 = 0` (the
    * isQuery predicate; §6 guard audit confirms the sites), and an
    * outer `WHERE query_id % mod = 0` wrapper does NOT push through
    * DuckDB's window/union pipeline (measured: the full Q×N×M ADC
    * still materializes, 109 GB RAM + 75 GB spill at sf1). Textual
    * narrowing of the batch predicate is what actually shrinks the
    * oracle's work. `mod` must be a multiple of 100 so the narrowed
    * batch is a subset of the production one. */
  private def narrowSql(sql: String, mod: Long): String = {
    require(mod % 100 == 0, s"mod must be a multiple of 100, got $mod")
    val pat = "% 100 = 0"
    require(sql.contains(pat), "expected the query-batch predicate in the oracle SQL")
    sql.replace(pat, s"% $mod = 0")
  }

  /** knn_ivfpq restricted to the narrowed serving batch. */
  def knnIvfpqNarrow(spark: SparkSession, dir: String, mod: Long): DataFrame =
    Similarity.knnIvfPq(spark, dir).filter(col("query_id") % mod === 0)

  /** The knn_ivfpq oracle with (a) the serving batch narrowed to
    * `% mod` and (b) the PQ-encode argmin restructured from
    * join+window (41 M intermediate rows with list payloads at sf1 —
    * the measured >100 GB RAM / >60 GB spill) to a per-row
    * list-argmin over the per-subspace codeword roster: same exact
    * quantized-L2 arithmetic, same lowest-cent_id tiebreak (the
    * roster list is ordered by cent_id and list_position returns the
    * FIRST minimum), memory ∝ N×M rows. Every other CTE is the
    * production oracle's, verbatim. */
  def knnIvfpqNarrowSql(mod: Long): String = {
    import Similarity._
    require(mod % 100 == 0, s"mod must be a multiple of 100, got $mod")
    val centDot = dotSql("n.embedding", "c.ce")
    // quantized dot of s.sv against the captured codeword c.cv
    val lamDot =
      """CAST(list_sum(list_transform(s.sv,
        |  (x, i) -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST((c.cv)[i] AS DOUBLE) * 1e9 + 0.5) AS BIGINT)))
        |  AS BIGINT)""".stripMargin
    val qDot = dotSql("q.sv", "c.cv")
    s"""WITH e AS ($vecsSql),
      |$ivfCentsCteSql,
      |asg AS (
      |  SELECT vec_id, cent_id,
      |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cent_cos DESC, cent_id) AS rnk
      |  FROM (
      |    SELECT n.vec_id, c.cent_id,
      |      CAST($centDot AS DOUBLE) / sqrt(CAST(n.nrm AS DOUBLE) * CAST(c.cn AS DOUBLE)) AS cent_cos
      |    FROM e n CROSS JOIN cents c)
      |),
      |cells AS (SELECT vec_id AS neighbor_id, cent_id FROM asg WHERE rnk = 1),
      |probes AS (SELECT vec_id AS query_id, cent_id FROM asg
      |           WHERE vec_id % $mod = 0 AND vec_id < $QueryCap AND rnk <= $ivfNprobeSubSql),
      |cand AS (
      |  SELECT query_id, neighbor_id FROM probes JOIN cells USING (cent_id)
      |  WHERE neighbor_id <> query_id
      |),
      |subs AS (
      |  SELECT vec_id, m, list_slice(embedding, m * $PqDim + 1, (m + 1) * $PqDim) AS sv
      |  FROM e CROSS JOIN (SELECT unnest(range(0, $PqSub)) AS m)
      |),
      |subn AS (
      |  SELECT vec_id, m, sv,
      |    ${dotSql("sv", "sv")} AS snrm
      |  FROM subs
      |),
      |cb AS (SELECT vec_id AS cent_id, m, sv AS cv, snrm AS cnrm FROM subn
      |       WHERE vec_id % $PqCentMod = 0 AND vec_id < ${PqCentMod.toLong * PqCentCap}),
      |cbl AS (SELECT m, list(struct_pack(cent_id := cent_id, cv := cv, cnrm := cnrm) ORDER BY cent_id) AS cws
      |        FROM cb GROUP BY m),
      |codes AS MATERIALIZED (
      |  -- MATERIALIZED is load-bearing: inlined, the optimizer drags the
      |  -- ~25 KiB cws roster lists through the adc join's 41 M-row
      |  -- intermediate (measured >90 GB RAM); materialized, codes is
      |  -- 160k skinny rows computed once in ~13 s
      |  SELECT vec_id, m, cws[list_position(d2s, list_min(d2s))].cent_id AS code FROM (
      |    SELECT s.vec_id, s.m, cbl.cws,
      |      list_transform(cbl.cws, c -> s.snrm + c.cnrm - 2 * $lamDot) AS d2s
      |    FROM subn s JOIN cbl ON cbl.m = s.m)
      |),
      |adc AS (
      |  SELECT cd.query_id, cd.neighbor_id,
      |    CAST(SUM(q.snrm + c.cnrm - 2 * ($qDot)) AS BIGINT) AS adc_d2
      |  FROM cand cd
      |  JOIN codes t ON t.vec_id = cd.neighbor_id
      |  JOIN subn q ON q.m = t.m AND q.vec_id = cd.query_id
      |  JOIN cb c ON c.m = t.m AND c.cent_id = t.code
      |  GROUP BY 1, 2
      |),
      |shortlist AS (
      |  SELECT query_id, neighbor_id FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY adc_d2, neighbor_id) AS adc_rank
      |    FROM adc)
      |  WHERE adc_rank <= $PqShortlist
      |),
      |scored AS (
      |  SELECT query_id, neighbor_id,
      |    CAST(${dotSql("a.embedding", "b.embedding")} AS DOUBLE) / sqrt(CAST(a.nrm AS DOUBLE) * CAST(b.nrm AS DOUBLE)) AS cos_sim
      |  FROM shortlist JOIN e a ON a.vec_id = query_id JOIN e b ON b.vec_id = neighbor_id
      |)
      |SELECT query_id, neighbor_id,
      |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS knn_rank,
      |  cos_sim
      |FROM scored
      |QUALIFY knn_rank <= $K
      |ORDER BY query_id, knn_rank""".stripMargin
  }

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
    // methodSqlPre takes an ALREADY-narrowed method SQL; methodSql narrows
    def methodSqlPre(name: String, narrowed: String): String =
      s"""SELECT '$name' AS method,
        |  (SELECT COUNT(*) FROM brute) AS n_pairs,
        |  (SELECT COUNT(*) FROM (SELECT query_id, neighbor_id FROM ($narrowed)) a
        |     JOIN brute b ON a.query_id = b.query_id AND a.neighbor_id = b.neighbor_id)
        |    AS n_hits""".stripMargin
    def methodSql(name: String, sql: String): String =
      methodSqlPre(name, narrowSql(sql, mod))
    s"""WITH brute AS (SELECT query_id, neighbor_id FROM (${narrowSql(Similarity.knnBruteSql, mod)}))
      |SELECT method, n_pairs, n_hits,
      |  CAST(n_hits AS DOUBLE) / n_pairs AS recall_at_k
      |FROM (
      |${methodSqlPre("knn_ivfpq", knnIvfpqNarrowSql(mod))}
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
      "knn_recall_audit_narrow" -> knnRecallAuditNarrow(spark, sfDir, mod),
      "knn_truncation_recall_narrow" ->
        Similarity.knnTruncationRecallNarrow(spark, sfDir, mod))
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
      "knn_recall_audit_narrow" -> knnRecallAuditNarrowSql(mod),
      // all four "% 100 = 0" sites in the truncation oracle are
      // query-batch predicates (3 per-width + 1 full-knn), so the
      // textual narrowing applies to each
      "knn_truncation_recall_narrow" ->
        narrowSql(Similarity.knnTruncationRecallSql, mod))
    val json = sqls.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
