package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{Prefix, Tables}

/** Relational analytics core (SURVEY.md §2.C) — the generalized SQL
  * machinery of the reference's monitoring queries (CTEs, window
  * functions, CASE classification, joins incl. cross join, LIKE matching,
  * aggregates, priority ordering; see
  * check_multiple_tables_replication_status.sql).
  *
  * Determinism discipline for the DuckDB oracle: double-typed money
  * aggregates are summed as exact integral cents
  * (`floor(x*100 + 0.5)` per row, then an associative long sum, then one
  * final division) so the result is bit-identical regardless of
  * aggregation order on either engine. See SURVEY.md §6.
  */
object Analytics {

  /** Per-row exact cents: floor(x*100 + 0.5) as long. Deterministic IEEE
    * ops identical across engines; the long sum is order-independent. */
  private[graft] def cents(c: Column): Column =
    floor(c * lit(100d) + lit(0.5d)).cast("long")

  /** Exact money sum: sum of integral cents / 100.0 (one final fp divide). */
  private[graft] def moneySum(c: Column): Column = sum(cents(c)) / lit(100d)

  /** q1_agg — TPC-H Q1 shape: filtered grouped aggregation over lineitem.
    * Pricing summary by returnflag/linestatus. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("sum_disc_price"),
        avg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  SUM(l_quantity) AS sum_qty,
      |  SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) / 100.0 AS sum_base_price,
      |  SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT)) / 100.0 AS sum_disc_price,
      |  AVG(l_quantity) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q2_filter_project — predicate + projection, both pushed to the scan
    * (`PushedFilters` + 4-column `ReadSchema`; checked in AnalyticsSpec). */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp") &&
              col("l_discount") >= 0.05d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q2FilterProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount >= 0.05
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q3_join_agg — 3-way join (orders fact × customer × nation dims) +
    * group + top-N. `nation` is broadcast (tiny); orders⋈customer is the
    * one shuffle. Deterministic top-10 via exact-cents revenue + name
    * tiebreak. */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_totalprice"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(moneySum(col("o_totalprice")).as("revenue"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("revenue").desc, col("n_name"))
      .limit(10)
  }

  val q3JoinAggSql: String =
    """SELECT n_name,
      |  SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name
      |LIMIT 10""".stripMargin

  /** q4_semi_join — EXISTS as left-semi: orders having a high-quantity
    * line item. Semi join never duplicates or widens the left side. */
  def q4SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_totalprice"))
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") >= 49d).select(col("l_orderkey"))
    o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .orderBy(col("o_orderkey"))
  }

  val q4SemiJoinSql: String =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
      |ORDER BY o_orderkey""".stripMargin

  /** q5_anti_join — NOT EXISTS as left-anti: customers with no urgent
    * order. The filter on the right side is applied before the join, so
    * the anti join probes a reduced build side. */
  def q5AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .orderBy(col("c_custkey"))
  }

  val q5AntiJoinSql: String =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** q6_window_running — per-customer order sequence: row_number and
    * running total. The running sum accumulates exact long cents (an
    * order-dependent double running sum would diverge between engines);
    * each row's output is one long→double division. */
  def q6WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("order_seq", row_number().over(w))
      .withColumn("running_spend",
        sum(cents(col("o_totalprice"))).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)) / lit(100d))
      .select(col("o_custkey"), col("o_orderkey"), col("order_seq"), col("running_spend"))
      .orderBy(col("o_custkey"), col("order_seq"))
  }

  val q6WindowRunningSql: String =
    """SELECT o_custkey, o_orderkey,
      |  ROW_NUMBER() OVER w AS order_seq,
      |  SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0 AS running_spend
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, order_seq""".stripMargin

  /** q7_topk_per_group — top-3 orders by price per customer. row_number
    * (not rank) with a key tiebreak so the top-k set is deterministic. */
  def q7TopkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("price_rank", row_number().over(w))
      .filter(col("price_rank") <= 3)
      .orderBy(col("o_custkey"), col("price_rank"))
  }

  val q7TopkPerGroupSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, price_rank
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
      |      FROM orders)
      |WHERE price_rank <= 3
      |ORDER BY o_custkey, price_rank""".stripMargin

  /** q8_distinct_agg — exact count-distinct per group (two-phase
    * distinct aggregation; Catalyst expands to a partial dedup then
    * count). The HLL approx variant is `q8_approx_distinct` (rows-only —
    * sketch internals are engine-specific). */
  def q8DistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  val q8DistinctAggSql: String =
    """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q8_approx_distinct — approx_count_distinct (HyperLogLog++): the
    * constant-memory scale path for distinct counting. Rows-only (sketches
    * aren't cross-engine comparable); ScalaTest bounds the error vs exact. */
  /** KMV (k-minimum-values) sketch parameters: estimate ≈ (k-1)·P / h_k
    * where h_k is the k-th smallest hash — σ ≈ 1/√k ≈ 6%. Hash is an
    * affine permutation of the key mod the shared sketch prime, so the
    * DuckDB oracle replays the sketch EXACTLY (Spark's HLL-based
    * approx_count_distinct has engine-specific internals and would be
    * un-oracle-able). Groups smaller than k report exactly. */
  val KmvK = 256
  private val KmvP = 1000000007L

  def q8ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        pmod(col("o_custkey") * 2654435761L + 104729L, lit(KmvP)).as("h"))
      .groupBy(col("o_orderpriority"))
      .agg(org.apache.spark.sql.graftvec.SketchExpressions
        .kmvDistinct(col("h"), KmvK).as("approx_customers"))
      .orderBy(col("o_orderpriority"))

  /** The oracle replays the sketch with a window rank (fine at oracle
    * SF; the Spark side partial-aggregates instead — see KmvDistinct).
    * `//` mirrors JVM long division exactly; a double `/`+FLOOR can
    * round up across an integer boundary at ulp precision. */
  val q8ApproxDistinctSql: String =
    """WITH d AS (SELECT DISTINCT o_orderpriority, o_custkey FROM orders),
      |h AS (SELECT o_orderpriority,
      |        (o_custkey * 2654435761 + 104729) % 1000000007 AS h FROM d),
      |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn FROM h)
      |SELECT o_orderpriority,
      |  CAST(CASE WHEN COUNT(*) < 256 THEN COUNT(*)
      |       ELSE (CAST(255 AS BIGINT) * 1000000007) // (MAX(CASE WHEN rn <= 256 THEN h END) + 1) END AS BIGINT)
      |    AS approx_customers
      |FROM r GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q9_rollup — ROLLUP hierarchy aggregation (priority → status), the
    * GROUPING SETS family. NULL subtotal markers are COALESCE'd to 'ALL'
    * on both engines so row identity is unambiguous. */
  def q9Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("total_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        col("n_orders"), col("total_price"))
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  val q9RollupSql: String =
    """SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
      |  COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
      |  COUNT(*) AS n_orders,
      |  SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) / 100.0 AS total_price
      |FROM orders
      |GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      |ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  /** q10_case_classify — CASE classification + priority ordering: the
    * shape of the reference's health report
    * (check_multiple_tables_replication_status.sql:129-147). */
  def q10CaseClassify(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("size_class",
        when(col("o_totalprice") > 300000d, "LARGE")
          .when(col("o_totalprice") > 150000d, "MEDIUM")
          .otherwise("SMALL"))
      .withColumn("class_rank",
        when(col("size_class") === "LARGE", 1)
          .when(col("size_class") === "MEDIUM", 2).otherwise(3))
      .groupBy(col("size_class"), col("class_rank"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("total_price"))
      .orderBy(col("class_rank"))

  val q10CaseClassifySql: String =
    """SELECT CASE WHEN o_totalprice > 300000 THEN 'LARGE'
      |            WHEN o_totalprice > 150000 THEN 'MEDIUM' ELSE 'SMALL' END AS size_class,
      |  CASE WHEN o_totalprice > 300000 THEN 1
      |       WHEN o_totalprice > 150000 THEN 2 ELSE 3 END AS class_rank,
      |  COUNT(*) AS n_orders,
      |  SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) / 100.0 AS total_price
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY class_rank""".stripMargin

  /** q11_json_extract — JSON field extraction from the events payload
    * (`props` = `{"k": <int>}`), aggregated per event_type. */
  def q11JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
           sum(col("k")).as("sum_k"),
           max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  val q11JsonExtractSql: String =
    """SELECT event_type,
      |  COUNT(k) AS n_with_k, CAST(SUM(k) AS BIGINT) AS sum_k, MAX(k) AS max_k
      |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q12_sessionize — gap-based sessionization: a new session starts when
    * a user is idle > 30 min. lag → boundary flag → running sum = session
    * id (all within one per-user window partition; one shuffle on
    * user_id), then per-session aggregates. */
  def q12Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
      .withColumn("duration_us",
        unix_micros(col("session_end")) - unix_micros(col("session_start")))
      .orderBy(col("user_id"), col("session_id"))
  }

  val q12SessionizeSql: String =
    """WITH flagged AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |), sess AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end,
      |  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
      |FROM sess GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** q13_set_ops — UNION / INTERSECT / EXCEPT over two derived key sets:
    * customers with an urgent order (A) vs high-balance customers (B). */
  def q13SetOps(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey")).distinct()
    val b = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 5000d)
      .select(col("c_custkey").as("custkey")).distinct()
    val tagged =
      a.union(b).distinct().withColumn("set_op", lit("union"))
        .unionByName(a.intersect(b).withColumn("set_op", lit("intersect")))
        .unionByName(a.except(b).withColumn("set_op", lit("except_a_b")))
        .unionByName(b.except(a).withColumn("set_op", lit("except_b_a")))
    tagged.orderBy(col("set_op"), col("custkey"))
  }

  val q13SetOpsSql: String =
    """WITH a AS (SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |b AS (SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000)
      |SELECT custkey, 'union' AS set_op FROM (SELECT custkey FROM a UNION SELECT custkey FROM b)
      |UNION ALL
      |SELECT custkey, 'intersect' FROM (SELECT custkey FROM a INTERSECT SELECT custkey FROM b)
      |UNION ALL
      |SELECT custkey, 'except_a_b' FROM (SELECT custkey FROM a EXCEPT SELECT custkey FROM b)
      |UNION ALL
      |SELECT custkey, 'except_b_a' FROM (SELECT custkey FROM b EXCEPT SELECT custkey FROM a)
      |ORDER BY set_op, custkey""".stripMargin

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q14_pivot — pivot event_type into columns (per-day op-mix matrix; the
    * Kafka-topic monitoring shape). Explicit pivot values keep the output
    * schema static — no extra pass to discover distinct keys. */
  def q14Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, eventTypes)
      .orderBy(col("day"))

  val q14PivotSql: String =
    """SELECT CAST(ts AS DATE) AS day,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events GROUP BY 1 ORDER BY day""".stripMargin

  /** q15_cross_like — cross join + LIKE pattern match: the reference's
    * slot↔publication matching shape (replication slot names LIKE
    * '%table%'). Both sides tiny dims → BroadcastNestedLoopJoin. */
  def q15CrossLike(spark: SparkSession, dir: String): DataFrame = {
    val n = Tables.nation(spark, dir).select(col("n_name"))
    val r = Tables.region(spark, dir).select(col("r_name"))
    n.crossJoin(broadcast(r))
      .withColumn("name_match", expr("n_name LIKE '%' || substr(r_name, 1, 2) || '%'"))
      .orderBy(col("n_name"), col("r_name"))
  }

  val q15CrossLikeSql: String =
    """SELECT n_name, r_name,
      |  n_name LIKE '%' || substr(r_name, 1, 2) || '%' AS name_match
      |FROM nation CROSS JOIN region
      |ORDER BY n_name, r_name""".stripMargin

  /** q17_percentile — exact interpolated percentiles per group (p50/p95
    * of order value by priority). Spark's `percentile` and DuckDB's
    * `quantile_cont` both use linear interpolation on the sorted set —
    * verified bit-identical. The approximate scale path is
    * `approx_percentile` (same family as q8_approx_distinct). */
  def q17Percentile(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("p50_price"),
        expr("percentile(o_totalprice, 0.95)").as("p95_price"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))

  val q17PercentileSql: String =
    """SELECT o_orderpriority,
      |  quantile_cont(o_totalprice, 0.5) AS p50_price,
      |  quantile_cont(o_totalprice, 0.95) AS p95_price,
      |  COUNT(*) AS n_orders
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q18_correlated — correlated-subquery shape: orders priced above
    * 1.5× their customer's average. Decorrelated as an aggregate +
    * equi-join (what Catalyst does to correlated subqueries anyway);
    * the average is exact-cents-derived so both engines compare the
    * same doubles. */
  def q18Correlated(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val avgs = o.groupBy(col("o_custkey"))
      .agg(((sum(cents(col("o_totalprice"))) / lit(100d)) / count(lit(1))).as("cust_avg"))
    o.join(avgs, Seq("o_custkey"))
      .filter(col("o_totalprice") > col("cust_avg") * 1.5d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("cust_avg"))
      .orderBy(col("o_orderkey"))
  }

  val q18CorrelatedSql: String =
    """WITH avgs AS (
      |  SELECT o_custkey,
      |    (SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) / 100.0) / COUNT(*) AS cust_avg
      |  FROM orders GROUP BY o_custkey
      |)
      |SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, avgs.cust_avg
      |FROM orders o JOIN avgs USING (o_custkey)
      |WHERE o.o_totalprice > avgs.cust_avg * 1.5
      |ORDER BY o_orderkey""".stripMargin

  /** q16_asof_join — as-of (nearest-preceding) join, the trades↔quotes
    * shape: each purchase is matched to the user's latest preceding
    * click/view. Implemented scalably as union + per-key window
    * (last non-null over preceding rows) — one shuffle on the key, no
    * range explosion; DuckDB oracles it with native ASOF JOIN.
    * Equal-timestamp quotes are deduped to max event_id; a quote at
    * exactly the purchase ts counts (<=, quote ordered first via tag). */
  def q16AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), lit(1).as("tag"),
              lit(null).cast("long").as("quote_event_id"),
              lit(null).cast("timestamp").as("quote_ts"))
    val quotes = ev.filter(col("event_type").isin("click", "view"))
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("quote_event_id"))
      .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
              lit(0).as("tag"), col("quote_event_id"), col("ts").as("quote_ts"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(quotes)
      .withColumn("asof_event_id", last(col("quote_event_id"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("quote_ts"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("user_id"), col("event_id").as("purchase_event_id"),
              col("ts").as("purchase_ts"), col("asof_event_id"), col("asof_ts"))
      .orderBy(col("user_id"), col("purchase_event_id"))
  }

  /** q19_range_join — non-equi range-containment join: every change event
    * is assigned to its batch by LSN-range containment
    * (`event_id BETWEEN start_lsn AND end_lsn`), the reference's
    * batch_control completion_lsn bookkeeping turned into a join. The
    * ledger side is tiny (one row per batch) → explicitly broadcast, so
    * the plan is a BroadcastNestedLoopJoin: the fact side streams at scan
    * speed with zero shuffle; at 100 TB the ledger is still KB-sized.
    * (With a large range side the scale path is binning both sides to an
    * equi-key — exactly what the batch_id derivation below does.) */
  def q19RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    val mx = ev.agg(max(col("event_id")).as("mx"))
    val ledger = ev.crossJoin(broadcast(mx))
      .withColumn("batch_id", floor(col("event_id") * 10 / (col("mx") + 1)).cast("long"))
      .groupBy(col("batch_id"))
      .agg(min(col("event_id")).as("start_lsn"), max(col("event_id")).as("end_lsn"))
    ev.join(broadcast(ledger),
        col("event_id").between(col("start_lsn"), col("end_lsn")))
      .groupBy(col("batch_id"), col("start_lsn"), col("end_lsn"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_keys"),
        moneySum(col("value")).as("sum_value"))
      .orderBy(col("batch_id"))
  }

  val q19RangeJoinSql: String =
    """WITH mx AS (SELECT MAX(event_id) AS mx FROM events),
      |ledger AS (
      |  SELECT CAST(FLOOR(event_id * 10 / (mx + 1)) AS BIGINT) AS batch_id,
      |    MIN(event_id) AS start_lsn, MAX(event_id) AS end_lsn
      |  FROM events, mx GROUP BY 1
      |)
      |SELECT l.batch_id, l.start_lsn, l.end_lsn,
      |  COUNT(*) AS n_events, COUNT(DISTINCT e.user_id) AS n_keys,
      |  SUM(CAST(FLOOR(e.value*100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
      |FROM events e JOIN ledger l ON e.event_id BETWEEN l.start_lsn AND l.end_lsn
      |GROUP BY 1, 2, 3
      |ORDER BY batch_id""".stripMargin

  /** q20_range_frame — time-RANGE window frame (not ROWS): trailing
    * 7-day revenue per order priority over the daily totals. The frame is
    * anchored on the day VALUE, so gaps in the calendar shrink the frame —
    * semantics a rows-frame can't express. Windowed over the already
    * day-aggregated table (tiny), so the sort cost is bounded by distinct
    * days, not row count; the cents totals stay exact longs until the
    * final divide. */
  def q20RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("pri"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(cents(col("o_totalprice"))).as("cents"))
      .withColumn("dnum", datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy(col("pri")).orderBy(col("dnum")).rangeBetween(-6, 0)
    daily.select(col("pri"), col("day"),
        (col("cents") / lit(100d)).as("day_total"),
        (sum(col("cents")).over(w) / lit(100d)).as("trail7_total"))
      .orderBy(col("pri"), col("day"))
  }

  val q20RangeFrameSql: String =
    """WITH daily AS (
      |  SELECT o_orderpriority AS pri, CAST(o_orderdate AS DATE) AS day,
      |    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dnum,
      |    SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS cents
      |  FROM orders GROUP BY 1, 2, 3
      |)
      |SELECT pri, day, cents / 100.0 AS day_total,
      |  SUM(cents) OVER (PARTITION BY pri ORDER BY dnum
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0 AS trail7_total
      |FROM daily ORDER BY pri, day""".stripMargin

  /** q21_grouping_sets — explicit GROUPING SETS (disjoint dimensions +
    * grand total — not a rollup hierarchy), with grouping() flags naming
    * each set. Planned as a single Expand+Aggregate: one scan, one
    * shuffle, regardless of set count. */
  def q21GroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus")), Seq()),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("total_price"),
        grouping(col("o_orderpriority")).as("g_pri"),
        grouping(col("o_orderstatus")).as("g_status"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        col("g_pri"), col("g_status"), col("n_orders"), col("total_price"))
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))

  val q21GroupingSetsSql: String =
    """SELECT
      |  COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
      |  COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
      |  CAST(GROUPING(o_orderpriority) AS TINYINT) AS g_pri,
      |  CAST(GROUPING(o_orderstatus) AS TINYINT) AS g_status,
      |  COUNT(*) AS n_orders,
      |  SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) / 100.0 AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
      |ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  /** q22_star_join — star-schema rollup over the remaining dimensions:
    * lineitem fact against part (type) and supplier→nation, discounted
    * revenue per (part type, supplier nation). All three dims broadcast —
    * the fact side streams through three BroadcastHashJoins inside one
    * whole-stage-codegen pipeline with zero fact-side shuffle before the
    * final aggregation; at 100 TB the dims are still MB-sized. */
  def q22StarJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("p_type"), col("n_name"))
      .agg(count(lit(1)).as("n_items"),
        moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("revenue"))
      .orderBy(col("p_type"), col("n_name"))
  }

  val q22StarJoinSql: String =
    """SELECT p.p_type, n.n_name, COUNT(*) AS n_items,
      |  SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS revenue
      |FROM lineitem l
      |JOIN part p ON l.l_partkey = p.p_partkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |GROUP BY 1, 2
      |ORDER BY p_type, n_name""".stripMargin

  /** q23_nested_agg — nested-type aggregation: per customer the sorted
    * array of order keys (rendered as a joined string so the oracle
    * compare stays scalar) plus count and exact total. collect_list is
    * order-nondeterministic under parallelism — sort_array makes the
    * result canonical, the standard trick for deterministic array aggs. */
  def q23NestedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("total_price"),
        array_join(sort_array(collect_list(col("o_orderkey"))), ",").as("order_keys"))
      .filter(col("n_orders") >= 8)
      .orderBy(col("o_custkey"))

  val q23NestedAggSql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) / 100.0 AS total_price,
      |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys
      |FROM orders
      |GROUP BY o_custkey
      |HAVING COUNT(*) >= 8
      |ORDER BY o_custkey""".stripMargin

  /** q24_time_dims — time-dimension extraction: event activity by
    * (day-of-week, hour-of-day), the load-profile heatmap shape.
    * Spark's dayofweek is 1-based Sunday=1; the oracle's extract(dow) is
    * 0-based Sunday=0 — normalized to the 0-based form on both sides. */
  def q24TimeDims(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy((dayofweek(col("ts")) - 1).as("dow"), hour(col("ts")).as("hod"))
      .agg(count(lit(1)).as("n_events"),
        moneySum(col("value")).as("sum_value"))
      .orderBy(col("dow"), col("hod"))

  val q24TimeDimsSql: String =
    """SELECT CAST(extract(dow FROM ts) AS INT) AS dow,
      |  CAST(extract(hour FROM ts) AS INT) AS hod,
      |  COUNT(*) AS n_events,
      |  SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY dow, hod""".stripMargin

  /** events_funnel — staged conversion funnel over the event stream:
    * signup → click-after-signup → purchase-after-that-click, per user.
    * The "did stage k happen after stage k-1" flags are chained running
    * MAX windows over one (user_id, ts) ordering — all three window
    * passes share the same partitioning and sort, so Catalyst stacks
    * them in a single Window region behind ONE shuffle+sort (the same
    * plan shape as q12's sessionization). Output is one row per user
    * with the deepest stage reached — the conversion-analysis shape of
    * an event pipeline. */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("seen_signup",
        max(when(col("event_type") === "signup", 1L).otherwise(0L)).over(w))
      .withColumn("seen_click",
        max(when(col("event_type") === "click" && col("seen_signup") === 1L, 1L)
          .otherwise(0L)).over(w))
      .withColumn("seen_purchase",
        max(when(col("event_type") === "purchase" && col("seen_click") === 1L, 1L)
          .otherwise(0L)).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("seen_signup")) + max(col("seen_click")) + max(col("seen_purchase")))
          .as("funnel_stage"))
      .orderBy(col("user_id"))
  }

  val eventsFunnelSql: String =
    """WITH e1 AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
      |    MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) OVER w AS seen_signup
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), e2 AS (
      |  SELECT *,
      |    MAX(CASE WHEN event_type = 'click' AND seen_signup = 1 THEN 1 ELSE 0 END) OVER w AS seen_click
      |  FROM e1
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), e3 AS (
      |  SELECT *,
      |    MAX(CASE WHEN event_type = 'purchase' AND seen_click = 1 THEN 1 ELSE 0 END) OVER w AS seen_purchase
      |  FROM e2
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)
      |SELECT user_id, COUNT(*) AS n_events,
      |  CAST(MAX(seen_signup) + MAX(seen_click) + MAX(seen_purchase) AS BIGINT) AS funnel_stage
      |FROM e3 GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** q25_salted_join — the skew-mitigation join in the oracle-checked
    * surface: orders ⋈ customer on custkey through `Skew.saltedJoin`
    * (big side salted 8 ways by a deterministic row hash, small side
    * replicated ×8), aggregated to revenue per nation. Salting is
    * semantically invisible — the oracle is the PLAIN join — which is
    * exactly the point: the salt only reshapes the shuffle so no single
    * reducer owns a hot key. At 100 TB this is the declarative fallback
    * when a known-skewed key distribution defeats AQE's post-hoc
    * skew-join splitting (SURVEY.md §5). */
  def q25SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(spark, dir)
      .select(col("o_custkey").as("custkey"), col("o_totalprice"))
    val small = Tables.customer(spark, dir)
      .select(col("c_custkey").as("custkey"), col("c_nationkey"))
    graft.core.Skew.saltedJoin(big, small, Seq("custkey"), salts = 8)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_nationkey"))
  }

  val q25SaltedJoinSql: String =
    """SELECT c.c_nationkey, COUNT(*) AS n_orders,
      |  SUM(CAST(FLOOR(o.o_totalprice*100 + 0.5) AS BIGINT)) / 100.0 AS revenue
      |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** events_retention — cohort retention matrix: users cohorted by first
    * active day, then distinct active users per (cohort day, days since
    * cohort), with retention as a fraction of cohort size. The classic
    * activation/retention heatmap over the event stream.
    *
    * Scale shape: activity collapses to distinct (user, day) FIRST (one
    * aggregation with map-side combine — days per user is tiny, so this
    * is the big-data shuffle and it shrinks the stream ~events/day-fold);
    * the cohort day is a whole-partition window min over the collapsed
    * rows (second, much smaller shuffle on user_id); the (cohort, age)
    * rollup then counts rows directly — (user, day) is already distinct,
    * so no count_distinct Expand is needed. Cohort sizes come from the
    * age-0 rows of the SAME aggregate (self-joined broadcast — ≤ one row
    * per cohort day), not a second scan. */
  /** events_anomaly — operational anomaly detection on the change
    * stream: each day's event-value volume is z-scored against its
    * trailing window (7 preceding days, current day excluded). The
    * monitoring alarm behind "did replication volume just crater/spike".
    *
    * Determinism discipline: the window carries EXACT integers (cent
    * sums and squared-cent sums as longs — order-independent), and
    * mean/variance/z are derived from them by a fixed sequence of IEEE
    * double ops replayed identically in the oracle. Computing variance
    * by aggregating doubles would be summation-order dependent and could
    * never hash-match. Squared cents stay well under 2^63 at any
    * realistic day volume (1e9-cent days → 1e18 per row pre-combine).
    *
    * Scale shape: one keyed day rollup (map-side combined), then a
    * window over the tiny day series. */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("day")).rowsBetween(-7, -1)
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(cents(col("value"))).as("c"), count(lit(1)).as("n_events"))
      .withColumn("s1", sum(col("c")).over(w))
      .withColumn("s2", sum(col("c") * col("c")).over(w))
      .withColumn("tn", count(col("c")).over(w))
      .withColumn("mean_c", col("s1").cast("double") / col("tn"))
      .withColumn("var_c",
        (col("s2").cast("double") - col("s1").cast("double") * col("s1").cast("double") / col("tn")) / col("tn"))
      .withColumn("z",
        when(col("tn") >= 3 && col("var_c") > 0d,
          (col("c").cast("double") - col("mean_c")) / sqrt(col("var_c"))))
      .withColumn("flag",
        when(col("z").isNull, "WARMUP")
          .when(abs(col("z")) > 2d, "ANOMALY")
          .otherwise("OK"))
      .select(col("day"), (col("c") / lit(100d)).as("day_value"),
        col("n_events"), col("tn").as("trail_days"), col("z"), col("flag"))
      .orderBy(col("day"))
  }

  val eventsAnomalySql: String =
    """WITH daily AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS c,
      |    COUNT(*) AS n_events
      |  FROM events GROUP BY 1
      |), trail AS (
      |  SELECT *,
      |    SUM(c) OVER w AS s1,
      |    SUM(c * c) OVER w AS s2,
      |    COUNT(c) OVER w AS tn
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
      |), scored AS (
      |  SELECT *,
      |    CAST(s1 AS DOUBLE) / tn AS mean_c,
      |    (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / tn) / tn AS var_c
      |  FROM trail
      |), z AS (
      |  SELECT *,
      |    CASE WHEN tn >= 3 AND var_c > 0
      |         THEN (CAST(c AS DOUBLE) - mean_c) / sqrt(var_c) END AS z
      |  FROM scored
      |)
      |SELECT day, c / 100.0 AS day_value, n_events, tn AS trail_days, z,
      |  CASE WHEN z IS NULL THEN 'WARMUP'
      |       WHEN abs(z) > 2 THEN 'ANOMALY'
      |       ELSE 'OK' END AS flag
      |FROM z
      |ORDER BY day""".stripMargin

  /** q26_gap_fill — date-spine densification + LOCF: each user's daily
    * value series gets its missing days generated (spine = `sequence`
    * over the user's [first, last] active day, exploded) and filled with
    * the last observation carried forward (`last` with ignoreNulls over
    * an ordered running frame). The standard warehouse densification
    * before any day-over-day calculation.
    *
    * Scale shape: the daily rollup is one keyed aggregation; the spine
    * explodes from a 2-column per-user aggregate (never a cross join
    * against a calendar table); the LOCF window rides the same user_id
    * partitioning the spine join just produced. Spine width is bounded
    * by the observed date range — a runaway range would blow up the
    * explode, so production would clamp `sequence`'s span. */
  def q26GapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(moneySum(col("value")).as("day_value"))
    val spine = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("value", last(col("day_value"), ignoreNulls = true).over(w))
      .withColumn("is_filled", col("day_value").isNull)
      .select(col("user_id"), col("day"), col("value"), col("is_filled"))
      .orderBy(col("user_id"), col("day"))
  }

  val q26GapFillSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
      |    SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) / 100.0 AS day_value
      |  FROM events GROUP BY 1, 2
      |), spine AS (
      |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1)
      |)
      |SELECT s.user_id, s.day,
      |  last_value(d.day_value IGNORE NULLS) OVER (
      |    PARTITION BY s.user_id ORDER BY s.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
      |  d.day_value IS NULL AS is_filled
      |FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
      |ORDER BY s.user_id, s.day""".stripMargin

  /** Generic cohort retention over any (user, activity-day) stream —
    * see eventsRetention for semantics and scale shape. */
  def retentionOf(activity: DataFrame, userCol: String, dayCol: String): DataFrame = {
    val userDays = activity
      .select(col(userCol).as("user_id"), col(dayCol).as("d"))
      .distinct()
    val w = Window.partitionBy(col("user_id"))
    val ret = userDays
      .withColumn("cohort_day", min(col("d")).over(w))
      .groupBy(col("cohort_day"), datediff(col("d"), col("cohort_day")).as("age_days"))
      .agg(count(lit(1)).as("active_users"))
    val sizes = ret.filter(col("age_days") === 0)
      .select(col("cohort_day"), col("active_users").as("cohort_size"))
    ret.join(broadcast(sizes), Seq("cohort_day"))
      .withColumn("retention_pct",
        col("active_users").cast("double") / col("cohort_size"))
  }

  def eventsRetention(spark: SparkSession, dir: String): DataFrame =
    retentionOf(
      Tables.events(spark, dir).select(col("user_id"), to_date(col("ts")).as("d")),
      "user_id", "d")
      // emit the cohort day as a (UTC-pinned) timestamp, like every
      // other temporal column in the oracle-checked surface
      .select(col("cohort_day").cast("timestamp").as("cohort_day"),
        col("age_days"), col("active_users"),
        col("cohort_size"), col("retention_pct"))
      .orderBy(col("cohort_day"), col("age_days"))

  val eventsRetentionSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
      |), wc AS (
      |  SELECT user_id, d, MIN(d) OVER (PARTITION BY user_id) AS cohort_day FROM ud
      |), ret AS (
      |  SELECT cohort_day, date_diff('day', cohort_day, d) AS age_days,
      |    COUNT(*) AS active_users
      |  FROM wc GROUP BY 1, 2
      |)
      |SELECT CAST(r.cohort_day AS TIMESTAMP) AS cohort_day, r.age_days, r.active_users,
      |  s.active_users AS cohort_size,
      |  CAST(r.active_users AS DOUBLE) / s.active_users AS retention_pct
      |FROM ret r JOIN ret s ON s.cohort_day = r.cohort_day AND s.age_days = 0
      |ORDER BY 1, 2""".stripMargin

  /** q27_interval_sweep — concurrent-interval counting by sweep-line:
    * each user's activity span [first ts, last ts] becomes a +1 boundary
    * at the start and a -1 at the end; one global sort by
    * (ts, delta DESC, user_id) and a running sum yield the number of
    * concurrently active spans at every boundary (starts sort before
    * ends at the same instant, so touching spans count as overlapping —
    * closed-interval semantics).
    *
    * Scale shape: this is the O(n log n) alternative to the O(n²)
    * interval self-join (the batch-overlap / concurrent-session
    * monitoring shape): the span rollup is one keyed aggregation with
    * map-side combine, and the sweep is one range-partitioned global
    * sort whose volume is 2 rows per interval — never a pair expansion.
    * The running sum over the global boundary order runs as a two-pass
    * distributed prefix sum ([[graft.core.Prefix.runningSum]]): the
    * boundary stream is chunked by time range, each chunk sums locally,
    * and per-chunk offsets are composed and broadcast back — no
    * Exchange SinglePartition anywhere in the plan (PlanSpec-asserted),
    * so the sweep survives any interval count. */
  def q27IntervalSweep(spark: SparkSession, dir: String): DataFrame = {
    val spans = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t0"), max(col("ts")).as("t1"))
    val bounds = spans.select(col("user_id"), col("t0").as("ts"), lit(1L).as("delta"))
      .unionByName(spans.select(col("user_id"), col("t1").as("ts"), lit(-1L).as("delta")))
    Prefix.runningSum(bounds, Seq.empty,
        Seq(col("ts"), col("delta").desc, col("user_id")), col("delta"), "active")
      .orderBy(col("ts"), col("delta").desc, col("user_id"))
  }

  val q27IntervalSweepSql: String =
    """WITH spans AS (
      |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS t0, MAX(CAST(ts AS TIMESTAMP)) AS t1
      |  FROM events GROUP BY user_id
      |), bounds AS (
      |  SELECT user_id, t0 AS ts, CAST(1 AS BIGINT) AS delta FROM spans
      |  UNION ALL
      |  SELECT user_id, t1 AS ts, CAST(-1 AS BIGINT) AS delta FROM spans
      |)
      |SELECT user_id, ts, delta,
      |  CAST(SUM(delta) OVER (ORDER BY ts, delta DESC, user_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS active
      |FROM bounds
      |ORDER BY ts, delta DESC, user_id""".stripMargin

  /** q28_histogram — exact fixed-width histogram: order values bucketed
    * into 10 × 50k-wide price bins (top bin open) per order priority,
    * with exact-cent bucket sums. The equi-width profile behind data-
    * quality range checks and skew diagnosis. Pure map-side bucketing +
    * one tiny aggregation — the bucket id is a single IEEE divide+floor
    * of the raw double, identical on both engines. */
  def q28Histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        least(floor(col("o_totalprice") / lit(50000d)), lit(9d)).cast("long").as("bucket"),
        col("o_totalprice"))
      .groupBy(col("o_orderpriority"), col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("sum_price"))
      .withColumn("bucket_lo", (col("bucket") * 50000L).cast("double"))
      .orderBy(col("o_orderpriority"), col("bucket"))

  val q28HistogramSql: String =
    """WITH b AS (
      |  SELECT o_orderpriority,
      |    CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9) AS BIGINT) AS bucket,
      |    o_totalprice
      |  FROM orders
      |)
      |SELECT o_orderpriority, bucket, COUNT(*) AS n_orders,
      |  SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) / 100.0 AS sum_price,
      |  CAST(bucket * 50000 AS DOUBLE) AS bucket_lo
      |FROM b GROUP BY 1, 2
      |ORDER BY o_orderpriority, bucket""".stripMargin

  /** q29_rolling_distinct — trailing-7-day distinct active users per day,
    * by contribution explode: activity first collapses to distinct
    * (user, day), then each user-day contributes itself to report days
    * d..d+6 (clamped at the observed range end), and the per-day rollup
    * counts distinct users. A distinct aggregate inside a RANGE window
    * does not exist in either engine — and would re-walk the trailing
    * window per day at scale; the explode form shuffles 7× the (already
    * day-collapsed) activity table instead, with the window length as an
    * explicit multiplier, then aggregates with partial combine. The
    * rolling-MAU/WAU shape of activity monitoring. */
  def q29RollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val mx = ud.agg(max(col("d")).as("dmax"))
    ud.crossJoin(broadcast(mx))
      .select(col("user_id"),
        explode(sequence(col("d"), least(date_add(col("d"), 6), col("dmax")))).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("active_users_7d"),
        count(lit(1)).as("n_contrib"))
      .orderBy(col("day"))
  }

  val q29RollingDistinctSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
      |), mx AS (
      |  SELECT MAX(d) AS dmax FROM ud
      |), contrib AS (
      |  SELECT user_id,
      |    CAST(unnest(generate_series(d, least(d + 6, dmax), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM ud CROSS JOIN mx
      |)
      |SELECT day, COUNT(DISTINCT user_id) AS active_users_7d, COUNT(*) AS n_contrib
      |FROM contrib GROUP BY day
      |ORDER BY day""".stripMargin

  /** events_markov — first-order transition matrix over per-user event
    * sequences: consecutive (by offset) event-type pairs counted into
    * (prev, next) cells, with row-normalized transition probabilities
    * (one IEEE divide of exact longs). The sequence-model / funnel-
    * diagnosis shape. The lag window rides the same per-key shuffle the
    * rollup needs; the matrix itself is |types|² rows, so the
    * normalizing window runs on a trivially small table. */
  /** Generic first-order transition matrix over any keyed, offset-
    * ordered state log: (prev, next) cell counts with row-normalized
    * probabilities. */
  def markovOf(log: DataFrame, keyCol: String, offsetCol: String,
               stateCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(offsetCol))
    val counts = log
      .withColumn("prev_type", lag(col(stateCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(stateCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("row_total", sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .withColumn("p", col("n").cast("double") / col("row_total"))
  }

  def eventsMarkov(spark: SparkSession, dir: String): DataFrame =
    markovOf(
      Tables.events(spark, dir).select(col("user_id"), col("event_id"), col("event_type")),
      "user_id", "event_id", "event_type")
      .orderBy(col("prev_type"), col("next_type"))

  val eventsMarkovSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
      |  FROM events
      |), counts AS (
      |  SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      |  FROM seq WHERE prev_type IS NOT NULL
      |  GROUP BY 1, 2
      |)
      |SELECT prev_type, next_type, n,
      |  CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS row_total,
      |  CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY prev_type) AS p
      |FROM counts
      |ORDER BY prev_type, next_type""".stripMargin

  /** q30_window_suite — the remaining ranked-window family in one
    * query: quartile assignment (ntile), percent_rank, cume_dist, and
    * second-lowest price (nth_value over the full frame) per order
    * priority. The ORDER BY includes the unique key so ranks are
    * tie-free and the rank-derived doubles are single IEEE divisions —
    * deterministic on both engines. The %37 output filter keeps the
    * presentation small but runs AFTER the windows (they need the full
    * partition). One shuffle on the partition key. */
  def q30WindowSuite(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .withColumn("second_lowest", nth_value(col("o_totalprice"), 2).over(wf))
      .filter(col("o_orderkey") % 37 === 0)
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  val q30WindowSuiteSql: String =
    """SELECT o_orderkey, o_orderpriority, o_totalprice, quartile, pct_rank, cume, second_lowest
      |FROM (
      |  SELECT o_orderkey, o_orderpriority, o_totalprice,
      |    CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
      |    PERCENT_RANK() OVER w AS pct_rank,
      |    CUME_DIST() OVER w AS cume,
      |    NTH_VALUE(o_totalprice, 2) OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_lowest
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
      |)
      |WHERE o_orderkey % 37 = 0
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** events_path_topk — top-10 three-step user journeys: per user in
    * offset order, every consecutive event-type trigram counted
    * corpus-wide (the path-mining / funnel-discovery shape, the
    * higher-order cousin of events_markov). The double lag rides ONE
    * per-key window sort; the count aggregates over at most |types|³
    * cells with map-side combine, and the top-k sorts the tiny cell
    * table. */
  def eventsPathTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .withColumn("t1", lag(col("event_type"), 2).over(w))
      .withColumn("t2", lag(col("event_type"), 1).over(w))
      .filter(col("t1").isNotNull)
      .select(concat_ws(" > ", col("t1"), col("t2"), col("event_type")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(10)
  }

  val eventsPathTopkSql: String =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    LAG(event_type, 2) OVER w AS t1,
      |    LAG(event_type, 1) OVER w AS t2
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
      |)
      |SELECT t1 || ' > ' || t2 || ' > ' || event_type AS path, COUNT(*) AS n
      |FROM seq WHERE t1 IS NOT NULL
      |GROUP BY 1
      |ORDER BY n DESC, path
      |LIMIT 10""".stripMargin

  /** q31_unpivot — wide→long melt of the lineitem measures via `stack`
    * (ONE scan expands to measure rows — Spark's Expand node; the
    * oracle's UNION ALL shape would scan four times), profiled
    * per measure with exact-cent carriers: count, sum, min, max. The
    * generic column-profiler shape over a measures-wide fact table. */
  def q31Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val melted = Tables.lineitem(spark, dir)
      .select(expr(
        """stack(4,
          |  'l_quantity', l_quantity,
          |  'l_extendedprice', l_extendedprice,
          |  'l_discount', l_discount,
          |  'l_tax', l_tax) AS (measure, v)""".stripMargin))
    melted.groupBy(col("measure"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("v"))).as("sum_cents"),
        min(cents(col("v"))).as("min_cents"),
        max(cents(col("v"))).as("max_cents"))
      .orderBy(col("measure"))
  }

  val q31UnpivotSql: String =
    """WITH m AS (
      |  SELECT 'l_quantity' AS measure, l_quantity AS v FROM lineitem
      |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem
      |)
      |SELECT measure, COUNT(*) AS n,
      |  CAST(SUM(CAST(FLOOR(v*100 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  CAST(MIN(CAST(FLOOR(v*100 + 0.5) AS BIGINT)) AS BIGINT) AS min_cents,
      |  CAST(MAX(CAST(FLOOR(v*100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents
      |FROM m GROUP BY measure
      |ORDER BY measure""".stripMargin

  /** q32_sql_api — the SQL-string entry path: graft's native codegen
    * expressions used from `spark.sql` over a temp view, exactly as a
    * spark-shell / Thrift-gateway user would (GraftExtensions registers
    * them; `spark.sql.extensions=graft.GraftExtensions` does the same
    * at session build). The query itself is an exact per-source text-
    * hash profile with `poly_hash` — a native expression — sitting next
    * to built-in aggregates in SQL text. Oracle: the portable-hash rule
    * (list_reduce replay of the same polynomial fold). */
  def q32SqlApi(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(spark)
    Tables.documents(spark, dir).createOrReplaceTempView("documents_sqlv")
    spark.sql(
      """SELECT source,
        |  COUNT(*) AS n_docs,
        |  COUNT(DISTINCT poly_hash(text)) AS n_distinct_texts,
        |  CAST(SUM(poly_hash(text)) AS BIGINT) AS hash_checksum
        |FROM documents_sqlv
        |GROUP BY source
        |ORDER BY source""".stripMargin)
  }

  val q32SqlApiSql: String =
    """WITH h AS (
      |  SELECT source, list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT))),
      |    (acc, c) -> (acc * 131 + c) % 1000000007) AS ph
      |  FROM documents
      |)
      |SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT ph) AS n_distinct_texts,
      |  CAST(SUM(ph) AS BIGINT) AS hash_checksum
      |FROM h GROUP BY source
      |ORDER BY source""".stripMargin

  /** q33_streaks — gaps-and-islands: consecutive-active-day runs per
    * user via the day-minus-row_number constant-group trick (each
    * unbroken run maps to one constant date), rolled up to active-day,
    * streak, and longest-streak counts. The engagement-streak /
    * SLA-window shape. One window riding the same key shuffle as both
    * rollups; activity collapses to distinct (user, day) first so the
    * window input is days, not raw events. */
  def q33Streaks(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    ud.withColumn("grp", date_sub(col("d"), row_number().over(w)))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"))
      .orderBy(col("user_id"))
  }

  val q33StreaksSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events
      |), g AS (
      |  SELECT user_id, d,
      |    d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS INTEGER) AS grp
      |  FROM ud
      |), i AS (
      |  SELECT user_id, grp, COUNT(*) AS len FROM g GROUP BY 1, 2
      |)
      |SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
      |  COUNT(*) AS n_streaks, CAST(MAX(len) AS BIGINT) AS longest_streak
      |FROM i GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** stats_mad — robust dispersion per return flag: exact interpolated
    * median on the cent grid, the median absolute deviation (a second
    * exact percentile over |x − median|), and the >3×MAD outlier count
    * — the robust outlier rule that survives heavy tails a stddev rule
    * drowns in. Determinism: both percentiles are exact sort-based
    * interpolations over integer-valued doubles (the q17 discipline),
    * and every derived value is a fixed IEEE sequence from them. Scale
    * shape: two keyed percentile passes with the tiny (group, median)
    * tables broadcast back between them — the big side never shuffles
    * twice on the same key for the joins. */
  def statsMad(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("rf"), cents(col("l_extendedprice")).as("c"))
    val med = li.groupBy(col("rf")).agg(expr("percentile(c, 0.5d)").as("med"))
    val dev = li.join(broadcast(med), Seq("rf"))
      .withColumn("ad", abs(col("c").cast("double") - col("med")))
    val mad = dev.groupBy(col("rf")).agg(expr("percentile(ad, 0.5d)").as("mad"))
    dev.join(broadcast(mad), Seq("rf"))
      .groupBy(col("rf"))
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("median_cents"),
        max(col("mad")).as("mad_cents"),
        sum(when(col("ad") > lit(3d) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
      .orderBy(col("rf"))
  }

  val statsMadSql: String =
    """WITH q AS (
      |  SELECT l_returnflag AS rf,
      |    CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS c
      |  FROM lineitem
      |), med AS (
      |  SELECT rf, quantile_cont(c, 0.5) AS med FROM q GROUP BY rf
      |), dev AS (
      |  SELECT q.rf, q.c, med.med, abs(CAST(q.c AS DOUBLE) - med.med) AS ad
      |  FROM q JOIN med USING (rf)
      |), mad AS (
      |  SELECT rf, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY rf
      |)
      |SELECT rf, COUNT(*) AS n, MAX(d.med) AS median_cents, MAX(m.mad) AS mad_cents,
      |  CAST(SUM(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad m USING (rf)
      |GROUP BY rf
      |ORDER BY rf""".stripMargin

  /** q34_hist_quantile — approximate quantiles from a fixed-width
    * histogram: per priority, p50/p95 estimated by linear interpolation
    * inside the bucket containing the target rank. THIS is the 100 TB
    * quantile path — one map-side-combining pass builds the histogram
    * (vs q17/stats_mad's exact sort-per-group, which is the small-data
    * luxury), and the estimate derives from exact bucket counts by a
    * fixed IEEE sequence the oracle replays bit-for-bit (engine
    * quantile sketches — t-digest, GK — have engine-specific internals
    * and could never hash-match). Top bucket is open, so estimates
    * clamp to its lower edge + width. */
  def q34HistQuantile(spark: SparkSession, dir: String): DataFrame = {
    val W = 50000d
    val b = least(floor(col("o_totalprice") / lit(W)), lit(9d)).cast("long")
    val hist = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), b.as("bucket"))
      .groupBy(col("o_orderpriority"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("bucket"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(Window.partitionBy(col("o_orderpriority"))))
    def est(p: Double) = {
      // first bucket whose cumulative count reaches rank = p * total:
      // interpolate (rank - cum_before) / cnt into the bucket's width
      val rank = lit(p) * col("total").cast("double")
      val inBucket = col("cum").cast("double") >= rank &&
        (col("cum") - col("cnt")).cast("double") < rank
      when(inBucket,
        col("bucket").cast("double") * W +
          (rank - (col("cum") - col("cnt")).cast("double")) / col("cnt").cast("double") * W)
    }
    cum
      .withColumn("e50", est(0.5))
      .withColumn("e95", est(0.95))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("total")).as("n_orders"),
        max(col("e50")).as("p50_est"),
        max(col("e95")).as("p95_est"))
      .orderBy(col("o_orderpriority"))
  }

  val q34HistQuantileSql: String =
    """WITH hist AS (
      |  SELECT o_orderpriority,
      |    CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9) AS BIGINT) AS bucket,
      |    COUNT(*) AS cnt
      |  FROM orders GROUP BY 1, 2
      |), cum AS (
      |  SELECT o_orderpriority, bucket, cnt,
      |    SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(cnt) OVER (PARTITION BY o_orderpriority) AS total
      |  FROM hist
      |), est AS (
      |  SELECT o_orderpriority, total,
      |    CASE WHEN CAST(cum AS DOUBLE) >= 0.5 * CAST(total AS DOUBLE)
      |          AND CAST(cum - cnt AS DOUBLE) < 0.5 * CAST(total AS DOUBLE)
      |      THEN CAST(bucket AS DOUBLE) * 50000 +
      |        (0.5 * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE) * 50000
      |    END AS e50,
      |    CASE WHEN CAST(cum AS DOUBLE) >= 0.95 * CAST(total AS DOUBLE)
      |          AND CAST(cum - cnt AS DOUBLE) < 0.95 * CAST(total AS DOUBLE)
      |      THEN CAST(bucket AS DOUBLE) * 50000 +
      |        (0.95 * CAST(total AS DOUBLE) - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE) * 50000
      |    END AS e95
      |  FROM cum
      |)
      |SELECT o_orderpriority, CAST(MAX(total) AS BIGINT) AS n_orders,
      |  MAX(e50) AS p50_est, MAX(e95) AS p95_est
      |FROM est GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  val q16AsofJoinSql: String =
    """WITH purchases AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id
      |  FROM events WHERE event_type = 'purchase'
      |), quotes AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, MAX(event_id) AS quote_event_id
      |  FROM events WHERE event_type IN ('click', 'view')
      |  GROUP BY user_id, CAST(ts AS TIMESTAMP)
      |)
      |SELECT p.user_id AS user_id, p.event_id AS purchase_event_id, p.ts AS purchase_ts,
      |  q.quote_event_id AS asof_event_id, q.ts AS asof_ts
      |FROM purchases p ASOF LEFT JOIN quotes q
      |  ON p.user_id = q.user_id AND q.ts <= p.ts
      |ORDER BY p.user_id, purchase_event_id""".stripMargin

  /** events_attribution — first-touch / last-touch conversion
    * attribution: every purchase credits the user's FIRST prior
    * non-purchase event (the acquiring channel) and the LAST one (the
    * converting channel), 'DIRECT' when the purchase has no prior
    * touch; the rollup is the (first_touch, last_touch) attribution
    * matrix with conversion counts, reached users, and exact-cent
    * attributed revenue — the marketing-attribution query every event
    * warehouse runs.
    *
    * Determinism: touches order by event_id (the log's LSN analog —
    * total and gap-free per user), and each touch rides the prior-rows
    * frame as the single long `event_id * 8 + channel_code`, so
    * min/max ARE first/last and the channel decodes back with one mod —
    * no ts ties, no struct-ordering dependence on the oracle engine.
    *
    * Scale shape: one per-user window (frames bounded by a user's
    * history — never corpus-wide), one shuffle on user_id, then a
    * rollup with map-side combine whose output is ∝ channels². */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame = {
    val channelCode = when(col("event_type") === "click", 1L)
      .when(col("event_type") === "signup", 2L)
      .when(col("event_type") === "error", 3L)
      .when(col("event_type") === "view", 4L)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .withColumn("tcode",
        when(col("event_type") =!= "purchase", col("event_id") * 8L + channelCode))
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    def channel(c: Column): Column =
      when(c.isNull, "DIRECT")
        .when(pmod(c, lit(8L)) === 1L, "click")
        .when(pmod(c, lit(8L)) === 2L, "signup")
        .when(pmod(c, lit(8L)) === 3L, "error")
        .otherwise("view")
    ev
      .withColumn("first_code", min(col("tcode")).over(w))
      .withColumn("last_code", max(col("tcode")).over(w))
      .filter(col("event_type") === "purchase")
      .select(channel(col("first_code")).as("first_touch"),
        channel(col("last_code")).as("last_touch"),
        col("user_id"), col("value"))
      .groupBy(col("first_touch"), col("last_touch"))
      .agg(count(lit(1)).as("n_conversions"),
        countDistinct(col("user_id")).as("n_users"),
        moneySum(col("value")).as("attributed_value"))
      .orderBy(col("first_touch"), col("last_touch"))
  }

  /** q36_trade_flows — TPC-H Q7-shaped cross-nation revenue matrix:
    * lineitem ⋈ orders (the fact-fact join — both sides data-sized, so
    * it SHUFFLES on the join key; every other join in the suite keeps a
    * broadcastable side, and at 100 TB this is the one you bucket both
    * tables on o_orderkey to make exchange-free — see Sinks
    * .writeBucketed) ⋈ customer ⋈ supplier, nations decoded through two
    * broadcast copies of the same dim, keeping only cross-nation flows.
    * Revenue on the exact-cents grid. The output is the ≤ N²−N trade
    * matrix: who ships value to whom. */
  def q36TradeFlows(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
    val o = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val cn = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
    val sn = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(cn), c("c_nationkey") === cn("cnk"))
      .join(broadcast(sn), s("s_nationkey") === sn("snk"))
      .filter(col("cust_nation") =!= col("supp_nation"))
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(count(lit(1)).as("n_items"),
        moneySum(col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("trade_value"))
      .orderBy(col("cust_nation"), col("supp_nation"))
  }

  val q36TradeFlowsSql: String =
    """SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
      |  COUNT(*) AS n_items,
      |  SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) / 100.0 AS trade_value
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |WHERE cn.n_name <> sn.n_name
      |GROUP BY 1, 2
      |ORDER BY cust_nation, supp_nation""".stripMargin

  /** events_rfm — RFM segmentation of the user base: recency (days
    * since last event), frequency (event count), monetary (exact
    * purchase cents) scored 1-4 against the corpus's own exact
    * quartiles and rolled into a segment label. The quartile boundaries
    * are computed ONCE as scalars and broadcast back — NOT a global
    * ntile, whose single-partition positional sort both bottlenecks at
    * scale and breaks determinism on ties; threshold scoring gives
    * every tied user the same score. q17's percentile ≡ quantile_cont
    * IEEE-interpolation equivalence, applied to integer-valued metrics. */
  def eventsRfm(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(col("ts_us")).as("last_us"),
        sum(when(col("event_type") === "purchase",
          floor(col("value") * 100d + 0.5d).cast("long")).otherwise(0L)).as("purchase_cents"))
    val ref = base.agg(max(col("last_us")).as("ref_us"))
    val metrics = base.crossJoin(broadcast(ref))
      .withColumn("recency_days", expr("(ref_us - last_us) div 86400000000"))
    val quartiles = metrics.agg(
      expr("percentile(recency_days, 0.25)").as("r25"),
      expr("percentile(recency_days, 0.5)").as("r50"),
      expr("percentile(recency_days, 0.75)").as("r75"),
      expr("percentile(n_events, 0.25)").as("f25"),
      expr("percentile(n_events, 0.5)").as("f50"),
      expr("percentile(n_events, 0.75)").as("f75"),
      expr("percentile(purchase_cents, 0.25)").as("m25"),
      expr("percentile(purchase_cents, 0.5)").as("m50"),
      expr("percentile(purchase_cents, 0.75)").as("m75"))
    def up(v: Column, p25: Column, p50: Column, p75: Column): Column =
      lit(1) + (v > p25).cast("int") + (v > p50).cast("int") + (v > p75).cast("int")
    metrics.crossJoin(broadcast(quartiles))
      .withColumn("r_score",
        lit(5) - up(col("recency_days"), col("r25"), col("r50"), col("r75")))
      .withColumn("f_score",
        up(col("n_events"), col("f25"), col("f50"), col("f75")))
      .withColumn("m_score",
        up(col("purchase_cents"), col("m25"), col("m50"), col("m75")))
      .withColumn("segment",
        when(col("r_score") >= 3 && col("f_score") >= 3 && col("m_score") >= 3, "CHAMPION")
          .when(col("r_score") >= 3 && col("f_score") >= 2, "LOYAL")
          .when(col("r_score") <= 1 && col("f_score") >= 3, "AT_RISK")
          .when(col("r_score") <= 1 && col("f_score") <= 1, "LOST")
          .otherwise("REGULAR"))
      .select(col("user_id"), col("recency_days"), col("n_events"),
        col("purchase_cents"), col("r_score"), col("f_score"), col("m_score"),
        col("segment"))
      .orderBy(col("user_id"))
  }

  val eventsRfmSql: String =
    """WITH base AS (
      |  SELECT user_id, COUNT(*) AS n_events,
      |    MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |         THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_cents
      |  FROM events GROUP BY user_id
      |), ref AS (SELECT MAX(last_us) AS ref_us FROM base),
      |metrics AS (
      |  SELECT user_id, n_events, purchase_cents,
      |    (ref_us - last_us) // 86400000000 AS recency_days
      |  FROM base, ref
      |), q AS (
      |  SELECT
      |    quantile_cont(recency_days, 0.25) AS r25, quantile_cont(recency_days, 0.5) AS r50,
      |    quantile_cont(recency_days, 0.75) AS r75,
      |    quantile_cont(n_events, 0.25) AS f25, quantile_cont(n_events, 0.5) AS f50,
      |    quantile_cont(n_events, 0.75) AS f75,
      |    quantile_cont(purchase_cents, 0.25) AS m25, quantile_cont(purchase_cents, 0.5) AS m50,
      |    quantile_cont(purchase_cents, 0.75) AS m75
      |  FROM metrics
      |), scored AS (
      |  SELECT user_id, recency_days, n_events, purchase_cents,
      |    5 - (1 + CASE WHEN recency_days > r25 THEN 1 ELSE 0 END
      |           + CASE WHEN recency_days > r50 THEN 1 ELSE 0 END
      |           + CASE WHEN recency_days > r75 THEN 1 ELSE 0 END) AS r_score,
      |    1 + CASE WHEN n_events > f25 THEN 1 ELSE 0 END
      |      + CASE WHEN n_events > f50 THEN 1 ELSE 0 END
      |      + CASE WHEN n_events > f75 THEN 1 ELSE 0 END AS f_score,
      |    1 + CASE WHEN purchase_cents > m25 THEN 1 ELSE 0 END
      |      + CASE WHEN purchase_cents > m50 THEN 1 ELSE 0 END
      |      + CASE WHEN purchase_cents > m75 THEN 1 ELSE 0 END AS m_score
      |  FROM metrics, q
      |)
      |SELECT user_id, recency_days, n_events, purchase_cents,
      |  r_score, f_score, m_score,
      |  CASE WHEN r_score >= 3 AND f_score >= 3 AND m_score >= 3 THEN 'CHAMPION'
      |       WHEN r_score >= 3 AND f_score >= 2 THEN 'LOYAL'
      |       WHEN r_score <= 1 AND f_score >= 3 THEN 'AT_RISK'
      |       WHEN r_score <= 1 AND f_score <= 1 THEN 'LOST'
      |       ELSE 'REGULAR' END AS segment
      |FROM scored
      |ORDER BY user_id""".stripMargin

  /** events_cohort_ltv — cohort lifetime-value curve: users cohorted by
    * first-activity day, purchase cents accumulated over cohort age,
    * normalized per cohort member (the LTV companion to
    * events_retention: retention says who came back, this says what
    * they were worth by day N). Exact-cents discipline; the cumulative
    * sum runs over PRE-AGGREGATED (cohort, age) rows — bounded by
    * days², the events_anomaly precedent — never over raw events; the
    * per-user normalization is ONE IEEE divide of exact longs. */
  def eventsCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"),
        col("event_type"), col("value"))
    val uw = Window.partitionBy(col("user_id"))
    val withCohort = ev.withColumn("cohort_day", min(col("d")).over(uw))
    val daily = withCohort
      .groupBy(col("cohort_day"),
        datediff(col("d"), col("cohort_day")).as("age_days"))
      .agg(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100d + 0.5d).cast("long")).otherwise(0L)).as("day_cents"))
    val sizes = withCohort.select(col("user_id"), col("cohort_day")).distinct()
      .groupBy(col("cohort_day")).agg(count(lit(1)).as("cohort_size"))
    val cw = Window.partitionBy(col("cohort_day")).orderBy(col("age_days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(broadcast(sizes), Seq("cohort_day"))
      .withColumn("cum_cents", sum(col("day_cents")).over(cw))
      .withColumn("ltv_cents_per_user",
        col("cum_cents").cast("double") / col("cohort_size").cast("double"))
      .select(col("cohort_day").cast("timestamp").as("cohort_day"),
        col("age_days"), col("day_cents"), col("cum_cents"),
        col("cohort_size"), col("ltv_cents_per_user"))
      .orderBy(col("cohort_day"), col("age_days"))
  }

  val eventsCohortLtvSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(ts AS DATE) AS d, event_type, value FROM events
      |), wc AS (
      |  SELECT user_id, d, event_type, value,
      |    MIN(d) OVER (PARTITION BY user_id) AS cohort_day
      |  FROM ev
      |), daily AS (
      |  SELECT cohort_day, d - cohort_day AS age_days,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |         THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS day_cents
      |  FROM wc GROUP BY 1, 2
      |), sizes AS (
      |  SELECT cohort_day, COUNT(*) AS cohort_size
      |  FROM (SELECT DISTINCT user_id, cohort_day FROM wc) GROUP BY 1
      |), cum AS (
      |  SELECT d2.cohort_day, age_days, day_cents, cohort_size,
      |    CAST(SUM(day_cents) OVER (PARTITION BY d2.cohort_day ORDER BY age_days
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
      |  FROM daily d2 JOIN sizes USING (cohort_day)
      |)
      |SELECT CAST(cohort_day AS TIMESTAMP) AS cohort_day, age_days, day_cents,
      |  cum_cents, cohort_size,
      |  CAST(cum_cents AS DOUBLE) / CAST(cohort_size AS DOUBLE) AS ltv_cents_per_user
      |FROM cum
      |ORDER BY cohort_day, age_days""".stripMargin

  /** events_inactivity — per-user inactivity profile: the largest
    * event-time gap between consecutive events, lifetime span, and mean
    * inter-event gap — the churn-risk / dormancy signal (retention
    * says WHETHER a user returned; this says how long they go dark).
    * Gaps in exact epoch micros (integer subtraction after a per-key
    * sort); the mean gap is span/(n-1), ONE IEEE divide of exact longs.
    * Scale: one shuffle on user_id, per-partition sort bounded by a
    * user's own history — the cdc_out_of_order shape. */
  def eventsInactivity(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("first_us"),
        max(col("ts_us")).as("last_us"),
        max(col("gap_us")).as("max_gap_us"))
      .withColumn("span_us", col("last_us") - col("first_us"))
      .withColumn("avg_gap_us",
        when(col("n_events") > 1,
          col("span_us").cast("double") / (col("n_events") - 1).cast("double")))
      .withColumn("activity_class",
        when(col("n_events") === 1, "SINGLETON")
          .when(col("max_gap_us") > 7L * 86400000000L, "DORMANT")
          .otherwise("ACTIVE"))
      .select(col("user_id"), col("n_events"), col("first_us"), col("last_us"),
        col("span_us"), col("max_gap_us"), col("avg_gap_us"), col("activity_class"))
      .orderBy(col("user_id"))
  }

  val eventsInactivitySql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events
      |), lagged AS (
      |  SELECT user_id, ts_us,
      |    ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us) AS gap_us
      |  FROM ev
      |), r AS (
      |  SELECT user_id, COUNT(*) AS n_events,
      |    MIN(ts_us) AS first_us, MAX(ts_us) AS last_us,
      |    MAX(gap_us) AS max_gap_us
      |  FROM lagged GROUP BY user_id
      |)
      |SELECT user_id, n_events, first_us, last_us,
      |  last_us - first_us AS span_us, max_gap_us,
      |  CASE WHEN n_events > 1
      |       THEN CAST(last_us - first_us AS DOUBLE) / CAST(n_events - 1 AS DOUBLE) END AS avg_gap_us,
      |  CASE WHEN n_events = 1 THEN 'SINGLETON'
      |       WHEN max_gap_us > 604800000000 THEN 'DORMANT'
      |       ELSE 'ACTIVE' END AS activity_class
      |FROM r
      |ORDER BY user_id""".stripMargin

  /** q35_cube — full CUBE over (order status, order year): all four
    * grouping-set combinations from ONE Expand+Aggregate pass (the
    * dashboard "slice by any combination" shape; completes the
    * rollup / grouping-sets / cube trio). grouping() flags disambiguate
    * the ALL rows from literal values; money on the exact-cents grid.
    * Scale: one shuffle on the expanded grouping keys with map-side
    * partial aggregation — the Expand multiplies rows 4× before the
    * combine, never materializing four separate scans. */
  def q35Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("order_year", year(col("o_orderdate")))
      .cube(col("o_orderstatus"), col("order_year"))
      .agg(
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        grouping(col("order_year")).cast("int").as("g_year"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_customers"),
        moneySum(col("o_totalprice")).as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("order_year"), lit(-1)).as("order_year"),
        col("g_status"), col("g_year"),
        col("n_orders"), col("n_customers"), col("total_price"))
      .orderBy(col("g_status"), col("g_year"),
        col("o_orderstatus"), col("order_year"))

  val q35CubeSql: String =
    """WITH o AS (
      |  SELECT o_orderstatus, CAST(year(o_orderdate) AS INTEGER) AS order_year,
      |         o_custkey, o_totalprice
      |  FROM orders
      |)
      |SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
      |  COALESCE(order_year, -1) AS order_year,
      |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      |  CAST(GROUPING(order_year) AS INTEGER) AS g_year,
      |  COUNT(*) AS n_orders,
      |  COUNT(DISTINCT o_custkey) AS n_customers,
      |  SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) / 100.0 AS total_price
      |FROM o
      |GROUP BY CUBE (o_orderstatus, order_year)
      |ORDER BY g_status, g_year, o_orderstatus, order_year""".stripMargin

  val eventsAttributionSql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, event_type, value,
      |    -- no ELSE: an unknown event_type yields NULL (not a touch),
      |    -- matching the Spark channel when-chain
      |    event_id * 8 +
      |      CASE event_type WHEN 'click' THEN 1 WHEN 'signup' THEN 2
      |           WHEN 'error' THEN 3 WHEN 'view' THEN 4 END AS tcode
      |  FROM events
      |), framed AS (
      |  SELECT *,
      |    MIN(tcode) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_code,
      |    MAX(tcode) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_code
      |  FROM ev
      |)
      |SELECT
      |  CASE WHEN first_code IS NULL THEN 'DIRECT'
      |       WHEN first_code % 8 = 1 THEN 'click' WHEN first_code % 8 = 2 THEN 'signup'
      |       WHEN first_code % 8 = 3 THEN 'error' ELSE 'view' END AS first_touch,
      |  CASE WHEN last_code IS NULL THEN 'DIRECT'
      |       WHEN last_code % 8 = 1 THEN 'click' WHEN last_code % 8 = 2 THEN 'signup'
      |       WHEN last_code % 8 = 3 THEN 'error' ELSE 'view' END AS last_touch,
      |  COUNT(*) AS n_conversions,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) / 100.0 AS attributed_value
      |FROM framed
      |WHERE event_type = 'purchase'
      |GROUP BY 1, 2
      |ORDER BY first_touch, last_touch""".stripMargin

  /** basket_affinity — market-basket pair co-occurrence over order
    * "baskets" (distinct parts per order): co-order counts and exact
    * lift for every part pair co-ordered ≥ 2 times. Scale shape: ONE
    * shuffle groups lineitem into per-order sorted part arrays (basket
    * size is bounded — the 2..50 guard is part of the operator contract
    * and mirrored in the oracle), pairs explode MAP-SIDE from the array
    * (≤ B²/2 per basket — never a fact-fact self-join whose output
    * multiplies), and only the pair keys shuffle into the count. Lift
    * is exact-integer co·N and nₐ·n_b finished by ONE IEEE divide, so
    * the hash compare is deterministic on both engines. */
  def basketAffinity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nOrders = li.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val baskets = li.groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("parts"))
      .filter(size(col("parts")).between(2, 50))
    val pairs = baskets.select(explode(flatten(
      transform(col("parts"), (x, i) =>
        transform(slice(col("parts"), i + lit(2), size(col("parts"))),
          y => struct(x.as("part_a"), y.as("part_b")))))).as("p"))
      .select(col("p.part_a"), col("p.part_b"))
    val co = pairs.groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("co_orders"))
      .filter(col("co_orders") >= 2)
    val pc = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_ord"))
    co.join(pc.select(col("l_partkey").as("part_a"), col("n_ord").as("n_a")), "part_a")
      .join(pc.select(col("l_partkey").as("part_b"), col("n_ord").as("n_b")), "part_b")
      .crossJoin(broadcast(nOrders))
      .withColumn("lift",
        (col("co_orders") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"))
      .select(col("part_a"), col("part_b"), col("co_orders"),
        col("n_a"), col("n_b"), col("lift"))
      .orderBy(col("part_a"), col("part_b"))
  }

  val basketAffinitySql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |no_ AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
      |bsize AS (SELECT l_orderkey, COUNT(*) AS bs FROM li GROUP BY 1),
      |ok AS (SELECT l_orderkey FROM bsize WHERE bs BETWEEN 2 AND 50),
      |pairs AS (
      |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS co_orders
      |  FROM li a
      |  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  JOIN ok ON ok.l_orderkey = a.l_orderkey
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |),
      |pc AS (SELECT l_partkey, COUNT(*) AS n_ord FROM li GROUP BY 1)
      |SELECT part_a, part_b, co_orders, ca.n_ord AS n_a, cb.n_ord AS n_b,
      |  CAST(co_orders * (SELECT n_orders FROM no_) AS DOUBLE) /
      |    CAST(ca.n_ord * cb.n_ord AS DOUBLE) AS lift
      |FROM pairs
      |JOIN pc ca ON ca.l_partkey = part_a
      |JOIN pc cb ON cb.l_partkey = part_b
      |ORDER BY part_a, part_b""".stripMargin

  /** events_conversion_latency — signup→purchase funnel latency per
    * signup-month cohort: first purchase at-or-after the user's first
    * signup, latency percentiles (exact micros finished by one divide
    * to seconds) and the cohort conversion rate. The per-user
    * reductions (first signup, first qualifying purchase) are plain
    * key-partitioned min-aggregates — no window over raw events, no
    * as-of sort; the percentile runs over one row per CONVERTED user. */
  def eventsConversionLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .join(signup, "user_id")
      .filter(col("ts") >= col("signup_ts"))
      .groupBy(col("user_id"), col("signup_ts"))
      .agg(min(col("ts")).as("first_purchase_ts"))
    val cohorts = signup
      .groupBy(date_trunc("month", col("signup_ts")).as("cohort_month"))
      .agg(count(lit(1)).as("n_signups"))
    firstPurchase
      .withColumn("cohort_month", date_trunc("month", col("signup_ts")))
      .withColumn("latency_s",
        (unix_micros(col("first_purchase_ts")) - unix_micros(col("signup_ts")))
          .cast("double") / 1e6)
      .groupBy(col("cohort_month"))
      .agg(count(lit(1)).as("n_converted"),
        expr("percentile(latency_s, 0.5)").as("p50_latency_s"),
        expr("percentile(latency_s, 0.9)").as("p90_latency_s"))
      .join(cohorts, "cohort_month")
      .withColumn("conversion_rate",
        col("n_converted").cast("double") / col("n_signups").cast("double"))
      .select(col("cohort_month"), col("n_signups"), col("n_converted"),
        col("conversion_rate"), col("p50_latency_s"), col("p90_latency_s"))
      .orderBy(col("cohort_month"))
  }

  val eventsConversionLatencySql: String =
    """WITH su AS (
      |  SELECT user_id, MIN(ts) AS signup_ts FROM events
      |  WHERE event_type = 'signup' GROUP BY 1
      |),
      |fp AS (
      |  SELECT e.user_id, su.signup_ts, MIN(e.ts) AS first_purchase_ts
      |  FROM events e JOIN su USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts >= su.signup_ts
      |  GROUP BY 1, 2
      |),
      |lat AS (
      |  SELECT date_trunc('month', CAST(signup_ts AS TIMESTAMP)) AS cohort_month,
      |    CAST(epoch_us(CAST(first_purchase_ts AS TIMESTAMP)) -
      |         epoch_us(CAST(signup_ts AS TIMESTAMP)) AS DOUBLE) / 1e6 AS latency_s
      |  FROM fp
      |),
      |co AS (
      |  SELECT date_trunc('month', CAST(signup_ts AS TIMESTAMP)) AS cohort_month,
      |    COUNT(*) AS n_signups
      |  FROM su GROUP BY 1
      |)
      |SELECT cohort_month, n_signups, COUNT(*) AS n_converted,
      |  CAST(COUNT(*) AS DOUBLE) / CAST(n_signups AS DOUBLE) AS conversion_rate,
      |  quantile_cont(latency_s, 0.5) AS p50_latency_s,
      |  quantile_cont(latency_s, 0.9) AS p90_latency_s
      |FROM lat JOIN co USING (cohort_month)
      |GROUP BY cohort_month, n_signups
      |ORDER BY cohort_month""".stripMargin

  /** events_hourly_heatmap — day-of-week × hour activity matrix with
    * per-cell share of total and a coarse daypart band: the ops
    * dashboard view of load shape (when to schedule compactions, when
    * the spike window is). Pure map-side aggregate to ≤ 168 cells; the
    * share is one IEEE divide against the broadcast scalar total. */
  def eventsHourlyHeatmap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("ts"))
    val total = ev.agg(count(lit(1)).as("n_total"))
    ev.groupBy(dayofweek(col("ts")).as("dow"), hour(col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .crossJoin(broadcast(total))
      .withColumn("share",
        col("n_events").cast("double") / col("n_total").cast("double"))
      .withColumn("daypart",
        when(col("hour") < 6, "NIGHT")
          .when(col("hour") < 12, "MORNING")
          .when(col("hour") < 18, "AFTERNOON")
          .otherwise("EVENING"))
      .select(col("dow"), col("hour"), col("n_events"), col("share"),
        col("daypart"))
      .orderBy(col("dow"), col("hour"))
  }

  val eventsHourlyHeatmapSql: String =
    """WITH ev AS (
      |  SELECT CAST(dayofweek(CAST(ts AS TIMESTAMP)) AS INTEGER) + 1 AS dow,
      |    CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hour
      |  FROM events
      |),
      |tot AS (SELECT COUNT(*) AS n_total FROM ev)
      |SELECT dow, hour, COUNT(*) AS n_events,
      |  CAST(COUNT(*) AS DOUBLE) / CAST((SELECT n_total FROM tot) AS DOUBLE) AS share,
      |  CASE WHEN hour < 6 THEN 'NIGHT' WHEN hour < 12 THEN 'MORNING'
      |       WHEN hour < 18 THEN 'AFTERNOON' ELSE 'EVENING' END AS daypart
      |FROM ev GROUP BY dow, hour
      |ORDER BY dow, hour""".stripMargin

  /** q37_decile_report — order-value decile report WITHOUT a global
    * sort: the nine quantile cut points are computed once and broadcast
    * as a scalar array, every order finds its decile by counting cuts
    * ≤ its price (map-side; no ntile() over a single ordered partition
    * — THE anti-pattern for global ranking at 100 TB), and the report
    * aggregates per decile with exact-cents revenue and one-divide
    * shares. Both engines interpolate the same quantile doubles, so
    * bucket assignment is deterministic. */
  def q37DecileReport(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_totalprice"))
    val cuts = o.agg(expr(
      "percentile(o_totalprice, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
      .as("qs"))
    val tot = o.agg(sum(cents(col("o_totalprice"))).as("total_cents"))
    o.crossJoin(broadcast(cuts)).crossJoin(broadcast(tot))
      .withColumn("decile",
        (lit(1) + size(filter(col("qs"), c => c <= col("o_totalprice")))).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("rev_cents"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        first(col("total_cents")).as("total_cents"))
      .withColumn("rev_share",
        col("rev_cents").cast("double") / col("total_cents").cast("double"))
      .select(col("decile"), col("n_orders"), col("rev_cents"),
        col("min_price"), col("max_price"), col("rev_share"))
      .orderBy(col("decile"))
  }

  val q37DecileReportSql: String =
    """WITH cuts AS (
      |  SELECT quantile_cont(o_totalprice,
      |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs FROM orders
      |),
      |tot AS (
      |  SELECT CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS total_cents FROM orders
      |),
      |b AS (
      |  SELECT o_totalprice,
      |    1 + len(list_filter((SELECT qs FROM cuts), c -> c <= o_totalprice)) AS decile
      |  FROM orders
      |)
      |SELECT decile, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
      |  MIN(o_totalprice) AS min_price,
      |  MAX(o_totalprice) AS max_price,
      |  CAST(CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE) /
      |    CAST((SELECT total_cents FROM tot) AS DOUBLE) AS rev_share
      |FROM b GROUP BY decile
      |ORDER BY decile""".stripMargin

  /** q38_churned_customers — year-over-year churn: customers active in
    * year Y with no orders in Y+1 (the EXISTS / NOT EXISTS chain),
    * with the revenue that walked out the door. One (customer, year)
    * pre-aggregation, then a SELF left join shifted by one year — two
    * shuffles on the same key family, no per-year scan loop, no
    * correlated subquery re-execution. The final year is excluded:
    * "no next year in the data" is not churn. */
  def q38ChurnedCustomers(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
        cents(col("o_totalprice")).as("c"))
      .groupBy(col("o_custkey"), col("yr"))
      .agg(sum(col("c")).as("cents"))
    val maxYr = act.agg(max(col("yr")).as("max_yr"))
    val nxt = act.select(col("o_custkey"), (col("yr") - 1).as("yr"),
      lit(1).as("has_next"))
    act.join(nxt.select(col("o_custkey"), col("yr"), col("has_next")).distinct(),
        Seq("o_custkey", "yr"), "left")
      .crossJoin(broadcast(maxYr))
      .filter(col("yr") < col("max_yr"))
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("has_next").isNull, 1L).otherwise(0L)).as("n_churned"),
        sum(when(col("has_next").isNull, col("cents")).otherwise(0L)).as("churned_cents"))
      .withColumn("churn_rate",
        col("n_churned").cast("double") / col("n_active").cast("double"))
      .select(col("yr"), col("n_active"), col("n_churned"),
        col("churned_cents"), col("churn_rate"))
      .orderBy(col("yr"))
  }

  val q38ChurnedCustomersSql: String =
    """WITH act AS (
      |  SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
      |    CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1, 2
      |),
      |mx AS (SELECT MAX(yr) AS max_yr FROM act)
      |SELECT a.yr, COUNT(*) AS n_active,
      |  CAST(SUM(CASE WHEN n.o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_churned,
      |  CAST(SUM(CASE WHEN n.o_custkey IS NULL THEN a.cents ELSE 0 END) AS BIGINT) AS churned_cents,
      |  CAST(SUM(CASE WHEN n.o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE) /
      |    CAST(COUNT(*) AS DOUBLE) AS churn_rate
      |FROM act a
      |LEFT JOIN (SELECT DISTINCT o_custkey, yr FROM act) n
      |  ON n.o_custkey = a.o_custkey AND n.yr = a.yr + 1
      |WHERE a.yr < (SELECT max_yr FROM mx)
      |GROUP BY a.yr
      |ORDER BY a.yr""".stripMargin

  /** q39_trend_slope — trailing-7-day revenue trend: per observed day,
    * the least-squares slope (cents/day) of daily revenue over the last
    * 7 observed days, via exact integer sufficient statistics in the
    * window frame (n, Σx, Σy, Σxy, Σx² as longs — x is the day index
    * from the broadcast min date, y exact cents) and the stats_corr
    * fixed-IEEE finish: numerator and denominator exact, ONE divide.
    * The window runs over PRE-AGGREGATED daily rows (bounded by days,
    * the events_anomaly precedent), never raw orders; only full 7-row
    * frames are emitted so the slope is always well-conditioned. */
  def q39TrendSlope(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("d"), cents(col("o_totalprice")).as("c"))
      .groupBy(col("d")).agg(sum(col("c")).as("day_cents"))
    val minD = daily.agg(min(col("d")).as("min_d"))
    val w = Window.orderBy(col("x")).rowsBetween(-6, Window.currentRow)
    daily.crossJoin(broadcast(minD))
      .withColumn("x", datediff(col("d"), col("min_d")).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("day_cents")).over(w))
      .withColumn("sxy", sum(col("x") * col("day_cents")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .filter(col("n") === 7)
      .withColumn("slope_cents_per_day",
        (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .select(col("d").cast("timestamp").as("d"), col("day_cents"),
        col("sy").as("week_cents"), col("slope_cents_per_day"))
      .orderBy(col("d"))
  }

  val q39TrendSlopeSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS day_cents
      |  FROM orders GROUP BY 1
      |),
      |mn AS (SELECT MIN(d) AS min_d FROM daily),
      |x AS (
      |  SELECT d, day_cents,
      |    CAST(d - (SELECT min_d FROM mn) AS BIGINT) AS x
      |  FROM daily
      |),
      |framed AS (
      |  SELECT d, day_cents,
      |    COUNT(*) OVER w AS n,
      |    CAST(SUM(x) OVER w AS BIGINT) AS sx,
      |    CAST(SUM(day_cents) OVER w AS BIGINT) AS sy,
      |    CAST(SUM(x * day_cents) OVER w AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
      |  FROM x
      |  WINDOW w AS (ORDER BY x ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |)
      |SELECT CAST(d AS TIMESTAMP) AS d, day_cents, sy AS week_cents,
      |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
      |    AS slope_cents_per_day
      |FROM framed WHERE n = 7
      |ORDER BY d""".stripMargin

  /** q40_max_drawdown — running-peak drawdown of cumulative daily
    * revenue per year: cumulative cents, the running maximum, per-day
    * drawdown (peak − current, exact longs), and each year's maximum
    * drawdown with the day it bottomed. Windows run over
    * PRE-AGGREGATED daily rows partitioned BY YEAR (bounded ≤366 rows
    * per partition — no unpartitioned global sort); everything is
    * exact integer arithmetic until the final report. */
  def q40MaxDrawdown(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(year(col("o_orderdate")).as("yr"),
        to_date(col("o_orderdate")).as("d"),
        cents(col("o_totalprice")).as("c"))
      .groupBy(col("yr"), col("d")).agg(sum(col("c")).as("day_cents"))
    // net daily delta vs the year's mean day: a monotone cumsum of raw
    // revenue never draws down, so measure relative performance
    val mean = Window.partitionBy(col("yr"))
    val cum = Window.partitionBy(col("yr")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("n_days", count(lit(1)).over(mean))
      .withColumn("yr_cents", sum(col("day_cents")).over(mean))
      // exact scaled delta: day_cents * n_days - yr_cents (long — avoids
      // a fractional mean; sign and ordering match the real delta)
      .withColumn("delta", col("day_cents") * col("n_days") - col("yr_cents"))
      .withColumn("cum", sum(col("delta")).over(cum))
      .withColumn("peak", max(col("cum")).over(cum))
      .withColumn("drawdown", col("peak") - col("cum"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("yr")).orderBy(col("drawdown").desc, col("d"))))
      .filter(col("rn") === 1)
      .select(col("yr"), col("n_days"),
        col("drawdown").as("max_drawdown_scaled"),
        col("d").cast("timestamp").as("trough_day"))
      .orderBy(col("yr"))
  }

  val q40MaxDrawdownSql: String =
    """WITH daily AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |    CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS day_cents
      |  FROM orders GROUP BY 1, 2
      |),
      |sc AS (
      |  SELECT yr, d, day_cents,
      |    COUNT(*) OVER (PARTITION BY yr) AS n_days,
      |    CAST(SUM(day_cents) OVER (PARTITION BY yr) AS BIGINT) AS yr_cents
      |  FROM daily
      |),
      |dd AS (
      |  SELECT yr, d, n_days,
      |    CAST(MAX(cum) OVER w - cum AS BIGINT) AS drawdown
      |  FROM (
      |    SELECT yr, d, n_days,
      |      CAST(SUM(day_cents * n_days - yr_cents) OVER w AS BIGINT) AS cum
      |    FROM sc
      |    WINDOW w AS (PARTITION BY yr ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |  )
      |  WINDOW w AS (PARTITION BY yr ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |),
      |ranked AS (
      |  SELECT yr, d, n_days, drawdown,
      |    ROW_NUMBER() OVER (PARTITION BY yr ORDER BY drawdown DESC, d) AS rn
      |  FROM dd
      |)
      |SELECT yr, n_days, drawdown AS max_drawdown_scaled,
      |  CAST(d AS TIMESTAMP) AS trough_day
      |FROM ranked WHERE rn = 1
      |ORDER BY yr""".stripMargin

  /** q41_supplier_returns — per-supplier return-rate league table: R-flag
    * share of shipped lines and of exact-cents revenue, min-volume gate
    * (≥ 20 lines), worst offenders ranked with supplier identity via a
    * broadcast dim join. One fact-side shuffle (groupBy suppkey); rates
    * are one IEEE divide each. */
  def q41SupplierReturns(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        (col("l_returnflag") === "R").cast("long").as("is_r"),
        cents(col("l_extendedprice")).as("c"))
    val per = li.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("is_r")).as("n_returned"),
        sum(col("c")).as("rev_cents"),
        sum(col("is_r") * col("c")).as("returned_cents"))
      .filter(col("n_lines") >= 20)
    per.join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .withColumn("return_rate",
        col("n_returned").cast("double") / col("n_lines").cast("double"))
      .withColumn("returned_share",
        col("returned_cents").cast("double") / col("rev_cents").cast("double"))
      .select(col("l_suppkey").as("suppkey"), col("s_name"),
        col("s_nationkey"), col("n_lines"), col("n_returned"),
        col("rev_cents"), col("returned_cents"),
        col("return_rate"), col("returned_share"))
      .orderBy(col("suppkey"))
  }

  val q41SupplierReturnsSql: String =
    """WITH per AS (
      |  SELECT l_suppkey,
      |    COUNT(*) AS n_lines,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R'
      |      THEN CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS returned_cents
      |  FROM lineitem GROUP BY 1
      |  HAVING COUNT(*) >= 20
      |)
      |SELECT l_suppkey AS suppkey, s_name, s_nationkey,
      |  n_lines, n_returned, rev_cents, returned_cents,
      |  CAST(n_returned AS DOUBLE) / CAST(n_lines AS DOUBLE) AS return_rate,
      |  CAST(returned_cents AS DOUBLE) / CAST(rev_cents AS DOUBLE) AS returned_share
      |FROM per JOIN supplier ON s_suppkey = l_suppkey
      |ORDER BY suppkey""".stripMargin

  /** q42_backlog_aging — open-order aging report: orders not yet
    * finalized (status ≠ 'F') bucketed by age against the corpus
    * high-water date (exact day arithmetic off the broadcast max date —
    * no wall clock in a deterministic pipeline), per (priority, band):
    * count, exact-cents value, share of the open backlog. The ops-desk
    * "what's stuck and how much is it worth" view. One filtered
    * aggregate; the age bands are map-side CASE arms. */
  def q42BacklogAging(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_orderstatus"),
        to_date(col("o_orderdate")).as("d"), cents(col("o_totalprice")).as("c"))
    val hiWater = o.agg(max(col("d")).as("max_d"))
    val open = o.filter(col("o_orderstatus") =!= "F")
      .crossJoin(broadcast(hiWater))
      .withColumn("age_days", datediff(col("max_d"), col("d")).cast("long"))
      .withColumn("age_band",
        when(col("age_days") < 30, "0_FRESH")
          .when(col("age_days") < 90, "1_AGING")
          .when(col("age_days") < 365, "2_STALE")
          .otherwise("3_ANCIENT"))
    val tot = open.agg(sum(col("c")).as("open_cents"))
    open.groupBy(col("o_orderpriority"), col("age_band"))
      .agg(count(lit(1)).as("n_orders"), sum(col("c")).as("band_cents"))
      .crossJoin(broadcast(tot))
      .withColumn("backlog_share",
        col("band_cents").cast("double") / col("open_cents").cast("double"))
      .select(col("o_orderpriority"), col("age_band"), col("n_orders"),
        col("band_cents"), col("backlog_share"))
      .orderBy(col("o_orderpriority"), col("age_band"))
  }

  val q42BacklogAgingSql: String =
    """WITH o AS (
      |  SELECT o_orderpriority, o_orderstatus, CAST(o_orderdate AS DATE) AS d,
      |    CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c
      |  FROM orders
      |),
      |hi AS (SELECT MAX(d) AS max_d FROM o),
      |open_o AS (
      |  SELECT o_orderpriority,
      |    CAST((SELECT max_d FROM hi) - d AS BIGINT) AS age_days, c
      |  FROM o WHERE o_orderstatus <> 'F'
      |),
      |banded AS (
      |  SELECT o_orderpriority,
      |    CASE WHEN age_days < 30 THEN '0_FRESH'
      |         WHEN age_days < 90 THEN '1_AGING'
      |         WHEN age_days < 365 THEN '2_STALE'
      |         ELSE '3_ANCIENT' END AS age_band, c
      |  FROM open_o
      |),
      |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS open_cents FROM banded)
      |SELECT o_orderpriority, age_band, COUNT(*) AS n_orders,
      |  CAST(SUM(c) AS BIGINT) AS band_cents,
      |  CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) /
      |    CAST((SELECT open_cents FROM tot) AS DOUBLE) AS backlog_share
      |FROM banded GROUP BY 1, 2
      |ORDER BY o_orderpriority, age_band""".stripMargin

  /** events_mix_drift — week-over-week event-type mix drift: per week,
    * the L1 distance between this week's and last week's type
    * distribution. The distance is computed on EXACT cross-multiplied
    * integers — Σ_types |n_t·T_prev − p_t·T_this| as longs, finished by
    * ONE divide by T_this·T_prev — because an L1 summed from per-type
    * IEEE share differences would be aggregation-order-dependent and
    * flake the oracle hash. Counts densify onto the weeks × types grid
    * (both dimension-bounded — the one sanctioned cross join) so a type
    * that VANISHES still contributes its full mass; windows run over
    * the grid pre-aggregates only. The weekly ingestion-mix gate: a
    * stable pipeline's L1 hovers near 0, a crawler config change
    * spikes it. */
  def eventsMixDrift(spark: SparkSession, dir: String): DataFrame = {
    val wk = Tables.events(spark, dir)
      .select(date_trunc("week", col("ts")).as("week"), col("event_type"))
      .groupBy(col("week"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // densify onto the weeks × types grid (both dimension-bounded) so
    // the lag window always aligns to the immediately preceding week
    // and vanished types still contribute their full mass to the L1
    val grid = wk.select(col("week")).distinct()
      .crossJoin(broadcast(wk.select(col("event_type")).distinct()))
    val full = grid.join(wk, Seq("week", "event_type"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val tw = Window.partitionBy(col("event_type")).orderBy(col("week"))
    val totals = full.groupBy(col("week")).agg(sum(col("n")).as("t_this"))
      .withColumn("t_prev", lag(col("t_this"), 1).over(Window.orderBy(col("week"))))
    full.withColumn("p_n", lag(col("n"), 1).over(tw))
      .join(totals, Seq("week"))
      .filter(col("p_n").isNotNull && col("t_prev").isNotNull)
      .withColumn("num", abs(col("n") * col("t_prev") - col("p_n") * col("t_this")))
      .groupBy(col("week"), col("t_this"), col("t_prev"))
      .agg(sum(col("num")).as("l1_num"), count(lit(1)).as("n_types"))
      .withColumn("l1",
        col("l1_num").cast("double") / (col("t_this") * col("t_prev")).cast("double"))
      .select(col("week"), col("n_types"), col("t_this"), col("t_prev"),
        col("l1_num"), col("l1"))
      .orderBy(col("week"))
  }

  val eventsMixDriftSql: String =
    """WITH wk AS (
      |  SELECT date_trunc('week', CAST(ts AS TIMESTAMP)) AS week, event_type,
      |    COUNT(*) AS n
      |  FROM events GROUP BY 1, 2
      |),
      |grid AS (
      |  SELECT week, event_type
      |  FROM (SELECT DISTINCT week FROM wk)
      |  CROSS JOIN (SELECT DISTINCT event_type FROM wk)
      |),
      |full_g AS (
      |  SELECT g.week, g.event_type, COALESCE(wk.n, 0) AS n
      |  FROM grid g LEFT JOIN wk USING (week, event_type)
      |),
      |tot AS (
      |  SELECT week, CAST(SUM(n) AS BIGINT) AS t_this FROM full_g GROUP BY 1
      |),
      |tot2 AS (
      |  SELECT week, t_this, LAG(t_this) OVER (ORDER BY week) AS t_prev FROM tot
      |),
      |lagged AS (
      |  SELECT week, event_type, n,
      |    LAG(n) OVER (PARTITION BY event_type ORDER BY week) AS p_n
      |  FROM full_g
      |),
      |joined AS (
      |  SELECT l.week, t.t_this, t.t_prev,
      |    abs(l.n * t.t_prev - l.p_n * t.t_this) AS num
      |  FROM lagged l JOIN tot2 t USING (week)
      |  WHERE l.p_n IS NOT NULL AND t.t_prev IS NOT NULL
      |)
      |SELECT week, COUNT(*) AS n_types, t_this, t_prev,
      |  CAST(SUM(num) AS BIGINT) AS l1_num,
      |  CAST(CAST(SUM(num) AS BIGINT) AS DOUBLE) /
      |    CAST(t_this * t_prev AS DOUBLE) AS l1
      |FROM joined GROUP BY week, t_this, t_prev
      |ORDER BY week""".stripMargin

  /** events_power_users — heavy-hitter report: top-20 users by event
    * volume (deterministic (n DESC, user ASC) ranking), each with
    * purchase-cents value and share of the whole stream — the "WHO are
    * the hot keys" companion to recon_key_skew's "how bad". One
    * data-sized shuffle (groupBy user); the ranking window runs over
    * one row per user, and only 20 rows survive to the scalar-share
    * join. */
  def eventsPowerUsers(spark: SparkSession, dir: String): DataFrame = {
    val per = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase",
          floor(col("value") * 100d + 0.5d).cast("long")).otherwise(0L))
          .as("purchase_cents"))
    val tot = per.agg(sum(col("n_events")).as("n_total"))
    per.withColumn("rank", row_number().over(
        Window.orderBy(col("n_events").desc, col("user_id"))).cast("long"))
      .filter(col("rank") <= 20)
      .crossJoin(broadcast(tot))
      .withColumn("stream_share",
        col("n_events").cast("double") / col("n_total").cast("double"))
      .select(col("rank"), col("user_id"), col("n_events"),
        col("purchase_cents"), col("stream_share"))
      .orderBy(col("rank"))
  }

  val eventsPowerUsersSql: String =
    """WITH per AS (
      |  SELECT user_id, COUNT(*) AS n_events,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |      THEN CAST(FLOOR(value*100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS purchase_cents
      |  FROM events GROUP BY 1
      |),
      |tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS n_total FROM per),
      |ranked AS (
      |  SELECT *, ROW_NUMBER() OVER (ORDER BY n_events DESC, user_id) AS rank
      |  FROM per
      |)
      |SELECT rank, user_id, n_events, purchase_cents,
      |  CAST(n_events AS DOUBLE) / CAST((SELECT n_total FROM tot) AS DOUBLE)
      |    AS stream_share
      |FROM ranked WHERE rank <= 20
      |ORDER BY rank""".stripMargin

  /** q43_discount_bands — discount-band effect report (the TPC-H Q6
    * what-if generalized): lineitems bucketed by discount percentage
    * point, per band: line count, exact-cents gross and discounted
    * revenue, the forgone revenue, and mean quantity via exact carriers.
    * Discount cents use floor(gross·disc·100 + 0.5) per row — one fused
    * expression, identical IEEE ops both engines. Map-side CASE-free
    * banding (discounts are exact hundredths: round(d·100) is the
    * band), one small aggregate. */
  def q43DiscountBands(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(floor(col("l_discount") * 100d + 0.5d).cast("long").as("disc_pct"),
        cents(col("l_extendedprice")).as("gross_c"),
        floor(col("l_extendedprice") * col("l_discount") * 100d + 0.5d)
          .cast("long").as("disc_c"),
        floor(col("l_quantity") + 0.5d).cast("long").as("qty"))
    li.groupBy(col("disc_pct"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("gross_c")).as("gross_cents"),
        sum(col("disc_c")).as("discount_cents"),
        sum(col("qty")).as("qty_sum"))
      .withColumn("net_cents", col("gross_cents") - col("discount_cents"))
      .withColumn("mean_qty",
        col("qty_sum").cast("double") / col("n_lines").cast("double"))
      .select(col("disc_pct"), col("n_lines"), col("gross_cents"),
        col("discount_cents"), col("net_cents"), col("mean_qty"))
      .orderBy(col("disc_pct"))
  }

  val q43DiscountBandsSql: String =
    """WITH li AS (
      |  SELECT CAST(FLOOR(l_discount*100 + 0.5) AS BIGINT) AS disc_pct,
      |    CAST(FLOOR(l_extendedprice*100 + 0.5) AS BIGINT) AS gross_c,
      |    CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT) AS disc_c,
      |    CAST(FLOOR(l_quantity + 0.5) AS BIGINT) AS qty
      |  FROM lineitem
      |)
      |SELECT disc_pct, COUNT(*) AS n_lines,
      |  CAST(SUM(gross_c) AS BIGINT) AS gross_cents,
      |  CAST(SUM(disc_c) AS BIGINT) AS discount_cents,
      |  CAST(SUM(gross_c) AS BIGINT) - CAST(SUM(disc_c) AS BIGINT) AS net_cents,
      |  CAST(CAST(SUM(qty) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_qty
      |FROM li GROUP BY disc_pct
      |ORDER BY disc_pct""".stripMargin

  /** q44_reorder_cadence — customer reorder cadence by market segment:
    * per-customer day gaps between consecutive orders (lag window
    * partitioned per customer — bounded by that customer's orders),
    * rolled up per segment: repeat-customer count, median / p90 gap
    * days, mean by exact carriers. The replenishment-rhythm metric
    * behind every "time to next order" campaign. Gap extraction is one
    * per-key window over the fact; the segment rollup joins the
    * broadcast customer dim and aggregates one row per gap. */
  def q44ReorderCadence(spark: SparkSession, dir: String): DataFrame = {
    val cw = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
    val gaps = Tables.orders(spark, dir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .withColumn("prev_d", lag(col("d"), 1).over(cw))
      .filter(col("prev_d").isNotNull)
      .withColumn("gap_days", datediff(col("d"), col("prev_d")).cast("long"))
    gaps.join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_gaps"),
        countDistinct(col("o_custkey")).as("n_repeat_customers"),
        sum(col("gap_days")).as("gap_sum"),
        expr("percentile(CAST(gap_days AS DOUBLE), 0.5)").as("p50_gap_days"),
        expr("percentile(CAST(gap_days AS DOUBLE), 0.9)").as("p90_gap_days"))
      .withColumn("mean_gap_days",
        col("gap_sum").cast("double") / col("n_gaps").cast("double"))
      .select(col("c_mktsegment"), col("n_repeat_customers"), col("n_gaps"),
        col("p50_gap_days"), col("p90_gap_days"), col("mean_gap_days"))
      .orderBy(col("c_mktsegment"))
  }

  val q44ReorderCadenceSql: String =
    """WITH gaps AS (
      |  SELECT o_custkey,
      |    CAST(d - LAG(d) OVER (PARTITION BY o_custkey ORDER BY d) AS BIGINT)
      |      AS gap_days
      |  FROM (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d FROM orders)
      |),
      |g AS (SELECT * FROM gaps WHERE gap_days IS NOT NULL)
      |SELECT c_mktsegment,
      |  COUNT(DISTINCT o_custkey) AS n_repeat_customers,
      |  COUNT(*) AS n_gaps,
      |  quantile_cont(CAST(gap_days AS DOUBLE), 0.5) AS p50_gap_days,
      |  quantile_cont(CAST(gap_days AS DOUBLE), 0.9) AS p90_gap_days,
      |  CAST(CAST(SUM(gap_days) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS mean_gap_days
      |FROM g JOIN customer ON c_custkey = o_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** q45_nation_yoy_growth — revenue by customer nation, year over
    * year: exact-cents revenue per (nation, year), the previous year by
    * a per-nation lag window (over year pre-aggregates — bounded by
    * nations × years), growth as exact cent delta + ONE-divide ratio.
    * The orders⋈customer join shuffles both sides on custkey (at 100 TB
    * neither side broadcasts); the nation decode broadcasts. */
  def q45NationYoyGrowth(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.orders(spark, dir)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"),
        cents(col("o_totalprice")).as("c"))
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("yr"))
      .agg(sum(col("c")).as("rev_cents"))
    val nw = Window.partitionBy(col("c_nationkey")).orderBy(col("yr"))
    rev.withColumn("prev_cents", lag(col("rev_cents"), 1).over(nw))
      .withColumn("prev_yr", lag(col("yr"), 1).over(nw))
      .filter(col("prev_cents").isNotNull && col("prev_yr") === col("yr") - 1)
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .withColumn("delta_cents", col("rev_cents") - col("prev_cents"))
      .withColumn("yoy_growth",
        col("delta_cents").cast("double") / col("prev_cents").cast("double"))
      .select(col("n_name"), col("yr"), col("rev_cents"), col("prev_cents"),
        col("delta_cents"), col("yoy_growth"))
      .orderBy(col("n_name"), col("yr"))
  }

  val q45NationYoyGrowthSql: String =
    """WITH rev AS (
      |  SELECT c_nationkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
      |    CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS rev_cents
      |  FROM orders JOIN customer ON c_custkey = o_custkey
      |  GROUP BY 1, 2
      |),
      |lagged AS (
      |  SELECT c_nationkey, yr, rev_cents,
      |    LAG(rev_cents) OVER (PARTITION BY c_nationkey ORDER BY yr) AS prev_cents,
      |    LAG(yr) OVER (PARTITION BY c_nationkey ORDER BY yr) AS prev_yr
      |  FROM rev
      |)
      |SELECT n_name, yr, rev_cents, prev_cents,
      |  rev_cents - prev_cents AS delta_cents,
      |  CAST(rev_cents - prev_cents AS DOUBLE) / CAST(prev_cents AS DOUBLE)
      |    AS yoy_growth
      |FROM lagged JOIN nation ON n_nationkey = c_nationkey
      |WHERE prev_cents IS NOT NULL AND prev_yr = yr - 1
      |ORDER BY n_name, yr""".stripMargin

  /** q46_supplier_hhi — supplier revenue concentration per nation:
    * Herfindahl-Hirschman index (sum of squared revenue shares) plus the
    * top-supplier share (CR1). Antitrust-style market-structure report
    * over the fact table.
    *
    * Determinism discipline: per-supplier revenue is exact cents
    * (BIGINT); HHI = Σ share² = Σ rev² / total², with the share carriers
    * quantized to whole DOLLARS (exact integer division, same both
    * engines) so the squared sum is an exact order-independent BIGINT —
    * cents² already overflows 2^63 at test scale. Numerator and
    * denominator use the SAME dollar carrier, so the quantization bias
    * is < 1e-7 for dollar-sized revenues; exactly one double divide per
    * nation. Headroom: dollars² holds to ~$3B/supplier; beyond that the
    * carrier quantum coarsens (k$) or the sums move to DECIMAL(38,0) —
    * the algorithm is unchanged either way.
    *
    * Scale shape: one shuffle to aggregate lineitem by suppkey; the
    * supplier→nation decode joins the AGGREGATED (supplier-sized)
    * stream, never the fact stream; nation decode broadcasts. At 100 TB
    * lineitem never carries nation columns through the shuffle. */
  def q46SupplierHhi(spark: SparkSession, dir: String): DataFrame = {
    val revBySupp = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"),
        cents(col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("c"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("c")).as("rev_cents"))
    revBySupp
      .withColumn("revd", expr("rev_cents DIV 100"))
      .join(Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("rev_cents")).as("total_rev_cents"),
        sum(col("revd")).as("sum_d"),
        sum(col("revd") * col("revd")).as("sq_d"),
        max(col("revd")).as("top_d"))
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .withColumn("hhi", col("sq_d").cast("double") /
        (col("sum_d").cast("double") * col("sum_d").cast("double")))
      .withColumn("top_share",
        col("top_d").cast("double") / col("sum_d").cast("double"))
      .select(col("n_name"), col("n_suppliers"), col("total_rev_cents"),
        col("hhi"), col("top_share"))
      .orderBy(col("n_name"))
  }

  val q46SupplierHhiSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev_cents
      |  FROM lineitem GROUP BY 1
      |), bynation AS (
      |  SELECT s_nationkey, COUNT(*) AS n_suppliers,
      |    CAST(SUM(rev_cents) AS BIGINT) AS total_rev_cents,
      |    CAST(SUM(rev_cents // 100) AS BIGINT) AS sum_d,
      |    CAST(SUM((rev_cents // 100) * (rev_cents // 100)) AS BIGINT) AS sq_d,
      |    MAX(rev_cents // 100) AS top_d
      |  FROM rev JOIN supplier ON s_suppkey = l_suppkey
      |  GROUP BY 1
      |)
      |SELECT n_name, n_suppliers, total_rev_cents,
      |  CAST(sq_d AS DOUBLE) /
      |    (CAST(sum_d AS DOUBLE) * CAST(sum_d AS DOUBLE)) AS hhi,
      |  CAST(top_d AS DOUBLE) / CAST(sum_d AS DOUBLE) AS top_share
      |FROM bynation JOIN nation ON n_nationkey = s_nationkey
      |ORDER BY n_name""".stripMargin

  /** q47_brand_markup — realized-vs-list pricing per part brand: what
    * the fact table actually charged (discounted extended price) against
    * the catalog price for the same quantities (retailprice × qty). The
    * merchandising "realization rate" report.
    *
    * Determinism discipline: both money streams are exact cents; the
    * catalog side is cents(retailprice) × integral quantity (quantities
    * are whole units, pinned by the spec), so every sum is a BIGINT and
    * the realization ratio is one double divide per brand.
    *
    * Scale shape: lineitem⋈part is a key join on partkey — at 100 TB
    * both sides shuffle on partkey (part is sf-scaled, not a broadcast
    * dim); only (partkey, qty, cents) survive the projection into the
    * exchange, then one partial-agg shuffle by brand (25 groups). */
  def q47BrandMarkup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        floor(col("l_quantity") + lit(0.5d)).cast("long").as("qty"),
        cents(col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("charged_c"))
    li.join(Tables.part(spark, dir)
        .select(col("p_partkey"), col("p_brand"), cents(col("p_retailprice")).as("retail_c")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("qty")).as("units"),
        sum(col("charged_c")).as("charged_cents"),
        sum(col("retail_c") * col("qty")).as("list_cents"))
      .withColumn("realization",
        col("charged_cents").cast("double") / col("list_cents").cast("double"))
      .select(col("p_brand"), col("n_lines"), col("units"),
        col("charged_cents"), col("list_cents"), col("realization"))
      .orderBy(col("p_brand"))
  }

  val q47BrandMarkupSql: String =
    """SELECT p_brand, COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS units,
      |  CAST(SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT))
      |    AS BIGINT) AS charged_cents,
      |  CAST(SUM(CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT)
      |    * CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS list_cents,
      |  CAST(SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT))
      |    AS DOUBLE) /
      |  CAST(SUM(CAST(FLOOR(p_retailprice*100 + 0.5) AS BIGINT)
      |    * CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS DOUBLE) AS realization
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin

  /** q48_repeat_share — monthly revenue split between first-time and
    * returning customers: each customer's chronologically first order
    * (deterministic orderkey tie-break) is NEW revenue, everything after
    * is REPEAT — the acquisition-vs-retention mix every subscription /
    * commerce dashboard leads with.
    *
    * Scale shape: the first-order flag is a per-customer window over
    * that customer's orders (bounded per key, one hash shuffle on
    * custkey); the monthly rollup is a second shuffle down to
    * months-sized output. Exact cent carriers throughout; repeat_share
    * is one divide per month. */
  def q48RepeatShare(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        cents(col("o_totalprice")).as("c"))
      .withColumn("is_first", row_number().over(w) === 1)
      .groupBy(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("is_first"), 1L).otherwise(0L)).as("n_new"),
        sum(when(col("is_first"), col("c")).otherwise(0L)).as("new_cents"),
        sum(when(!col("is_first"), col("c")).otherwise(0L)).as("repeat_cents"))
      .withColumn("repeat_share", col("repeat_cents").cast("double") /
        (col("new_cents") + col("repeat_cents")).cast("double"))
      .orderBy(col("yr"), col("mo"))
  }

  val q48RepeatShareSql: String =
    """WITH flagged AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |    CAST(month(o_orderdate) AS INTEGER) AS mo,
      |    CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT) AS c,
      |    ROW_NUMBER() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) = 1 AS is_first
      |  FROM orders
      |)
      |SELECT yr, mo, COUNT(*) AS n_orders,
      |  CAST(SUM(CASE WHEN is_first THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  CAST(SUM(CASE WHEN is_first THEN c ELSE 0 END) AS BIGINT) AS new_cents,
      |  CAST(SUM(CASE WHEN is_first THEN 0 ELSE c END) AS BIGINT) AS repeat_cents,
      |  CAST(SUM(CASE WHEN is_first THEN 0 ELSE c END) AS DOUBLE) /
      |    CAST(SUM(c) AS DOUBLE) AS repeat_share
      |FROM flagged
      |GROUP BY yr, mo
      |ORDER BY yr, mo""".stripMargin

  /** events_burstiness — user temporal-regularity census: per-user
    * inter-event gaps (seconds), coefficient of variation of the gap
    * distribution, users bucketed against the Poisson reference (an
    * exponential arrival process has CV = 1): REGULAR (CV < 0.9,
    * sub-Poisson — schedulers and bots), POISSON (0.9 ≤ CV < 1.1,
    * memoryless), BURSTY (CV ≥ 1.1, super-Poisson — human sessions),
    * INSTANT (all events within one second). The behavioral prior for
    * the anomaly family.
    *
    * Determinism discipline: gaps are exact integral seconds (epoch-ms
    * integer division, same quantum both engines); per-user Σgap and
    * Σgap² are BIGINT, so CV = √(n·Σx² − Σx²)/Σx (IEEE sqrt+divides on
    * exact carriers — correctly rounded in both engines) is
    * deterministic; it is then re-quantized to millis so the class
    * thresholds compare integers and the rollup mean is an exact sum.
    * 2^63 headroom: gap² ~ 1e15 at year-long spans, safe to ~1e3 gaps
    * per user per year quantum.
    *
    * Scale shape: one shuffle by user for the lag window (bounded per
    * key), per-user reduction to 3 integers, 4-row rollup. */
  def eventsBurstiness(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        unix_millis(col("ts")).as("tms"))
      .withColumn("prev_ms", lag(col("tms"), 1).over(w))
      .filter(col("prev_ms").isNotNull)
      .select(col("user_id"), expr("(tms - prev_ms) DIV 1000").as("gap_s"))
    val perUser = gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("gap_s")).as("sx"),
        sum(col("gap_s") * col("gap_s")).as("sxx"))
      .withColumn("cv", when(col("sx") === 0L, lit(null)).otherwise(
        sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) /
          col("sx").cast("double")))
      .withColumn("cvq", when(col("sx") === 0L, lit(null))
        .otherwise(floor(col("cv") * lit(1000d) + lit(0.5d)).cast("long")))
      .withColumn("burst_class",
        when(col("sx") === 0L, "INSTANT")
          .when(col("cvq") < 900L, "REGULAR")
          .when(col("cvq") >= 1100L, "BURSTY")
          .otherwise("POISSON"))
    perUser.groupBy(col("burst_class"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n")).as("n_gaps"),
        (sum(col("sx")).cast("double") / sum(col("n")).cast("double"))
          .as("mean_gap_s"),
        (sum(col("cvq")).cast("double") / count(lit(1)).cast("double") / lit(1000d))
          .as("mean_cv"))
      .orderBy(col("burst_class"))
  }

  val eventsBurstinessSql: String =
    """WITH gaps AS (
      |  SELECT user_id,
      |    (epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id)) // 1000 AS gap_s
      |  FROM events
      |  QUALIFY gap_s IS NOT NULL
      |), per_user AS (
      |  SELECT user_id, COUNT(*) AS n,
      |    CAST(SUM(gap_s) AS BIGINT) AS sx,
      |    CAST(SUM(gap_s*gap_s) AS BIGINT) AS sxx
      |  FROM gaps GROUP BY 1
      |), scored AS (
      |  SELECT n, sx,
      |    CASE WHEN sx = 0 THEN NULL ELSE
      |      CAST(FLOOR(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) / CAST(sx AS DOUBLE)
      |        * 1000 + 0.5) AS BIGINT) END AS cvq,
      |    CASE WHEN sx = 0 THEN 'INSTANT'
      |         WHEN CAST(FLOOR(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) / CAST(sx AS DOUBLE)
      |           * 1000 + 0.5) AS BIGINT) < 900 THEN 'REGULAR'
      |         WHEN CAST(FLOOR(sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) / CAST(sx AS DOUBLE)
      |           * 1000 + 0.5) AS BIGINT) >= 1100 THEN 'BURSTY'
      |         ELSE 'POISSON' END AS burst_class
      |  FROM per_user
      |)
      |SELECT burst_class, COUNT(*) AS n_users,
      |  CAST(SUM(n) AS BIGINT) AS n_gaps,
      |  CAST(SUM(sx) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS mean_gap_s,
      |  CAST(SUM(cvq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000 AS mean_cv
      |FROM scored
      |GROUP BY burst_class
      |ORDER BY burst_class""".stripMargin

  /** q49_basket_profile — revenue by basket size: orders bucketed by
    * their lineitem count (S ≤ 2, M ≤ 4, L ≤ 6, XL), with order count,
    * exact-cents revenue, and per-bucket averages — the basket-mix
    * report behind shipping tiers and bundle pricing.
    *
    * Scale shape: one shuffle to collapse lineitem to per-order (count,
    * cents) — map-side combined; the bucket rollup runs on the
    * ORDER-sized stream and outputs 4 rows. Integer bucket thresholds;
    * averages are one divide each over exact carriers. */
  def q49BasketProfile(spark: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        cents(col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("c"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"), sum(col("c")).as("rev_c"))
    perOrder
      .withColumn("basket",
        when(col("n_lines") <= 2L, "S").when(col("n_lines") <= 4L, "M")
          .when(col("n_lines") <= 6L, "L").otherwise("XL"))
      .groupBy(col("basket"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("n_lines")).as("n_lines"),
        sum(col("rev_c")).as("rev_cents"))
      .withColumn("avg_lines",
        col("n_lines").cast("double") / col("n_orders").cast("double"))
      .withColumn("avg_order_cents",
        col("rev_cents").cast("double") / col("n_orders").cast("double"))
      .orderBy(col("basket"))
  }

  val q49BasketProfileSql: String =
    """WITH per_order AS (
      |  SELECT l_orderkey, COUNT(*) AS n_lines,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev_c
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT CASE WHEN n_lines <= 2 THEN 'S' WHEN n_lines <= 4 THEN 'M'
      |            WHEN n_lines <= 6 THEN 'L' ELSE 'XL' END AS basket,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(n_lines) AS BIGINT) AS n_lines,
      |  CAST(SUM(rev_c) AS BIGINT) AS rev_cents,
      |  CAST(SUM(n_lines) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_lines,
      |  CAST(SUM(rev_c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_order_cents
      |FROM per_order
      |GROUP BY 1
      |ORDER BY basket""".stripMargin

  /** q50_ship_priority — TPC-H Q12 shape: did critical-priority orders
    * ship on time, per line status? Lineitems in the 1997 ship window
    * joined to their orders, counting urgent/high vs other priorities.
    * The shipdate filter pushes to the lineitem scan before the
    * orderkey shuffle join; counts are exact longs. */
  def q50ShipPriority(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linestatus"))
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
           sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val q50ShipPrioritySql: String =
    """SELECT l_linestatus,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** q51_order_size_dist — TPC-H Q13 shape: the customer-engagement
    * histogram. Orders per customer INCLUDING zero-order customers (the
    * left outer join is the point — an inner join silently drops the
    * biggest bucket), then the count of customers at each order count.
    * Both shuffles are keyed aggregations with map-side combine; the
    * final histogram is at most a few hundred rows. */
  def q51OrderSizeDist(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey"))
    val o = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q51OrderSizeDistSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey
      |)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** q52_top_supplier_share — TPC-H Q15 shape, nation-extended: the top
    * 3 revenue suppliers per nation in the 1997 ship window, with their
    * share of nation revenue in basis points. Revenue sums exact cents;
    * the share divides DOLLAR-quantized carriers (cents×10000 would
    * overflow 2^63 at warehouse scale — the q46_supplier_hhi lesson),
    * and both operands are non-negative so integer DIV agrees across
    * engines. The per-nation window runs over supplier-count rows
    * (pre-aggregated — bounded by the supplier dimension, never by
    * lineitem). */
  def q52TopSupplierShare(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1d) - col("l_discount")))).as("rev_c"))
    val s = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"))
    val n = Tables.nation(spark, dir).select(col("n_nationkey"), col("n_name"))
    val byNation = Window.partitionBy(col("n_name"))
    rev.join(broadcast(s), rev("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .withColumn("nation_c", sum(col("rev_c")).over(byNation))
      .withColumn("rk", row_number().over(
        byNation.orderBy(col("rev_c").desc, col("s_suppkey"))).cast("long"))
      .filter(col("rk") <= 3L)
      .withColumn("share_bp",
        expr("((rev_c DIV 100) * 10000L) DIV greatest(nation_c DIV 100, 1L)"))
      .select(col("n_name"), col("rk"), col("s_name"),
        (col("rev_c") / lit(100d)).as("revenue"), col("share_bp"))
      .orderBy(col("n_name"), col("rk"))
  }

  val q52TopSupplierShareSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev_c
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate <  TIMESTAMP '1998-01-01'
      |  GROUP BY l_suppkey
      |), ranked AS (
      |  SELECT n_name, s_name, s_suppkey, rev_c,
      |    CAST(SUM(rev_c) OVER (PARTITION BY n_name) AS BIGINT) AS nation_c,
      |    ROW_NUMBER() OVER (PARTITION BY n_name
      |      ORDER BY rev_c DESC, s_suppkey) AS rk
      |  FROM rev
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |)
      |SELECT n_name, CAST(rk AS BIGINT) AS rk, s_name,
      |  rev_c / 100.0 AS revenue,
      |  CAST(((rev_c // 100) * 10000) // GREATEST(nation_c // 100, 1) AS BIGINT) AS share_bp
      |FROM ranked
      |WHERE rk <= 3
      |ORDER BY n_name, rk""".stripMargin

  /** q53_promo_share — TPC-H Q14 shape: per ship month of 1997, the
    * share of revenue from PROMO-type parts in basis points. Part is
    * the broadcast dim (zero fact-side shuffle before the month
    * rollup); revenue sums exact cents and the share divides
    * dollar-quantized non-negative carriers. The month key is a
    * 'yyyy-MM' string both engines derive from the same naive UTC
    * timestamp. */
  def q53PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .select(col("l_partkey"),
        date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
        cents(col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("rev_c"))
    val p = Tables.part(spark, dir).select(col("p_partkey"), col("p_type"))
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("ship_month"))
      .agg(sum(when(col("p_type") === "PROMO", col("rev_c")).otherwise(0L)).as("promo_c"),
           sum(col("rev_c")).as("total_c"))
      .select(col("ship_month"),
        (col("promo_c") / lit(100d)).as("promo_rev"),
        (col("total_c") / lit(100d)).as("total_rev"),
        expr("((promo_c DIV 100) * 10000L) DIV greatest(total_c DIV 100, 1L)").as("promo_bp"))
      .orderBy(col("ship_month"))
  }

  val q53PromoShareSql: String =
    """WITH m AS (
      |  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
      |    CAST(SUM(CASE WHEN p_type = 'PROMO'
      |      THEN CAST(FLOOR(l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS promo_c,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS total_c
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate <  TIMESTAMP '1998-01-01'
      |  GROUP BY 1
      |)
      |SELECT ship_month, promo_c / 100.0 AS promo_rev, total_c / 100.0 AS total_rev,
      |  CAST(((promo_c // 100) * 10000) // GREATEST(total_c // 100, 1) AS BIGINT) AS promo_bp
      |FROM m
      |ORDER BY ship_month""".stripMargin

  /** q54_big_orders — TPC-H Q18 shape: the top-100 largest orders by
    * total quantity, with their customer. The HAVING filter reduces at
    * the per-order aggregate (map-combined) BEFORE any join; only
    * qualifying orders join to orders/customer. Quantities are
    * integral-valued doubles quantized to exact longs; top-100 is
    * totally ordered by (qty DESC, orderkey). */
  def q54BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val qty = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(floor(col("l_quantity") + lit(0.5d)).cast("long")).as("total_qty"))
      .filter(col("total_qty") > 150L)
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_name"))
    qty.join(o, qty("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(100)
  }

  val q54BigOrdersSql: String =
    """WITH big AS (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS BIGINT) AS total_qty
      |  FROM lineitem GROUP BY 1
      |  HAVING SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) > 150
      |)
      |SELECT c_name, c_custkey, o_orderkey, o_totalprice, total_qty
      |FROM big
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** q55_region_revenue — TPC-H Q5 shape: revenue per nation from LOCAL
    * trade (customer and supplier in the same nation) within one region
    * and one order year. The join graph is the canonical star+self
    * constraint: lineitem⋈orders⋈customer shuffle on their keys,
    * supplier/nation/region broadcast, and the same-nation equality
    * applied as a post-join filter Catalyst pushes into the supplier
    * join condition. Exact cent sums, one terminal divide. */
  def q55RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        cents(col("l_extendedprice") * (lit(1d) - col("l_discount"))).as("rev_c"))
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = Tables.region(spark, dir)
      .filter(col("r_name") === "ASIA").select(col("r_regionkey"))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .filter(c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg((sum(col("rev_c")) / lit(100d)).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q55RegionRevenueSql: String =
    """SELECT n_name,
      |  SUM(CAST(FLOOR(l_extendedprice*(1 - l_discount)*100 + 0.5) AS BIGINT)) / 100.0 AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** q56_idle_balance — TPC-H Q22 shape: idle capital per market
    * segment. Customers whose balance exceeds the positive-balance
    * average but who placed no order in the trailing window — the
    * at-risk high-value audience. The average is an exact-cents sum
    * with ONE scalar divide broadcast to the comparison (never a
    * correlated subquery per row); the no-recent-orders test is a
    * left-anti join against the date-filtered orders scan (filter
    * pushed before the join). */
  def q56IdleBalance(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        cents(col("c_acctbal")).as("bal_c"))
    val avgPos = c.filter(col("bal_c") > 0L)
      .agg((sum(col("bal_c")).cast("double") / count(lit(1)).cast("double"))
        .as("avg_bal_c"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-08-01").cast("timestamp"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(avgPos))
      .filter(col("bal_c").cast("double") > col("avg_bal_c"))
      .join(recent, c("c_custkey") === recent("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        (sum(col("bal_c")) / lit(100d)).as("idle_balance"))
      .orderBy(col("c_mktsegment"))
  }

  val q56IdleBalanceSql: String =
    """WITH c AS (
      |  SELECT c_custkey, c_mktsegment,
      |    CAST(FLOOR(c_acctbal*100 + 0.5) AS BIGINT) AS bal_c
      |  FROM customer
      |), avgb AS (
      |  SELECT CAST(SUM(bal_c) AS BIGINT) AS s, COUNT(*) AS n
      |  FROM c WHERE bal_c > 0
      |)
      |SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(SUM(bal_c) AS BIGINT) / 100.0 AS idle_balance
      |FROM c, avgb
      |WHERE CAST(bal_c AS DOUBLE) > CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '1999-08-01')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** q57_ship_delay — order-to-ship latency census per priority: exact
    * integral day deltas (datediff on the date-truncated naive
    * timestamps — identical in both engines), exact percentiles on the
    * integer grid (the stats_mad discipline; the q34 histogram path is
    * the 100 TB alternative), and an exact-sum mean with one terminal
    * divide. THE fulfillment-SLA report: does 1-URGENT actually ship
    * faster, and by how much at p95? */
  def q57ShipDelay(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
          col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("delay_days"))
    d.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        expr("percentile(delay_days, 0.5d)").as("p50_delay"),
        expr("percentile(delay_days, 0.95d)").as("p95_delay"),
        max(col("delay_days")).as("max_delay"),
        (sum(col("delay_days")).cast("double") / count(lit(1)).cast("double"))
          .as("mean_delay"))
      .orderBy(col("o_orderpriority"))
  }

  val q57ShipDelaySql: String =
    """WITH d AS (
      |  SELECT o_orderpriority,
      |    CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS delay_days
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |)
      |SELECT o_orderpriority, COUNT(*) AS n_lines,
      |  quantile_cont(delay_days, 0.5) AS p50_delay,
      |  quantile_cont(delay_days, 0.95) AS p95_delay,
      |  MAX(delay_days) AS max_delay,
      |  CAST(SUM(delay_days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_delay
      |FROM d
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q58_one_off_buyers — single-purchase customer census per market
    * segment: how many customers ever bought exactly once, and what
    * revenue share they carry — the acquisition-quality counterpart of
    * q48's repeat-share (that one slices revenue by month; this one
    * profiles the CUSTOMER population). Two keyed map-combined
    * shuffles (orders→per-customer, then segment rollup); shares are
    * dollar-quantized non-negative integer DIVs. */
  def q58OneOffBuyers(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("rev_c"))
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    perCust.join(c, perCust("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_buyers"),
        sum(when(col("n_orders") === 1L, 1L).otherwise(0L)).as("n_one_off"),
        sum(col("rev_c")).as("total_rev_c"),
        sum(when(col("n_orders") === 1L, col("rev_c")).otherwise(0L))
          .as("one_off_rev_c"))
      .withColumn("one_off_bp",
        expr("(n_one_off * 10000L) DIV greatest(n_buyers, 1L)"))
      .withColumn("one_off_rev_bp",
        expr("((one_off_rev_c DIV 100) * 10000L) DIV greatest(total_rev_c DIV 100, 1L)"))
      .select(col("c_mktsegment"), col("n_buyers"), col("n_one_off"),
        col("one_off_bp"),
        (col("one_off_rev_c") / lit(100d)).as("one_off_revenue"),
        (col("total_rev_c") / lit(100d)).as("total_revenue"),
        col("one_off_rev_bp"))
      .orderBy(col("c_mktsegment"))
  }

  val q58OneOffBuyersSql: String =
    """WITH pc AS (
      |  SELECT o_custkey, COUNT(*) AS n_orders,
      |    CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM orders GROUP BY 1
      |), seg AS (
      |  SELECT c_mktsegment, COUNT(*) AS n_buyers,
      |    CAST(SUM(CASE WHEN n_orders = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_one_off,
      |    CAST(SUM(rev_c) AS BIGINT) AS total_rev_c,
      |    CAST(SUM(CASE WHEN n_orders = 1 THEN rev_c ELSE 0 END) AS BIGINT) AS one_off_rev_c
      |  FROM pc JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1
      |)
      |SELECT c_mktsegment, n_buyers, n_one_off,
      |  CAST((n_one_off * 10000) // GREATEST(n_buyers, 1) AS BIGINT) AS one_off_bp,
      |  one_off_rev_c / 100.0 AS one_off_revenue,
      |  total_rev_c / 100.0 AS total_revenue,
      |  CAST(((one_off_rev_c // 100) * 10000) // GREATEST(total_rev_c // 100, 1) AS BIGINT) AS one_off_rev_bp
      |FROM seg
      |ORDER BY c_mktsegment""".stripMargin

  /** events_type_overlap — behavior co-occurrence matrix: for every
    * unordered pair of event types (diagonal included), how many users
    * exhibit BOTH — the audience-overlap table behind "do purchasers
    * also file errors?" and the input to any segment Venn. Shape:
    * distinct (user, type) first (≤ users × |types| rows — the ONLY
    * fact-sized shuffle), then a per-user self-join bounded by |types|²
    * per user, then an exact-count rollup to a ≤ |types|²-row matrix.
    * The diagonal doubles as the per-type audience size. */
  def eventsTypeOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val a = ut.select(col("user_id"), col("event_type").as("type_a"))
    val b = ut.select(col("user_id"), col("event_type").as("type_b"))
    a.join(b, Seq("user_id"))
      .filter(col("type_a") <= col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("type_a"), col("type_b"))
  }

  val eventsTypeOverlapSql: String =
    """WITH ut AS (
      |  SELECT DISTINCT user_id, event_type FROM events
      |)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |  COUNT(*) AS n_users
      |FROM ut a JOIN ut b ON a.user_id = b.user_id
      |WHERE a.event_type <= b.event_type
      |GROUP BY 1, 2
      |ORDER BY type_a, type_b""".stripMargin

  /** q60_decile_migration — customer revenue-decile TRANSITION matrix
    * between two consecutive years (1996 → 1997): each customer's
    * yearly revenue lands in a decile via that year's own broadcast
    * percentile cuts (the q37 no-global-sort discipline, applied
    * twice), and the matrix counts customers per (from, to) cell with
    * both years' exact-cent revenue mass. The diagonal is stability,
    * below-diagonal cells are the churn-risk cohort a retention play
    * targets, new/lapsed customers are deliberately out of frame (q38
    * owns churn) — this op is about RANK movement among the retained.
    *
    * Scale shape: two filtered year aggregates (one orders scan), two
    * broadcast cut arrays, one customer-keyed join, ≤ 100-cell output. */
  def q60DecileMigration(spark: SparkSession, dir: String): DataFrame = {
    def yearRev(y: Int): DataFrame =
      Tables.orders(spark, dir)
        .filter(year(col("o_orderdate")) === y)
        .groupBy(col("o_custkey"))
        .agg(sum(cents(col("o_totalprice"))).as("rev_cents"))
    def withDecile(df: DataFrame, as: String): DataFrame = {
      val cuts = df.agg(expr(
        "percentile(rev_cents, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("qs"))
      df.crossJoin(broadcast(cuts))
        .withColumn(as,
          (lit(1) + size(filter(col("qs"),
            c => c < col("rev_cents").cast("double")))).cast("long"))
        .drop("qs")
    }
    val a = withDecile(yearRev(1996), "decile_from")
      .select(col("o_custkey"), col("decile_from"), col("rev_cents").as("rev_from_cents"))
    val b = withDecile(yearRev(1997), "decile_to")
      .select(col("o_custkey"), col("decile_to"), col("rev_cents").as("rev_to_cents"))
    a.join(b, Seq("o_custkey"))
      .groupBy(col("decile_from"), col("decile_to"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("rev_from_cents")).as("rev_from_cents"),
        sum(col("rev_to_cents")).as("rev_to_cents"))
      .orderBy(col("decile_from"), col("decile_to"))
  }

  val q60DecileMigrationSql: String = {
    def yr(y: Int) =
      s"""SELECT o_custkey,
        |  CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents
        |FROM orders WHERE year(o_orderdate) = $y GROUP BY 1""".stripMargin
    s"""WITH ya AS (${yr(1996)}),
      |yb AS (${yr(1997)}),
      |ca AS (SELECT quantile_cont(rev_cents, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs FROM ya),
      |cb AS (SELECT quantile_cont(rev_cents, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS qs FROM yb),
      |da AS (
      |  SELECT o_custkey, rev_cents AS rev_from_cents,
      |    1 + len(list_filter((SELECT qs FROM ca), c -> c < CAST(rev_cents AS DOUBLE))) AS decile_from
      |  FROM ya
      |), db AS (
      |  SELECT o_custkey, rev_cents AS rev_to_cents,
      |    1 + len(list_filter((SELECT qs FROM cb), c -> c < CAST(rev_cents AS DOUBLE))) AS decile_to
      |  FROM yb
      |)
      |SELECT CAST(decile_from AS BIGINT) AS decile_from,
      |  CAST(decile_to AS BIGINT) AS decile_to,
      |  COUNT(*) AS n_customers,
      |  CAST(SUM(rev_from_cents) AS BIGINT) AS rev_from_cents,
      |  CAST(SUM(rev_to_cents) AS BIGINT) AS rev_to_cents
      |FROM da JOIN db USING (o_custkey)
      |GROUP BY 1, 2
      |ORDER BY decile_from, decile_to""".stripMargin
  }

  /** q59_ab_lift — hash-armed A/B experiment readout: users split into
    * two arms by the portable Knuth hash of user_id (deterministic, the
    * sample_hash_split convention), exposure = any 'view', conversion =
    * exposed AND any 'purchase', purchase value in exact cents. One row
    * carries both arms' exposed/converted counts, per-arm conversion in
    * basis points, and the A−B lift — the experiment-analysis shape a
    * product pipeline runs next to the funnel ops, with every class
    * boundary an exact integer (no float near the lift sign).
    *
    * Scale shape: one event scan → per-user conditional flags (one
    * user-keyed map-combined aggregate), then a single-row conditional
    * rollup. No joins, no windows. */
  def q59AbLift(spark: SparkSession, dir: String): DataFrame = {
    val users = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "view", 1L).otherwise(0L)).as("exposed"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchased"),
        sum(when(col("event_type") === "purchase",
          floor(col("value") * 100d + 0.5d).cast("long")).otherwise(0L)).as("val_cents"))
      .withColumn("arm",
        when(pmod(col("user_id") * 2654435761L, lit(1000000007L)) % 2L === 0L, "A")
          .otherwise("B"))
      .filter(col("exposed") === 1L)
    users
      .agg(sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "A", col("purchased")).otherwise(0L)).as("conv_a"),
        sum(when(col("arm") === "A" && col("purchased") === 1L, col("val_cents"))
          .otherwise(0L)).as("value_a_cents"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === "B", col("purchased")).otherwise(0L)).as("conv_b"),
        sum(when(col("arm") === "B" && col("purchased") === 1L, col("val_cents"))
          .otherwise(0L)).as("value_b_cents"))
      .withColumn("conv_a_bp", expr("(conv_a * 10000L) DIV greatest(n_a, 1L)"))
      .withColumn("conv_b_bp", expr("(conv_b * 10000L) DIV greatest(n_b, 1L)"))
      .withColumn("lift_bp", col("conv_a_bp") - col("conv_b_bp"))
      .select(col("n_a"), col("conv_a"), col("value_a_cents"), col("conv_a_bp"),
        col("n_b"), col("conv_b"), col("value_b_cents"), col("conv_b_bp"),
        col("lift_bp"))
  }

  val q59AbLiftSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS exposed,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchased,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS val_cents,
      |    CASE WHEN (user_id * 2654435761 % 1000000007) % 2 = 0 THEN 'A' ELSE 'B' END AS arm
      |  FROM events WHERE event_type IN ('view', 'purchase')
      |  GROUP BY user_id
      |), x AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN arm = 'A' THEN purchased ELSE 0 END) AS BIGINT) AS conv_a,
      |    CAST(SUM(CASE WHEN arm = 'A' AND purchased = 1 THEN val_cents ELSE 0 END) AS BIGINT) AS value_a_cents,
      |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN arm = 'B' THEN purchased ELSE 0 END) AS BIGINT) AS conv_b,
      |    CAST(SUM(CASE WHEN arm = 'B' AND purchased = 1 THEN val_cents ELSE 0 END) AS BIGINT) AS value_b_cents
      |  FROM u WHERE exposed = 1
      |)
      |SELECT n_a, conv_a, value_a_cents,
      |  (conv_a * 10000) // GREATEST(n_a, 1) AS conv_a_bp,
      |  n_b, conv_b, value_b_cents,
      |  (conv_b * 10000) // GREATEST(n_b, 1) AS conv_b_bp,
      |  (conv_a * 10000) // GREATEST(n_a, 1) - (conv_b * 10000) // GREATEST(n_b, 1)
      |    AS lift_bp
      |FROM x""".stripMargin
}
