package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Relational analytics core (SURVEY.md §2.C).
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
}
