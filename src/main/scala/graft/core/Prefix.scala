package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running computations over a global (or per-group) order.
  *
  * A window with an empty `partitionBy` funnels the whole relation
  * through ONE task (`Exchange SinglePartition`) — fine on a 60k-row
  * test table, fatal on a 100 TB change log. These helpers implement
  * the classic two-pass prefix discipline instead:
  *
  *   1. `repartitionByRange` on the order key, so range slice i holds
  *      strictly smaller keys than slice i+1 (`spark_partition_id`
  *      then IS the slice index in sort order);
  *   2. a bounded per-slice window — each window partition is one
  *      range slice, never a whole group;
  *   3. compose slice offsets from the per-slice totals (a table of
  *      ≤ `ranges` rows per group) and broadcast them back.
  *
  * The offset composition is a broadcast theta-join over the tiny
  * totals table rather than a global window, so the final plan contains
  * NO `Exchange SinglePartition` at all (PlanSpec asserts this).
  *
  * Determinism note: both consumers of the sliced frame share the same
  * range exchange subtree, which Spark reuses (`ReusedExchange` /
  * AQE stage reuse), so `spark_partition_id()` is observed on one
  * single materialized partitioning — the slice ids in the local pass
  * and the totals pass cannot disagree.
  */
object Prefix {

  /** Running sum of `value` over `order` within each `groupCols` group
    * (global when `groupCols` is empty), appended as column `out`.
    * Equivalent to `sum(value).over(Window.partitionBy(groupCols)
    * .orderBy(order).rowsBetween(unboundedPreceding, currentRow))`
    * but with per-group work spread across `ranges` range slices. */
  def runningSum(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                 value: Column, out: String, ranges: Int = 32): DataFrame = {
    val rangeKeys = groupCols.map(col) ++ order
    val sliced = df.withColumn("_ps_v", value)
      .repartitionByRange(ranges, rangeKeys: _*)
      .withColumn("_ps_slice", spark_partition_id().cast("long"))
    val sliceKeys = groupCols.map(col) :+ col("_ps_slice")
    val wLocal = Window.partitionBy(sliceKeys: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sliced.withColumn("_ps_local", sum(col("_ps_v")).over(wLocal))
    // per-slice totals (≤ ranges rows per group): slice offset = sum of
    // all strictly-earlier slices' totals within the group
    val totals = sliced.groupBy(sliceKeys: _*).agg(sum(col("_ps_v")).as("_ps_total"))
    val prior = totals.select(
      groupCols.map(c => col(c).as(s"${c}_ps_r")) ++
        Seq(col("_ps_slice").as("_ps_slice_r"), col("_ps_total").as("_ps_total_r")): _*)
    val cond = groupCols.map(c => col(c) === col(s"${c}_ps_r"))
      .foldLeft(col("_ps_slice_r") < col("_ps_slice"))(_ && _)
    val offsets = totals.join(prior, cond, "left")
      .groupBy(sliceKeys: _*)
      .agg(sum(col("_ps_total_r")).as("_ps_off"))
    local.join(broadcast(offsets), groupCols :+ "_ps_slice")
      .withColumn(out, col("_ps_local") + coalesce(col("_ps_off"), lit(0L)))
      .drop("_ps_v", "_ps_slice", "_ps_local", "_ps_off")
  }

  /** Previous value of `orderCol` in the global `orderCol` order,
    * appended as column `out` (null for the globally-first row).
    * Equivalent to `lag(orderCol, 1).over(Window.orderBy(orderCol))`
    * with the same two-pass slicing: a per-slice lag plus a boundary
    * handoff — each slice's first row takes the max of all earlier
    * slices (= the previous non-empty slice's max, robust to empty
    * range slices). */
  def lag1(df: DataFrame, orderCol: String, out: String, ranges: Int = 32): DataFrame = {
    val sliced = df.repartitionByRange(ranges, col(orderCol))
      .withColumn("_ps_slice", spark_partition_id().cast("long"))
    val wLocal = Window.partitionBy(col("_ps_slice")).orderBy(col(orderCol))
    val local = sliced.withColumn(out, lag(col(orderCol), 1).over(wLocal))
    val maxes = sliced.groupBy(col("_ps_slice")).agg(max(col(orderCol)).as("_ps_max"))
    val prior = maxes.select(col("_ps_slice").as("_ps_slice_r"), col("_ps_max"))
    val handoff = maxes.select(col("_ps_slice"))
      .join(prior, col("_ps_slice_r") < col("_ps_slice"), "left")
      .groupBy(col("_ps_slice")).agg(max(col("_ps_max")).as("_ps_prev"))
    local.join(broadcast(handoff), Seq("_ps_slice"))
      .withColumn(out, coalesce(col(out), col("_ps_prev")))
      .drop("_ps_slice", "_ps_prev")
  }
}
