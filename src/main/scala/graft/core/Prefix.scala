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
  *   1. slice the order-key domain into `ranges` contiguous intervals
  *      (boundaries from one approxQuantile pass over the pruned key
  *      column), so the slice id is a pure function of the row;
  *   2. a bounded per-slice window — each window partition is one
  *      slice of one group, never a whole group;
  *   3. compose slice offsets from the per-slice totals (a table of
  *      ≤ `ranges` rows per group) and broadcast them back.
  *
  * The offset composition is a broadcast theta-join over the tiny
  * totals table rather than a global window, so the final plan contains
  * NO `Exchange SinglePartition` at all (PlanSpec asserts this), and
  * the data stream crosses exactly one shuffle (the per-slice window's
  * hash exchange).
  *
  * Why explicit boundaries instead of `repartitionByRange` +
  * `spark_partition_id()`: the local pass and the totals pass consume
  * the sliced frame through differently-pruned subtrees, so Spark sees
  * two canonically-different range exchanges and samples range bounds
  * independently for each (seeded by RDD id). On small data the sampler
  * retains every row and the bounds agree; at real scale they need not,
  * and the two passes would disagree about slice membership — a silent
  * corruption. A boundary array computed once on the driver (the "tiny
  * collect of P boundary rows" discipline) makes slice assignment
  * branch-consistent by construction. The quantile pass reads only the
  * key column and costs one scan; boundaries are approximate, which
  * skews slice sizes, never results.
  */
object Prefix {

  /** Slice boundaries for `key` (cast to double): the 1/n .. (n-1)/n
    * approximate quantiles, deduplicated. Rows compare with `>` against
    * each boundary, so a row equal to a boundary lands in the lower
    * slice — on every branch, because the comparison is pure. */
  private def sliceBoundaries(df: DataFrame, key: Column, ranges: Int): Array[Double] = {
    require(ranges > 1, "need at least 2 ranges")
    val probs = (1 until ranges).map(_.toDouble / ranges).toArray
    df.select(key.cast("double").as("_ps_k"))
      .na.drop("all", Seq("_ps_k"))
      .stat.approxQuantile("_ps_k", probs, 0.01)
      .distinct.sorted
  }

  /** slice id = number of boundaries strictly below the row's key. */
  private def sliceOf(key: Column, bounds: Array[Double]): Column =
    bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(key.cast("double") > lit(b), 1).otherwise(0)
    }.cast("long")

  /** Running sum of `value` over `order` within each `groupCols` group
    * (global when `groupCols` is empty), appended as column `out`.
    * Equivalent to `sum(value).over(Window.partitionBy(groupCols)
    * .orderBy(order).rowsBetween(unboundedPreceding, currentRow))`
    * but with per-group work spread across ≤ `ranges` order-key slices.
    *
    * `sliceKey` must be ascending-monotone in the total order (default:
    * the first `order` column) and castable to double; ties on it stay
    * within one slice, which is always order-correct. Note the helper
    * runs the quantile action at call time. */
  def runningSum(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                 value: Column, out: String, ranges: Int = 32,
                 sliceKey: Option[Column] = None): DataFrame = {
    val k = sliceKey.getOrElse(order.head)
    val bounds = sliceBoundaries(df, k, ranges)
    val sliced = df.withColumn("_ps_v", value)
      .withColumn("_ps_slice", sliceOf(k, bounds))
    val sliceKeys = groupCols.map(col) :+ col("_ps_slice")
    val wLocal = Window.partitionBy(sliceKeys: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null discipline mirrors the window ground truth exactly: sum-over-
    // window skips nulls but stays null until the first non-null value.
    // The local pass therefore carries a null-coalesced running sum AND
    // a running non-null count; the composed result reverts to null
    // when no non-null value precedes the row in the whole group.
    val local = sliced
      .withColumn("_ps_local", sum(coalesce(col("_ps_v"), lit(0L))).over(wLocal))
      .withColumn("_ps_seen", count(col("_ps_v")).over(wLocal))
    // per-slice totals (≤ ranges rows per group): slice offset = sum of
    // all strictly-earlier slices' totals within the group
    val totals = sliced.groupBy(sliceKeys: _*)
      .agg(sum(coalesce(col("_ps_v"), lit(0L))).as("_ps_total"),
        count(col("_ps_v")).as("_ps_n"))
    val prior = totals.select(
      groupCols.map(c => col(c).as(s"${c}_ps_r")) ++
        Seq(col("_ps_slice").as("_ps_slice_r"), col("_ps_total").as("_ps_total_r"),
          col("_ps_n").as("_ps_n_r")): _*)
    val cond = groupCols.map(c => col(c) === col(s"${c}_ps_r"))
      .foldLeft(col("_ps_slice_r") < col("_ps_slice"))(_ && _)
    val offsets = totals.join(prior, cond, "left")
      .groupBy(sliceKeys: _*)
      .agg(sum(col("_ps_total_r")).as("_ps_off"),
        sum(col("_ps_n_r")).as("_ps_n_off"))
    local.join(broadcast(offsets), groupCols :+ "_ps_slice")
      .withColumn(out,
        when(col("_ps_seen") + coalesce(col("_ps_n_off"), lit(0L)) > 0L,
          col("_ps_local") + coalesce(col("_ps_off"), lit(0L))))
      .drop("_ps_v", "_ps_slice", "_ps_local", "_ps_seen", "_ps_off", "_ps_n_off")
  }

  /** Previous value of `orderCol` in the global `orderCol` order,
    * appended as column `out` (null for the globally-first row).
    * Equivalent to `lag(orderCol, 1).over(Window.orderBy(orderCol))`
    * with the same slicing: a per-slice lag plus a boundary handoff —
    * each slice's first row takes the max of all earlier slices (= the
    * previous non-empty slice's max, robust to empty slices). */
  def lag1(df: DataFrame, orderCol: String, out: String, ranges: Int = 32): DataFrame = {
    val bounds = sliceBoundaries(df, col(orderCol), ranges)
    val sliced = df.withColumn("_ps_slice", sliceOf(col(orderCol), bounds))
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
