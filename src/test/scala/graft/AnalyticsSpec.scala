package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

class AnalyticsSpec extends SparkSpec {

  test("q1_agg: groups, totals, and exactness") {
    val res = Analytics.q1Agg(spark, sf).collect()
    assert(res.nonEmpty && res.length <= 9) // |RF| x |LS| combos
    val totalOrders = res.map(_.getAs[Long]("count_order")).sum
    val liCount = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp")).count()
    assert(totalOrders === liCount)
    // money sums are exact cents: value*100 must be integral
    res.foreach { r =>
      val sbp = r.getAs[Double]("sum_base_price")
      assert(math.abs(sbp * 100 - math.rint(sbp * 100)) < 1e-6)
    }
  }

  test("q1_agg plan: filter pushed to parquet scan, columns pruned") {
    val plan = Analytics.q1Agg(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
           plan.contains("LessThanOrEqual(l_shipdate"))
    assert(!plan.contains("l_partkey")) // pruned column must not be read
  }
}
