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

  test("q3_join_agg plan: nation join is broadcast") {
    val plan = Analytics.q3JoinAgg(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"))
  }

  test("q4/q5: semi and anti are disjoint and cover filtered keys") {
    val semi = Analytics.q4SemiJoin(spark, sf)
    val o = spark.read.parquet(s"$sf/orders.parquet")
    assert(semi.count() > 0 && semi.count() < o.count())
    val anti = Analytics.q5AntiJoin(spark, sf)
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val urgentCusts = o.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    assert(anti.count() === c.count() - urgentCusts)
  }

  test("q7_topk: at most 3 per group, rank 1 is the group max price") {
    val res = Analytics.q7TopkPerGroup(spark, sf)
    val maxPerGroup = res.groupBy("o_custkey").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPerGroup <= 3)
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val top1 = res.filter(col("price_rank") === 1)
      .select(col("o_custkey"), col("o_totalprice").as("t1"))
    val mx = o.groupBy("o_custkey").agg(max("o_totalprice").as("mx"))
    assert(top1.join(mx, "o_custkey").filter(col("t1") =!= col("mx")).count() === 0)
  }

  test("q8_approx_distinct: within 10% of exact") {
    val approx = Analytics.q8ApproxDistinct(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Analytics.q8DistinctAgg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_customers")).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e) <= math.max(2, e / 10.0),
        s"$k approx=${approx(k)} exact=$e")
    }
  }

  test("q12_sessionize: sessions partition each user's events, gaps respected") {
    val sess = Analytics.q12Sessionize(spark, sf)
    val totalEvents = sess.agg(sum("n_events")).collect()(0).getLong(0)
    assert(totalEvents === spark.read.parquet(s"$sf/events.parquet").count())
    // no session spans a >30min internal gap start-to-start proxy:
    // every session's duration is finite and n_events >= 1
    assert(sess.filter(col("n_events") < 1 || col("duration_us") < 0).count() === 0)
  }

  test("q16_asof_join: asof_ts <= purchase_ts, and no purchase lost") {
    val res = Analytics.q16AsofJoin(spark, sf)
    val purchases = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "purchase").count()
    assert(res.count() === purchases)
    assert(res.filter(col("asof_ts") > col("purchase_ts")).count() === 0)
  }

  test("q1_agg plan: filter pushed to parquet scan, columns pruned") {
    val plan = Analytics.q1Agg(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
           plan.contains("LessThanOrEqual(l_shipdate"))
    assert(!plan.contains("l_partkey")) // pruned column must not be read
  }
  test("q19_range_join: 10 batches, every event in exactly one LSN range") {
    val res = Analytics.q19RangeJoin(spark, sf)
    val ev = graft.core.Tables.events(spark, sf)
    assert(res.count() === 10)
    assert(res.agg(sum(col("n_events"))).first().getLong(0) === ev.count())
  }

  test("q20_range_frame: trailing-7-day totals never below the day total") {
    val res = Analytics.q20RangeFrame(spark, sf)
    assert(res.filter(col("trail7_total") < col("day_total") - 1e-9).count() === 0)
  }

  test("events_funnel: one row per user, stages monotone and grounded in events") {
    val res = Analytics.eventsFunnel(spark, sf)
    val ev = graft.core.Tables.events(spark, sf)
    assert(res.count() === ev.select("user_id").distinct().count())
    assert(res.filter(col("funnel_stage") < 0 || col("funnel_stage") > 3).count() === 0)
    // a user at stage >= 1 must have at least one signup event
    val signups = ev.filter(col("event_type") === "signup").select("user_id").distinct()
    assert(res.filter(col("funnel_stage") >= 1).join(signups, Seq("user_id"), "left_anti")
      .count() === 0)
    // funnel property: |stage>=1| >= |stage>=2| >= |stage>=3|
    val n = (1 to 3).map(k => res.filter(col("funnel_stage") >= k).count())
    assert(n(0) >= n(1) && n(1) >= n(2))
  }

  test("q25_salted_join: equals the unsalted join-aggregate exactly") {
    val res = Analytics.q25SaltedJoin(spark, sf)
    val o = graft.core.Tables.orders(spark, sf)
    val c = graft.core.Tables.customer(spark, sf)
    val plain = o.join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(floor(col("o_totalprice") * 100d + 0.5d).cast("long")) / 100d).as("revenue"))
    assert(res.unionAll(plain).distinct().count() === plain.count())
  }

  test("q21_grouping_sets: grand total row present, set flags consistent") {
    val res = Analytics.q21GroupingSets(spark, sf).collect()
    val grand = res.filter(r => r.getAs[Byte]("g_pri") == 1 && r.getAs[Byte]("g_status") == 1)
    assert(grand.length === 1)
    val total = graft.core.Tables.orders(spark, sf).count()
    assert(grand(0).getAs[Long]("n_orders") === total)
    // each non-grand row aggregates exactly one dimension
    res.filter(r => !(r.getAs[Byte]("g_pri") == 1 && r.getAs[Byte]("g_status") == 1))
      .foreach(r => assert(r.getAs[Byte]("g_pri") + r.getAs[Byte]("g_status") === 1))
  }

  test("q27_interval_sweep: sweep invariants — deltas net to zero, active bounded") {
    val res = Analytics.q27IntervalSweep(spark, sf).collect()
    val nUsers = graft.core.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(res.length === 2 * nUsers) // one start + one end per span
    assert(res.map(_.getAs[Long]("delta")).sum === 0)
    val actives = res.map(_.getAs[Long]("active"))
    assert(actives.forall(a => a >= 0 && a <= nUsers))
    assert(actives.last === 0) // after the final end, nothing is active
    assert(actives.max > 1)    // spans genuinely overlap in this data
  }

  test("q28_histogram: buckets partition the orders, sums are exact cents") {
    val res = Analytics.q28Histogram(spark, sf).collect()
    val total = graft.core.Tables.orders(spark, sf).count()
    assert(res.map(_.getAs[Long]("n_orders")).sum === total)
    res.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0 && b <= 9)
      val s = r.getAs[Double]("sum_price")
      assert(math.abs(s * 100 - math.rint(s * 100)) < 1e-6)
    }
  }

  test("q29_rolling_distinct: trailing window ≥ single-day actives, ≤ total users") {
    val daily = graft.core.Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct(col("user_id")).as("d1"))
    val res = Analytics.q29RollingDistinct(spark, sf)
    val joined = res.join(daily, "day").collect()
    assert(joined.nonEmpty)
    val nUsers = graft.core.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    joined.foreach { r =>
      assert(r.getAs[Long]("active_users_7d") >= r.getAs[Long]("d1"))
      assert(r.getAs[Long]("active_users_7d") <= nUsers)
    }
  }


  test("events_markov: rows normalize to 1, transitions = events - users") {
    val res = Analytics.eventsMarkov(spark, sf).collect()
    val byPrev = res.groupBy(_.getAs[String]("prev_type"))
    byPrev.foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getAs[Double]("p")).sum - 1.0) < 1e-9)
    }
    val ev = graft.core.Tables.events(spark, sf)
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(res.map(_.getAs[Long]("n")).sum === expected)
  }

  test("q30_window_suite: ranks well-formed within each priority") {
    val res = Analytics.q30WindowSuite(spark, sf).collect()
    assert(res.nonEmpty)
    res.foreach { r =>
      val q = r.getAs[Int]("quartile")
      assert(q >= 1 && q <= 4)
      val pr = r.getAs[Double]("pct_rank")
      val cd = r.getAs[Double]("cume")
      assert(pr >= 0 && pr <= 1 && cd > 0 && cd <= 1 && cd >= pr)
      assert(r.getAs[Double]("second_lowest") <= r.getAs[Double]("o_totalprice") ||
        r.getAs[Double]("pct_rank") === 0.0)
    }
  }

  test("events_path_topk: descending, top path recounted independently") {
    val res = Analytics.eventsPathTopk(spark, sf).collect()
    assert(res.length === 10)
    val ns = res.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
    val top = res(0)
    val parts = top.getAs[String]("path").split(" > ")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
    val n = graft.core.Tables.events(spark, sf)
      .withColumn("t1", lag(col("event_type"), 2).over(w))
      .withColumn("t2", lag(col("event_type"), 1).over(w))
      .filter(col("t1") === parts(0) && col("t2") === parts(1) &&
        col("event_type") === parts(2)).count()
    assert(n === top.getAs[Long]("n"))
  }

  test("q31_unpivot: every measure covers all lineitem rows") {
    val res = Analytics.q31Unpivot(spark, sf).collect()
    assert(res.length === 4)
    val li = graft.core.Tables.lineitem(spark, sf)
    val cnt = li.count()
    res.foreach(r => assert(r.getAs[Long]("n") === cnt))
    val qtySum = li.select(sum(floor(col("l_quantity") * 100d + 0.5d).cast("long")))
      .collect()(0).getLong(0)
    assert(res.find(_.getAs[String]("measure") == "l_quantity").get
      .getAs[Long]("sum_cents") === qtySum)
  }

  test("q32_sql_api: SQL-path poly_hash equals the Column-API fingerprint path") {
    val res = Analytics.q32SqlApi(spark, sf).collect()
    assert(res.nonEmpty)
    // distinct raw texts per source, recomputed without the extension
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exact = docs.groupBy(col("source"))
      .agg(countDistinct(col("text")).as("d")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    res.foreach { r =>
      assert(r.getAs[Long]("n_distinct_texts") === exact(r.getAs[String]("source")))
    }
  }

  test("q33_streaks: day accounting exact, one user recounted by hand") {
    val res = Analytics.q33Streaks(spark, sf).collect()
    val ud = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    assert(res.map(_.getAs[Long]("n_active_days")).sum === ud.count())
    res.foreach { r =>
      assert(r.getAs[Long]("longest_streak") <= r.getAs[Long]("n_active_days"))
      assert(r.getAs[Long]("n_streaks") >= 1)
    }
    // recount user 0's longest streak from its sorted day list
    val days = ud.filter(col("user_id") === 0).collect()
      .map(_.getAs[java.sql.Date]("d").toLocalDate.toEpochDay).sorted
    var best = 1L; var cur = 1L
    days.sliding(2).foreach { case Array(a, b) =>
      if (b == a + 1) { cur += 1; best = math.max(best, cur) } else cur = 1
      case _ =>
    }
    assert(res.find(_.getAs[Long]("user_id") == 0L).get
      .getAs[Long]("longest_streak") === best)
  }

  test("stats_mad: median by hand for one group, outliers bounded") {
    val res = Analytics.statsMad(spark, sf).collect()
    val li = graft.core.Tables.lineitem(spark, sf)
    res.foreach { r =>
      assert(r.getAs[Double]("mad_cents") >= 0)
      assert(r.getAs[Long]("n_outliers") < r.getAs[Long]("n"))
    }
    val rf = res(0).getAs[String]("rf")
    val cs = li.filter(col("l_returnflag") === rf)
      .select(floor(col("l_extendedprice") * 100d + 0.5d).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cs.length
    val med = if (n % 2 == 1) cs(n / 2).toDouble else (cs(n / 2 - 1) + cs(n / 2)) / 2.0
    assert(res(0).getAs[Double]("median_cents") === med)
  }

  test("q34_hist_quantile: estimates ordered and within one bucket of exact") {
    val res = Analytics.q34HistQuantile(spark, sf).collect()
    val o = graft.core.Tables.orders(spark, sf)
    res.foreach { r =>
      val pri = r.getAs[String]("o_orderpriority")
      val e50 = r.getAs[Double]("p50_est")
      val e95 = r.getAs[Double]("p95_est")
      assert(e50 <= e95)
      val exact = o.filter(col("o_orderpriority") === pri)
        .agg(expr("percentile(o_totalprice, 0.5d)")).first().getDouble(0)
      assert(math.abs(e50 - exact) <= 50000d, s"$pri: $e50 vs $exact")
    }
  }

  test("q60_decile_migration: matrix covers exactly the customers retained across years") {
    val res = Analytics.q60DecileMigration(spark, sf).collect()
    val cells = res.map(r => ((r.getAs[Long]("decile_from"), r.getAs[Long]("decile_to")),
      r.getAs[Long]("n_customers"))).toMap
    assert(cells.keys.forall { case (f, t) => f >= 1 && f <= 10 && t >= 1 && t <= 10 })
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
    val both = o.filter(col("y") === 1996).select("o_custkey").distinct()
      .intersect(o.filter(col("y") === 1997).select("o_custkey").distinct())
      .count()
    assert(cells.values.sum === both)
  }

  test("q59_ab_lift: arms partition exposed users, counts recompute independently") {
    val r = Analytics.q59AbLift(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_type").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    val exposed = events.filter(_._2 == "view").map(_._1).toSet
    val purchased = events.filter(_._2 == "purchase").map(_._1).toSet
    def arm(u: Long) = if ((u * 2654435761L % 1000000007L) % 2 == 0) "A" else "B"
    val a = exposed.filter(arm(_) == "A")
    val b = exposed.filter(arm(_) == "B")
    assert(row.getAs[Long]("n_a") === a.size.toLong)
    assert(row.getAs[Long]("n_b") === b.size.toLong)
    assert(row.getAs[Long]("conv_a") === a.count(purchased).toLong)
    assert(row.getAs[Long]("conv_b") === b.count(purchased).toLong)
    assert(row.getAs[Long]("lift_bp") ===
      row.getAs[Long]("conv_a_bp") - row.getAs[Long]("conv_b_bp"))
  }
}
