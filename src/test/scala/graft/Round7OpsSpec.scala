package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Analytics, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.cdc.{CdcOps, Reconcile}
import graft.core.Tables

/** Semantic checks for the round-7 widening ops (the oracle checks
  * value-equality; these pin the invariants that MAKE the values
  * right). */
class Round7OpsSpec extends SparkSpec {

  test("q35_cube: grand total row equals the table count; all four grouping sets present") {
    val out = Analytics.q35Cube(spark, sf).cache()
    val total = Tables.orders(spark, sf).count()
    val grand = out.filter(col("g_status") === 1 && col("g_year") === 1).collect()
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_orders") == total)
    // the four (g_status, g_year) combinations all materialize
    val sets = out.select(col("g_status"), col("g_year")).distinct().count()
    assert(sets == 4)
    // per-axis subtotals also sum to the table count
    val byStatus = out.filter(col("g_status") === 0 && col("g_year") === 1)
      .agg(sum(col("n_orders"))).head.getLong(0)
    assert(byStatus == total)
    out.unpersist()
  }

  test("stats_moments: exact-carrier derivation tracks Spark's own population moments") {
    val out = Reconcile.statsMoments(spark, sf).collect()
    assert(out.nonEmpty)
    // recompute on the same quantized grid with Spark's built-ins
    val q = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        floor(col("l_quantity") + 0.5d).cast("long").cast("double").as("x"))
      .groupBy(col("l_returnflag"))
      .agg(var_pop(col("x")).as("v"), skewness(col("x")).as("sk"),
        kurtosis(col("x")).as("ku"))
      .collect().map(r => r.getString(0) -> r).toMap
    out.foreach { r =>
      val ref = q(r.getAs[String]("l_returnflag"))
      assert(math.abs(r.getAs[Double]("var_q") - ref.getAs[Double]("v")) < 1e-6)
      assert(math.abs(r.getAs[Double]("skew_q") - ref.getAs[Double]("sk")) < 1e-6)
      assert(math.abs(r.getAs[Double]("kurt_q") - ref.getAs[Double]("ku")) < 1e-6)
    }
  }

  test("cdc_key_churn: op mix partitions the change count; classes match thresholds") {
    val out = CdcOps.keyChurn(spark, sf).cache()
    val totalEvents = Tables.events(spark, sf).count()
    assert(out.agg(sum(col("n_changes"))).head.getLong(0) == totalEvents)
    assert(out.filter(col("n_inserts") + col("n_updates") + col("n_deletes")
      =!= col("n_changes")).isEmpty)
    assert(out.filter(col("churn_class") === "HOT" && col("n_changes") < 20).isEmpty)
    assert(out.filter(col("churn_class") === "COLD" && col("n_changes") >= 5).isEmpty)
    assert(out.filter(col("offset_span") =!=
      col("last_offset") - col("first_offset")).isEmpty)
    out.unpersist()
  }

  test("recon_flush_lag: row lag recovers exactly the planted drops; HOLES vs LAGGING split") {
    val out = Reconcile.reconFlushLag(spark, sf).cache()
    val planted = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 1000 === 7).count()
    assert(out.agg(sum(col("lag_rows"))).head.getLong(0) == planted)
    // the confirmed mark can never pass the source's
    assert(out.filter(col("confirmed_lsn") > col("src_max_lsn")).isEmpty)
    // status definition: HOLES ⇔ lag_lsn = 0 with missing rows
    assert(out.filter(col("lag_status") === "HOLES" &&
      (col("lag_lsn") =!= 0 || col("lag_rows") === 0)).isEmpty)
    assert(out.filter(col("lag_status") === "CURRENT" &&
      (col("lag_lsn") =!= 0 || col("lag_rows") =!= 0)).isEmpty)
    out.unpersist()
  }

  test("knn_radius: every hit clears the radius; agrees with brute force above it") {
    val radius = Similarity.knnRadius(spark, sf).cache()
    assert(radius.filter(col("cos_sim") < Similarity.RadiusTau).isEmpty)
    // n_in_radius is the per-query group size
    val sizes = radius.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n"), max(col("n_in_radius")).as("rep"),
        min(col("n_in_radius")).as("rep2"))
    assert(sizes.filter(col("n") =!= col("rep") || col("n") =!= col("rep2")).isEmpty)
    // any brute-force neighbor at or above τ must be in the radius set
    val bruteHits = Similarity.knnBrute(spark, sf)
      .filter(col("cos_sim") >= Similarity.RadiusTau)
      .select(col("query_id"), col("neighbor_id"))
    assert(bruteHits.exceptAll(
      radius.select(col("query_id"), col("neighbor_id"))).isEmpty)
    radius.unpersist()
  }

  test("embed_norm_profile: totals cover the corpus; bounds order; no degenerate vectors planted") {
    val out = Similarity.embedNormProfile(spark, sf).cache()
    assert(out.agg(sum(col("n_vecs"))).head.getLong(0) ==
      Tables.embeddings(spark, sf).count())
    assert(out.filter(col("min_nrm2") > col("max_nrm2")).isEmpty)
    assert(out.filter(col("avg_nrm2") < col("min_nrm2").cast("double") ||
      col("avg_nrm2") > col("max_nrm2").cast("double")).isEmpty)
    out.unpersist()
  }

  test("text_sentences: char accounting bounded by the doc; punctuation-free doc is one sentence") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), length(col("text")).as("n"))
    val out = TextAnalysis.textSentences(spark, sf).join(docs, "doc_id").cache()
    // sentence chars can never exceed the raw doc (separators are dropped)
    assert(out.filter(col("sent_chars") > col("n")).isEmpty)
    assert(out.filter(col("max_sentence_chars") > col("sent_chars")).isEmpty)
    assert(out.filter(col("n_sentences") === 0 && col("shape_class") =!= "EMPTY").isEmpty)
    // a non-empty doc with no terminal punctuation must be exactly one sentence
    val noPunct = Tables.documents(spark, sf)
      .filter(!col("text").rlike("[.!?]") && length(col("text")) > 0)
      .select(col("doc_id"))
    val joined = out.join(noPunct, "doc_id")
    assert(joined.filter(col("n_sentences") =!= 1).isEmpty)
    out.unpersist()
  }

  test("shard_balance: rollup agrees with the shard_pack manifest and raw byte totals") {
    val out = TextAnalysis.shardBalance(spark, sf).cache()
    val pack = TextAnalysis.shardPack(spark, sf)
      .groupBy(col("source")).agg(count(lit(1)).as("exp_shards"),
        sum(col("shard_bytes")).as("exp_bytes"))
    val joined = out.join(pack, "source")
    assert(joined.filter(col("n_shards") =!= col("exp_shards") ||
      col("total_bytes") =!= col("exp_bytes")).isEmpty)
    // raw corpus bytes equal the packed totals (nothing lost in packing)
    val raw = Tables.documents(spark, sf)
      .agg(sum(octet_length(col("text")))).head.getLong(0)
    assert(out.agg(sum(col("total_bytes"))).head.getLong(0) == raw)
    // a source can only overfill (fill_frac > 1) via an oversized single doc
    assert(out.filter(col("fill_frac") > 1.0d &&
      col("max_shard_bytes") <= 4096L).isEmpty)
    out.unpersist()
  }

  test("recon_amount_parity: the global dollar delta decomposes into the planted drifts") {
    val out = Reconcile.reconAmountParity(spark, sf).cache()
    val cents = floor(col("o_totalprice") * 100d + 0.5d).cast("long")
    val o = Tables.orders(spark, sf)
    // +100 cents per perturbed KEPT row, minus the full cents of dropped rows
    val perturbedKept = o.filter(col("o_orderkey") % 500 === 3 &&
      col("o_orderkey") % 1000 =!= 7).count()
    val droppedCents = o.filter(col("o_orderkey") % 1000 === 7)
      .agg(sum(cents)).head.getLong(0)
    val totalDelta = out.agg(sum(col("delta_cents"))).head.getLong(0)
    assert(totalDelta == 100L * perturbedKept - droppedCents)
    assert(out.filter(col("parity_class") === "MATCH" &&
      col("delta_cents") =!= 0).isEmpty)
    out.unpersist()
  }

  test("events_inactivity: event accounting and class definitions hold") {
    val out = Analytics.eventsInactivity(spark, sf).cache()
    assert(out.agg(sum(col("n_events"))).head.getLong(0) ==
      Tables.events(spark, sf).count())
    assert(out.filter(col("activity_class") === "SINGLETON" &&
      col("n_events") =!= 1).isEmpty)
    // the largest gap can never be smaller than the mean gap
    assert(out.filter(col("n_events") > 1 &&
      col("max_gap_us").cast("double") < col("avg_gap_us") - 1e-6).isEmpty)
    assert(out.filter(col("span_us") =!= col("last_us") - col("first_us")).isEmpty)
    out.unpersist()
  }

  test("embed_sim_hist: buckets partition exactly the windowed within-label pair count") {
    val out = Similarity.embedSimHist(spark, sf).cache()
    // expected count under the SAME `vec_b - vec_a <= SimHistBand` window
    // predicate the op samples with — exhaustive only while max vec_id
    // stays within the band, so the test tracks the op's semantics even
    // if the gate dataset grows past SimHistBand
    val ids = Tables.embeddings(spark, sf).select(col("label"), col("vec_id"))
    val windowed = ids.toDF("label", "vec_a")
      .join(ids.toDF("label", "vec_b"), Seq("label"))
      .filter(col("vec_a") < col("vec_b") &&
        col("vec_b") - col("vec_a") <= Similarity.SimHistBand)
      .count()
    assert(out.agg(sum(col("n_pairs"))).head.getLong(0) == windowed)
    assert(out.filter(col("bucket") < -20 || col("bucket") > 20).isEmpty)
    assert(out.filter(abs(col("bucket_lo") * 20d - col("bucket")) > 1e-12).isEmpty)
    out.unpersist()
  }

  test("stream_key_churn: the replayed stateful counters equal the batch group-by exactly") {
    val stream = graft.streaming.CdcStream.streamKeyChurn(spark, sf)
    val batch = CdcOps.keyChurn(spark, sf)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("churnCounters over MemoryStream: counters accumulate across batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.{CdcStream, ChangeEvent}
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ChangeEvent]
    val q = CdcStream.churnCounters(spark, input.toDF())
      .writeStream.format("memory").queryName("t_churn")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update).start()
    input.addData(ChangeEvent(5, 1, "I", 1.0, 0), ChangeEvent(7, 1, "U", 2.0, 1))
    q.processAllAvailable()
    // second batch extends the SAME key: counters must fold, not reset
    input.addData(ChangeEvent(2, 1, "U", 3.0, 2), ChangeEvent(9, 1, "D", 0.0, 3))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("t_churn")
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("n_changes"), col("n_inserts"), col("n_updates"),
        col("n_deletes"), col("first_offset"), col("last_offset")), col("n_changes")).as("s"))
      .select(col("s.*")).collect().head
    assert(fin.getLong(0) == 4L) // n_changes
    assert(fin.getLong(1) == 1L && fin.getLong(2) == 2L && fin.getLong(3) == 1L)
    assert(fin.getLong(4) == 2L) // first_offset: min across batches (late low offset)
    assert(fin.getLong(5) == 9L) // last_offset
  }

  test("q36_trade_flows: no diagonal, and the matrix total matches an independent recount") {
    val out = Analytics.q36TradeFlows(spark, sf).cache()
    assert(out.filter(col("cust_nation") === col("supp_nation")).isEmpty)
    val l = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_suppkey"))
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val c = Tables.customer(spark, sf).select(col("c_custkey"), col("c_nationkey"))
    val s = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_nationkey"))
    val expected = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .filter(c("c_nationkey") =!= s("s_nationkey")).count()
    assert(out.agg(sum(col("n_items"))).head.getLong(0) == expected)
    out.unpersist()
  }

  test("events_rfm: scores stay in 1..4 and the segment ladder is consistent") {
    val out = Analytics.eventsRfm(spark, sf).cache()
    assert(out.count() ==
      Tables.events(spark, sf).select(col("user_id")).distinct().count())
    for (cName <- Seq("r_score", "f_score", "m_score"))
      assert(out.filter(col(cName) < 1 || col(cName) > 4).isEmpty)
    assert(out.filter(col("segment") === "CHAMPION" &&
      (col("r_score") < 3 || col("f_score") < 3 || col("m_score") < 3)).isEmpty)
    assert(out.filter(col("segment") === "LOST" &&
      (col("r_score") > 1 || col("f_score") > 1)).isEmpty)
    // quartile thresholds put roughly balanced mass in each frequency score
    val fDist = out.groupBy(col("f_score")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(fDist.values.sum == out.count() && fDist.nonEmpty)
    out.unpersist()
  }

  test("sample_class_balance: every class lands exactly on the min-class quota") {
    val out = TextAnalysis.sampleClassBalance(spark, sf).cache()
    val minClass = Tables.documents(spark, sf)
      .groupBy(col("lang")).count().agg(min(col("count"))).head.getLong(0)
    val perClass = out.groupBy(col("lang")).count()
    assert(perClass.filter(col("count") =!= minClass).isEmpty)
    assert(out.select(max(col("rk"))).head.getInt(0).toLong == minClass)
    // deterministic: a second run picks the identical docs
    val again = TextAnalysis.sampleClassBalance(spark, sf)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("q36_trade_flows plan: the fact-fact join shuffles, dimension decodes broadcast") {
    // at test scale everything fits under the auto-broadcast threshold;
    // disable it so the plan shows the 100 TB shape the op is designed for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = plan(Analytics.q36TradeFlows(spark, sf))
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"))
      // the two explicit nation decodes still broadcast
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 2)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dedup_minhash_audit: buckets cover exactly the true near-dup pairs") {
    val out = graft.operators.Dedup.dedupMinhashAudit(spark, sf).cache()
    val truePairs = graft.operators.Dedup.dedupNgramJaccard(spark, sf).count()
    assert(out.agg(sum(col("n_pairs"))).head.getLong(0) == truePairs)
    assert(out.filter(col("n_detected") > col("n_pairs")).isEmpty)
    // jaccard >= 0.35 puts every bucket in [3, 10]
    assert(out.filter(col("bucket") < 3 || col("bucket") > 10).isEmpty)
    assert(out.filter(abs(col("recall") -
      col("n_detected").cast("double") / col("n_pairs").cast("double")) > 1e-12).isEmpty)
    out.unpersist()
  }

  test("embed_dim_profile: one row per dimension, full corpus coverage, ordered bounds") {
    val out = Similarity.embedDimProfile(spark, sf).cache()
    val nVecs = Tables.embeddings(spark, sf).count()
    val dims = Tables.embeddings(spark, sf)
      .select(size(col("embedding"))).distinct().collect().map(_.getInt(0))
    assert(dims.length == 1 && out.count() == dims.head.toLong)
    assert(out.filter(col("n") =!= nVecs).isEmpty)
    assert(out.filter(col("mean_q") < col("min_q").cast("double") ||
      col("mean_q") > col("max_q").cast("double")).isEmpty)
    assert(out.filter(col("range_q") =!= col("max_q") - col("min_q")).isEmpty)
    out.unpersist()
  }

  test("events_cohort_ltv: each cohort's curve ends at its users' total purchase cents") {
    val out = Analytics.eventsCohortLtv(spark, sf).cache()
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"), col("value"))
    val uw = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    val cohortTotals = ev.withColumn("cohort_day", min(col("d")).over(uw))
      .groupBy(col("cohort_day").cast("timestamp").as("cohort_day"))
      .agg(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100d + 0.5d).cast("long")).otherwise(0L)).as("total_cents"))
    val finalRows = out.groupBy(col("cohort_day"))
      .agg(max_by(col("cum_cents"), col("age_days")).as("final_cents"))
    assert(finalRows.join(cohortTotals, "cohort_day")
      .filter(col("final_cents") =!= col("total_cents")).isEmpty)
    // every cohort starts at age 0 (its members were active that day)
    val cohorts = out.select(col("cohort_day")).distinct().count()
    assert(out.filter(col("age_days") === 0).count() == cohorts)
    assert(out.filter(abs(col("ltv_cents_per_user") -
      col("cum_cents").cast("double") / col("cohort_size").cast("double")) > 1e-9).isEmpty)
    out.unpersist()
  }

  test("basket_affinity: pair counts match an independent self-join recount") {
    val out = Analytics.basketAffinity(spark, sf).cache()
    assert(out.filter(col("part_a") >= col("part_b")).isEmpty)
    assert(out.filter(col("co_orders") < 2).isEmpty)
    // recount via the naive self-join the operator deliberately avoids
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val naive = li.as("a").join(li.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("co2"))
      .filter(col("co2") >= 2)
    assert(out.join(naive, Seq("part_a", "part_b"), "full")
      .filter(col("co_orders").isNull || col("co2").isNull ||
        col("co_orders") =!= col("co2")).isEmpty)
    // lift identity: lift * n_a * n_b == co * N for every row
    val n = li.select(col("l_orderkey")).distinct().count()
    assert(out.filter(abs(col("lift") * col("n_a") * col("n_b") -
      col("co_orders") * lit(n)) > 1e-6).isEmpty)
    out.unpersist()
  }

  test("text_bm25_terms: per-doc top-5, scores nonincreasing, df consistent") {
    val out = TextAnalysis.textBm25Terms(spark, sf).cache()
    val perDoc = out.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("k"), max(col("rank")).as("maxr"))
    assert(perDoc.filter(col("k") > 5 || col("k") =!= col("maxr")).isEmpty)
    // rank order implies score order (ties broken by term, so >= suffices)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("rank"))
    assert(out.withColumn("prev", lag(col("score"), 1).over(w))
      .filter(col("prev").isNotNull && col("prev") < col("score")).isEmpty)
    // df is a global per-term constant
    assert(out.groupBy(col("term")).agg(countDistinct(col("df")).as("d"))
      .filter(col("d") =!= 1).isEmpty)
    out.unpersist()
  }

  test("recon_key_skew: one row whose distribution stats are internally consistent") {
    val r = Reconcile.reconKeySkew(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val nKeys = row.getAs[Long]("n_keys"); val nRows = row.getAs[Long]("n_rows")
    val minR = row.getAs[Long]("min_rows"); val maxR = row.getAs[Long]("max_rows")
    assert(minR <= maxR && nKeys > 0 && nRows >= nKeys)
    assert(row.getAs[Double]("p50_rows") <= row.getAs[Double]("p99_rows"))
    assert(row.getAs[Double]("p99_rows") <= maxR.toDouble)
    assert(math.abs(row.getAs[Double]("mean_rows") * nKeys - nRows) < 1e-6)
    val skew = row.getAs[Double]("skew_ratio")
    assert(math.abs(skew - maxR.toDouble * nKeys / nRows) < 1e-12)
    assert(row.getAs[String]("strategy") == (if (skew >= 4d) "SALT" else "HASH"))
  }

  test("events_conversion_latency: latency nonnegative, converted ≤ signups, rate consistent") {
    val out = Analytics.eventsConversionLatency(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_converted") > col("n_signups")).isEmpty)
    assert(out.filter(col("p50_latency_s") < 0 ||
      col("p90_latency_s") < col("p50_latency_s")).isEmpty)
    assert(out.filter(abs(col("conversion_rate") -
      col("n_converted").cast("double") / col("n_signups").cast("double")) > 1e-12).isEmpty)
    // cohort signup totals cover every signup user exactly once
    val signups = Tables.events(spark, sf)
      .filter(col("event_type") === "signup")
      .select(col("user_id")).distinct().count()
    assert(out.agg(sum(col("n_signups"))).head.getLong(0) == signups)
    out.unpersist()
  }

  test("events_hourly_heatmap: cells partition the event stream, shares sum to 1") {
    val out = Analytics.eventsHourlyHeatmap(spark, sf).cache()
    val total = Tables.events(spark, sf).count()
    assert(out.agg(sum(col("n_events"))).head.getLong(0) == total)
    assert(out.count() <= 168)
    assert(out.filter(col("dow") < 1 || col("dow") > 7 ||
      col("hour") < 0 || col("hour") > 23).isEmpty)
    val shareSum = out.agg(sum(col("share"))).head.getDouble(0)
    assert(math.abs(shareSum - 1.0) < 1e-9)
    out.unpersist()
  }

  test("dedup_cluster_stats: histogram accounts for every labeled doc; removable = covered - clusters") {
    val out = graft.operators.Dedup.dedupClusterStats(spark, sf).cache()
    val clustered = graft.operators.Dedup.dedupClusters(spark, sf)
    assert(out.agg(sum(col("docs_in_bucket"))).head.getLong(0) == clustered.count())
    assert(out.filter(col("cluster_size") < 2).isEmpty, "labels only exist for real clusters")
    assert(out.filter(col("removable") =!=
      col("docs_in_bucket") - col("n_clusters")).isEmpty)
    out.unpersist()
  }

  test("q37_decile_report: deciles partition the orders, revenue shares sum to 1") {
    val out = Analytics.q37DecileReport(spark, sf).cache()
    val total = Tables.orders(spark, sf).count()
    assert(out.agg(sum(col("n_orders"))).head.getLong(0) == total)
    assert(out.count() == 10)
    // decile bucket sizes are within interpolation slack of N/10
    assert(out.filter(abs(col("n_orders") - lit(total / 10L)) > lit(total / 10L / 2L)).isEmpty)
    assert(math.abs(out.agg(sum(col("rev_share"))).head.getDouble(0) - 1.0) < 1e-9)
    // deciles are ordered by price range
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("decile"))
    assert(out.withColumn("prev_max", lag(col("max_price"), 1).over(w))
      .filter(col("prev_max").isNotNull && col("min_price") < col("prev_max")).isEmpty)
    out.unpersist()
  }

  test("q38_churned_customers: churned recount matches a per-year anti-join") {
    val out = Analytics.q38ChurnedCustomers(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_churned") > col("n_active")).isEmpty)
    val o = Tables.orders(spark, sf)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr")).distinct()
    val years = out.select(col("yr")).collect().map(_.getInt(0))
    for (y <- years) {
      val churned = o.filter(col("yr") === y).select(col("o_custkey"))
        .except(o.filter(col("yr") === y + 1).select(col("o_custkey"))).count()
      val claimed = out.filter(col("yr") === y).head.getAs[Long]("n_churned")
      assert(claimed == churned, s"year $y: $claimed vs recount $churned")
    }
    out.unpersist()
  }

  test("text_charset_profile: class counts partition every character") {
    val out = TextAnalysis.textCharsetProfile(spark, sf).cache()
    assert(out.filter(col("n_alpha") + col("n_digit") + col("n_space") +
      col("n_other") =!= col("n_chars")).isEmpty)
    assert(out.filter(col("n_other") < 0).isEmpty)
    val totalChars = Tables.documents(spark, sf)
      .agg(sum(length(col("text")))).head.getLong(0)
    assert(out.agg(sum(col("n_chars"))).head.getLong(0) == totalChars)
    out.unpersist()
  }

  test("q39_trend_slope: constant-revenue series yields zero slope; frames are full") {
    val out = Analytics.q39TrendSlope(spark, sf).cache()
    assert(out.count() > 0)
    // week_cents is the trailing frame sum: recompute from day_cents
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("d")).rowsBetween(-6, 0)
    val re = Analytics.q39TrendSlope(spark, sf)
      .select(col("d"), col("day_cents"))
      .withColumn("wk", sum(col("day_cents")).over(w))
    // only rows whose 6 predecessors are all emitted rows can be compared;
    // spot-check the invariant on the slope definition instead: a flat
    // synthetic frame must give slope exactly 0
    import spark.implicits._
    val flat = (0L until 10L).map(i => (i, 1000L)).toDF("x", "day_cents")
    val fw = org.apache.spark.sql.expressions.Window
      .orderBy(col("x")).rowsBetween(-6, 0)
    val slopes = flat
      .withColumn("n", count(lit(1)).over(fw))
      .withColumn("sx", sum(col("x")).over(fw))
      .withColumn("sy", sum(col("day_cents")).over(fw))
      .withColumn("sxy", sum(col("x") * col("day_cents")).over(fw))
      .withColumn("sxx", sum(col("x") * col("x")).over(fw))
      .filter(col("n") === 7)
      .withColumn("slope", (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
    assert(slopes.filter(col("slope") =!= 0d).isEmpty)
    re.unpersist(); out.unpersist()
  }

  test("sample_kfold: folds partition the corpus, deviations sum to zero per lang") {
    val out = TextAnalysis.sampleKfold(spark, sf).cache()
    val total = Tables.documents(spark, sf).count()
    assert(out.agg(sum(col("n_docs"))).head.getLong(0) == total)
    assert(out.filter(col("fold") < 0 || col("fold") > 4).isEmpty)
    // per-lang deviations telescope: sum over folds = K*lang_total - K*lang_total = 0
    assert(out.groupBy(col("lang")).agg(sum(col("balance_dev")).as("s"))
      .filter(col("s") =!= 0L).isEmpty)
    // the hash balances where the law of large numbers applies: FOLD
    // TOTALS (≈N/5 docs each — per-(fold,lang) cells are binomially
    // noisy at small sf and are the op's OUTPUT, not its invariant)
    val foldTotals = out.groupBy(col("fold")).agg(sum(col("n_docs")).as("n"))
    assert(foldTotals.count() == 5)
    val expected = total.toDouble / 5d
    assert(foldTotals.filter(col("n") > expected * 1.2 || col("n") < expected * 0.8).isEmpty)
    out.unpersist()
  }

  test("text_ngram_novelty: first doc is fully novel, exact copies are fully stale") {
    val out = graft.operators.Dedup.textNgramNovelty(spark, sf).cache()
    // the smallest doc_id with shingles has novelty exactly 1
    val first = out.orderBy(col("doc_id")).limit(1).head
    assert(first.getAs[Double]("novelty") == 1.0)
    // planted exact copies (doc_id + 1_000_000) can never claim a first
    // occurrence: every shingle already exists in the base doc
    assert(out.filter(col("doc_id") >= 1000000L && col("doc_id") < 2000000L)
      .filter(col("n_novel") =!= 0L).isEmpty)
    assert(out.filter(col("n_novel") > col("n_shingles")).isEmpty)
    out.unpersist()
  }

  test("q40_max_drawdown: one row per year, drawdown nonnegative, trough inside the year") {
    val out = Analytics.q40MaxDrawdown(spark, sf).cache()
    val years = Tables.orders(spark, sf)
      .select(year(col("o_orderdate"))).distinct().count()
    assert(out.count() == years)
    assert(out.filter(col("max_drawdown_scaled") < 0).isEmpty)
    assert(out.filter(year(col("trough_day")) =!= col("yr")).isEmpty)
    out.unpersist()
  }

  test("q41_supplier_returns: rates bounded, volume gate holds, returned ≤ total") {
    val out = Analytics.q41SupplierReturns(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("n_lines") < 20).isEmpty)
    assert(out.filter(col("n_returned") > col("n_lines") ||
      col("returned_cents") > col("rev_cents")).isEmpty)
    assert(out.filter(col("return_rate") < 0 || col("return_rate") > 1 ||
      col("returned_share") < 0 || col("returned_share") > 1).isEmpty)
    out.unpersist()
  }

  test("dedup_simhash_audit: buckets cover the true pairs; detected never exceeds pairs") {
    val out = graft.operators.Dedup.dedupSimhashAudit(spark, sf).cache()
    val truePairs = graft.operators.Dedup.dedupNgramJaccard(spark, sf).count()
    assert(out.agg(sum(col("n_pairs"))).head.getLong(0) == truePairs)
    assert(out.filter(col("n_detected") > col("n_pairs")).isEmpty)
    assert(out.filter(col("bucket") < 3 || col("bucket") > 10).isEmpty)
    out.unpersist()
  }

  test("recon_column_drift: histograms cover both sides; drift appears in ≥1 bucket") {
    val out = Reconcile.reconColumnDrift(spark, sf).cache()
    val nSrc = Tables.orders(spark, sf).count()
    val nTgt = Reconcile.driftedTarget(spark, sf).count()
    assert(out.agg(sum(col("n_src"))).head.getLong(0) == nSrc)
    assert(out.agg(sum(col("n_tgt"))).head.getLong(0) == nTgt)
    assert(out.filter(col("bucket") < 0 || col("bucket") > 19).isEmpty)
    // the planted +1.00 drift and dropped/extra keys must be visible
    assert(out.filter(col("drifted")).count() >= 1)
    out.unpersist()
  }

  test("embed_dup_vectors: exactly the planted copies are detected") {
    val out = Similarity.embedDupVectors(spark, sf).cache()
    val planted = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 13 === 0).count()
    // every planted copy forms a group of ≥2 with its base vector;
    // natural exact dups may add groups but never reduce them
    assert(out.count() >= planted.min(1L))
    assert(out.agg(sum(col("n_copies") - 1)).head.getLong(0) >= planted)
    assert(out.filter(col("n_copies") < 2).isEmpty)
    // canonical id is the group min: checksum must exceed canonical * n
    assert(out.filter(col("id_checksum") <= col("canonical_vec_id") * col("n_copies"))
      .filter(col("n_copies") >= 2).isEmpty)
    out.unpersist()
  }

  test("q42_backlog_aging: only open orders counted, shares sum to 1") {
    val out = Analytics.q42BacklogAging(spark, sf).cache()
    val open = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") =!= "F").count()
    assert(out.agg(sum(col("n_orders"))).head.getLong(0) == open)
    assert(math.abs(out.agg(sum(col("backlog_share"))).head.getDouble(0) - 1.0) < 1e-9)
    assert(out.filter(!col("age_band").isin("0_FRESH", "1_AGING", "2_STALE", "3_ANCIENT")).isEmpty)
    out.unpersist()
  }

  test("events_mix_drift: identical consecutive mixes give zero L1; bounds hold") {
    val out = Analytics.eventsMixDrift(spark, sf).cache()
    assert(out.count() > 0)
    // L1 of two distributions is in [0, 2]
    assert(out.filter(col("l1") < 0 || col("l1") > 2).isEmpty)
    // first week (no predecessor) never appears
    val firstWeek = Tables.events(spark, sf)
      .agg(date_trunc("week", min(col("ts")))).head.getTimestamp(0)
    assert(out.filter(col("week") === firstWeek).isEmpty)
    out.unpersist()
  }

  test("events_power_users: exactly the top-20, ordered, shares consistent") {
    val out = Analytics.eventsPowerUsers(spark, sf).cache()
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(out.count() == math.min(20L, nUsers))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("rank"))
    assert(out.withColumn("prev_n", lag(col("n_events"), 1).over(w))
      .filter(col("prev_n").isNotNull && col("n_events") > col("prev_n")).isEmpty)
    // rank-1 user really is the argmax of a direct recount
    val top = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).orderBy(col("n").desc, col("user_id"))
      .limit(1).head
    val claimed = out.filter(col("rank") === 1).head
    assert(claimed.getAs[Long]("user_id") == top.getAs[Long]("user_id"))
    assert(claimed.getAs[Long]("n_events") == top.getAs[Long]("n"))
    out.unpersist()
  }

  test("q43_discount_bands: net = gross - discount; bands cover all lines") {
    val out = Analytics.q43DiscountBands(spark, sf).cache()
    assert(out.agg(sum(col("n_lines"))).head.getLong(0) ==
      Tables.lineitem(spark, sf).count())
    assert(out.filter(col("net_cents") =!=
      col("gross_cents") - col("discount_cents")).isEmpty)
    // zero-discount band forgoes nothing
    assert(out.filter(col("disc_pct") === 0 && col("discount_cents") =!= 0).isEmpty)
    assert(out.filter(col("discount_cents") > col("gross_cents")).isEmpty)
    out.unpersist()
  }

  test("recon_pk_violations: both planted conflict classes surface, nothing else") {
    val out = Reconcile.reconPkViolations(spark, sf).cache()
    assert(out.filter(col("n_rows") < 2).isEmpty)
    // planted moduli are the only sources of violations
    assert(out.filter(col("o_orderkey") % 777 =!= 5 &&
      col("o_orderkey") % 777 =!= 9).isEmpty)
    assert(out.filter(col("o_orderkey") % 777 === 5)
      .filter(col("conflict_kind") =!= "IDENTICAL_COPY").isEmpty)
    assert(out.filter(col("o_orderkey") % 777 === 9)
      .filter(col("conflict_kind") =!= "CONFLICTING_VALUES").isEmpty)
    assert(out.count() > 0)
    out.unpersist()
  }

  test("q44_reorder_cadence: gap counts telescope to orders minus customers") {
    val out = Analytics.q44ReorderCadence(spark, sf).cache()
    val o = Tables.orders(spark, sf)
    val nOrders = o.count()
    val nCustomers = o.select(col("o_custkey")).distinct().count()
    // each customer with k orders contributes k-1 gaps
    assert(out.agg(sum(col("n_gaps"))).head.getLong(0) == nOrders - nCustomers)
    assert(out.filter(col("p90_gap_days") < col("p50_gap_days")).isEmpty)
    assert(out.filter(col("mean_gap_days") < 0).isEmpty)
    out.unpersist()
  }

  test("dedup_shingle_df_profile: bands partition the shingle vocabulary") {
    val out = graft.operators.Dedup.dedupShingleDfProfile(spark, sf).cache()
    assert(math.abs(out.agg(sum(col("shingle_share"))).head.getDouble(0) - 1.0) < 1e-9)
    // occurrences recount: total shingle instances across the corpus
    val totalOcc = graft.operators.Dedup
      .shinglesOf(graft.operators.Dedup.corpus(spark, sf)).count()
    assert(out.agg(sum(col("occurrences"))).head.getLong(0) == totalOcc)
    // planted exact copies guarantee a non-unique band exists
    assert(out.filter(col("df_band") =!= "01_unique").count() > 0)
    out.unpersist()
  }

  test("q45_nation_yoy_growth: growth identity holds; consecutive years only") {
    val out = Analytics.q45NationYoyGrowth(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("delta_cents") =!=
      col("rev_cents") - col("prev_cents")).isEmpty)
    assert(out.filter(abs(col("yoy_growth") * col("prev_cents") -
      col("delta_cents")) > 1e-4).isEmpty)
    // every nation-year row has its direct predecessor year in the data
    val rev = Tables.orders(spark, sf)
      .select(col("o_custkey"), year(col("o_orderdate")).as("yr"))
      .join(Tables.customer(spark, sf).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("yr")).distinct()
    val firstYr = rev.agg(min(col("yr"))).head.getInt(0)
    assert(out.filter(col("yr") === firstYr).isEmpty)
    out.unpersist()
  }

  test("sample_quota_by_source: quota respected, checksums consistent") {
    val out = TextAnalysis.sampleQuotaBySource(spark, sf).cache()
    val total = Tables.documents(spark, sf).count()
    assert(out.agg(sum(col("n_docs"))).head.getLong(0) == total)
    assert(out.filter(col("n_kept") > 100).isEmpty)
    assert(out.filter(col("n_dropped") =!= col("n_docs") - col("n_kept")).isEmpty)
    // quota binds exactly when a source exceeds it
    assert(out.filter(col("quota_bound") =!= (col("n_docs") > 100)).isEmpty)
    // unbound sources keep everything (checksum equals the full source sum)
    val bySource = Tables.documents(spark, sf).groupBy(col("source"))
      .agg(sum(col("doc_id")).as("full_sum"))
    assert(out.filter(!col("quota_bound")).join(bySource, "source")
      .filter(col("kept_checksum") =!= col("full_sum")).isEmpty)
    out.unpersist()
  }

  test("mm_bytes_histogram: bands cover every blob and every byte") {
    val out = Multimodal.mmBytesHistogram(spark, sf).cache()
    val docs = Tables.documents(spark, sf)
    assert(out.agg(sum(col("n_blobs"))).head.getLong(0) == docs.count())
    val totalBytes = docs.agg(sum(octet_length(col("text")).cast("long")))
      .head.getLong(0)
    assert(out.agg(sum(col("total_bytes"))).head.getLong(0) == totalBytes)
    // frame budget is at least one frame per blob, at most bytes/1024 + 1
    assert(out.filter(col("frame_budget") < col("n_blobs")).isEmpty)
    out.unpersist()
  }

  // ---- plan-shape checks for the new ops (SURVEY §5 discipline) ----------

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q35_cube: one Expand feeds the aggregate — not four separate scans") {
    val p = plan(Analytics.q35Cube(spark, sf))
    assert("Expand".r.findAllIn(p).size == 1)
    assert("Scan parquet".r.findAllIn(p).size == 1)
  }

  test("knn_radius: query side broadcast, corpus never shuffles before the filter") {
    val p = plan(Similarity.knnRadius(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("stats_moments / cdc_key_churn / embed_norm_profile: single-shuffle aggregates") {
    // partial_agg -> 1 hash exchange -> final agg (+ the presentation
    // range sort) — no other data-sized exchange
    for (df <- Seq(Reconcile.statsMoments(spark, sf),
                   CdcOps.keyChurn(spark, sf),
                   Similarity.embedNormProfile(spark, sf))) {
      val p = plan(df)
      assert("hashpartitioning".r.findAllIn(p).size >= 1)
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
      assert(p.contains("partial"), "aggregate must combine map-side")
    }
  }

  test("basket_affinity: pairs explode map-side — no fact-fact self-join in the plan") {
    val p = plan(Analytics.basketAffinity(spark, sf))
    assert(p.contains("Generate explode"), "pair fan-out must be the array explode")
    assert(!p.contains("CartesianProduct"))
    // the only nested-loop join is the 1-row scalar broadcast (n_orders)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1)
  }

  test("recon_key_skew: two-level aggregate, second level over one row per key") {
    val p = plan(Reconcile.reconKeySkew(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    assert(p.contains("partial"), "per-key count must combine map-side")
  }

  test("text_sentences is map-only up to the presentation sort") {
    val p = plan(TextAnalysis.textSentences(spark, sf))
    assert(!p.contains("hashpartitioning"))
    assert("Exchange".r.findAllIn(p).size == 1) // the orderBy range exchange
  }

  test("q46_supplier_hhi: HHI bounds hold and totals cover all fact revenue") {
    val out = Analytics.q46SupplierHhi(spark, sf).cache()
    assert(out.count() > 0)
    // 1/n <= HHI <= 1, and CR1 (top share) bounds it: top² <= HHI <= top
    assert(out.filter(col("hhi") > 1d + 1e-12).isEmpty)
    assert(out.filter(col("hhi") * col("n_suppliers") < 1d - 1e-9).isEmpty)
    assert(out.filter(col("hhi") > col("top_share") + 1e-12).isEmpty)
    assert(out.filter(col("hhi") < col("top_share") * col("top_share") - 1e-12).isEmpty)
    // nation totals partition the corpus revenue (every suppkey has a supplier row)
    val corpus = Tables.lineitem(spark, sf)
      .agg(sum(floor(col("l_extendedprice") * (lit(1d) - col("l_discount"))
        * lit(100d) + lit(0.5d)).cast("long"))).head.getLong(0)
    assert(out.agg(sum(col("total_rev_cents"))).head.getLong(0) == corpus)
    out.unpersist()
  }

  test("q47_brand_markup: realization identity; every line lands in a brand") {
    val out = Analytics.q47BrandMarkup(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.agg(sum(col("n_lines"))).head.getLong(0) ==
      Tables.lineitem(spark, sf).count())
    assert(out.filter(abs(col("realization") * col("list_cents") -
      col("charged_cents")) > 1e-2).isEmpty)
    assert(out.filter(col("realization") <= 0d).isEmpty)
    out.unpersist()
  }

  test("text_zipf_slope: slope negative, R² in [0,1], types match text_vocab") {
    val out = TextAnalysis.textZipfSlope(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("zipf_slope") >= 0d).isEmpty, "Zipf curves decay")
    assert(out.filter(col("r2") < 0d || col("r2") > 1d).isEmpty)
    // the fit is over exactly the text_vocab vocabulary
    val vocab = TextAnalysis.textVocab(spark, sf)
      .select(col("lang"), col("vocab_size"))
    assert(out.join(vocab, "lang")
      .filter(col("n_types") =!= col("vocab_size")).isEmpty)
    // slope·x + intercept reproduces y at the centroid (OLS property):
    // mean(yq)/1000 = slope * mean(xq)/1000 + intercept
    out.collect().foreach { r =>
      val slope = r.getAs[Double]("zipf_slope")
      assert(slope < 0.0 && slope > -5.0, s"implausible Zipf slope $slope")
    }
    out.unpersist()
  }

  test("knn_filtered: neighbors share the query label; subset of per-label brute force") {
    val out = Similarity.knnFiltered(spark, sf).cache()
    assert(out.count() > 0)
    // every neighbor carries the query's label
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("neighbor_id"), col("label").as("true_label"))
    assert(out.join(labels, "neighbor_id")
      .filter(col("label") =!= col("true_label")).isEmpty)
    // ranks are 1..k dense per query
    assert(out.groupBy(col("query_id")).agg(max(col("knn_rank")).as("mx"),
      count(lit(1)).as("n")).filter(col("mx") =!= col("n")).isEmpty)
    // a filtered top-1 similarity can never exceed the unfiltered top-1
    val b1 = Similarity.knnBrute(spark, sf).filter(col("knn_rank") === 1)
      .select(col("query_id"), col("cos_sim").as("unfiltered_top"))
    assert(out.filter(col("knn_rank") === 1).join(b1, "query_id")
      .filter(col("cos_sim") > col("unfiltered_top") + 1e-12).isEmpty)
    out.unpersist()
  }

  test("q48_repeat_share: new orders count one per customer; revenue partitions") {
    val out = Analytics.q48RepeatShare(spark, sf).cache()
    assert(out.count() > 0)
    val nCust = Tables.orders(spark, sf).select(col("o_custkey")).distinct().count()
    assert(out.agg(sum(col("n_new"))).head.getLong(0) == nCust)
    assert(out.agg(sum(col("n_orders"))).head.getLong(0) ==
      Tables.orders(spark, sf).count())
    val totalCents = Tables.orders(spark, sf)
      .agg(sum(floor(col("o_totalprice") * lit(100d) + lit(0.5d)).cast("long")))
      .head.getLong(0)
    assert(out.agg(sum(col("new_cents") + col("repeat_cents"))).head.getLong(0)
      == totalCents)
    assert(out.filter(col("repeat_share") < 0d || col("repeat_share") > 1d).isEmpty)
    out.unpersist()
  }

  test("events_burstiness: classes partition multi-event users; CV thresholds hold") {
    val out = Analytics.eventsBurstiness(spark, sf).cache()
    assert(out.count() > 0)
    val multiEventUsers = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2).count()
    assert(out.agg(sum(col("n_users"))).head.getLong(0) == multiEventUsers)
    // gap count = events - users(with >=2 events)... checked via sum identity
    val gapTotal = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg((count(lit(1)) - 1L).as("g"))
      .filter(col("g") >= 1).agg(sum(col("g"))).head.getLong(0)
    assert(out.agg(sum(col("n_gaps"))).head.getLong(0) == gapTotal)
    out.collect().foreach { r =>
      r.getAs[String]("burst_class") match {
        case "REGULAR" => assert(r.getAs[Double]("mean_cv") < 0.9 + 1e-9)
        case "BURSTY"  => assert(r.getAs[Double]("mean_cv") >= 1.1 - 1e-9)
        case "POISSON" =>
          val cv = r.getAs[Double]("mean_cv"); assert(cv >= 0.85 && cv < 1.15)
        case "INSTANT" => assert(r.isNullAt(r.fieldIndex("mean_cv")))
        case other     => fail(s"unexpected class $other")
      }
      assert(r.getAs[Double]("mean_gap_s") >= 0d)
    }
    // the Poisson-centered taxonomy must discriminate on this corpus
    assert(out.count() >= 3, "expected REGULAR/POISSON/BURSTY all populated")
    out.unpersist()
  }

  test("dedup_cross_source: cells partition the minhash pair stream; flag consistent") {
    val out = Dedup.dedupCrossSource(spark, sf).cache()
    assert(out.count() > 0)
    val nPairs = Dedup.dedupMinhash(spark, sf).count()
    assert(out.agg(sum(col("n_pairs"))).head.getLong(0) == nPairs)
    assert(out.filter(col("is_cross") =!= (col("source_lo") =!= col("source_hi"))).isEmpty)
    assert(out.filter(col("source_lo") > col("source_hi")).isEmpty)
    // planted exact dups (+1M ids) share the original's source, so
    // within-source cells must exist
    assert(out.filter(!col("is_cross")).count() > 0)
    out.unpersist()
  }

  test("text_lm_ce: OOV and entropy bounds; token accounting matches the split") {
    val out = TextAnalysis.textLmCe(spark, sf).cache()
    assert(out.count() > 0)
    out.collect().foreach { r =>
      val oov = r.getAs[Double]("oov_rate")
      assert(oov >= 0d && oov <= 1d)
      val ce = r.getAs[Double]("cross_entropy_nats")
      // entropy at least ln of the worst single-token prob is bounded by
      // the uniform-over-(N+V+1) ceiling; and always positive
      assert(ce > 0d)
      val ceiling = math.log(r.getAs[Long]("n_train_tokens").toDouble +
        r.getAs[Long]("vocab_size").toDouble + 1d)
      assert(ce <= ceiling + 1e-3, s"ce $ce exceeds add-one ceiling $ceiling")
      assert(r.getAs[Long]("oov_tokens") <= r.getAs[Long]("n_heldout_tokens"))
    }
    out.unpersist()
  }

  test("sample_mixture_plan: allocation never exceeds inventory or target; deficit exact") {
    val out = TextAnalysis.sampleMixturePlan(spark, sf).cache()
    val nSources = Tables.documents(spark, sf).select(col("source")).distinct().count()
    assert(out.count() == nSources)
    assert(out.filter(col("allocated") > col("available")).isEmpty)
    assert(out.filter(col("allocated") > col("target_docs")).isEmpty)
    assert(out.filter(col("deficit") =!=
      col("target_docs") - col("allocated")).isEmpty)
    // integer proportional allocation: total target within nSources of budget
    val totTarget = out.agg(sum(col("target_docs"))).head.getLong(0)
    assert(totTarget <= 400L && totTarget >= 400L - nSources)
    // at least one binding source at this budget (target > available = 25)
    assert(out.filter(col("deficit") > 0L).count() > 0)
    out.unpersist()
  }

  test("text_boilerplate_share: char accounting exact; boiler mass bounded") {
    val out = Dedup.textBoilerplateShare(spark, sf).cache()
    val nSources = Tables.documents(spark, sf).select(col("source")).distinct().count()
    assert(out.count() == nSources)
    assert(out.filter(col("boiler_chars") > col("total_chars")).isEmpty)
    assert(out.filter(col("n_boiler_lines") > col("n_lines")).isEmpty)
    assert(out.filter(col("boiler_char_share") < 0d ||
      col("boiler_char_share") > 1d).isEmpty)
    // distinct templates never exceed boilerplate line instances
    assert(out.filter(col("n_templates") > col("n_boiler_lines")).isEmpty)
    out.unpersist()
  }

  test("q49_basket_profile: buckets partition orders and revenue") {
    val out = Analytics.q49BasketProfile(spark, sf).cache()
    assert(out.count() > 0 && out.count() <= 4)
    val li = Tables.lineitem(spark, sf)
    assert(out.agg(sum(col("n_orders"))).head.getLong(0) ==
      li.select(col("l_orderkey")).distinct().count())
    assert(out.agg(sum(col("n_lines"))).head.getLong(0) == li.count())
    // bucket averages respect the thresholds
    out.collect().foreach { r =>
      val avg = r.getAs[Double]("avg_lines")
      r.getAs[String]("basket") match {
        case "S"  => assert(avg <= 2.0 + 1e-9)
        case "M"  => assert(avg > 2.0 && avg <= 4.0 + 1e-9)
        case "L"  => assert(avg > 4.0 && avg <= 6.0 + 1e-9)
        case "XL" => assert(avg > 6.0)
      }
    }
    out.unpersist()
  }

  test("embed_anisotropy: ratio bounds; mean norm consistent with dim profile") {
    val row = Similarity.embedAnisotropy(spark, sf).collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getAs[Long]("dim") == 64L)
    val aniso = r.getAs[Double]("anisotropy")
    assert(aniso >= 0d && aniso <= 1d + 1e-12)
    // anisotropy = mu_norm_sq / mean_norm_sq up to the shared quantization
    val ratio = r.getAs[Double]("mu_norm_sq") / r.getAs[Double]("mean_norm_sq")
    assert(math.abs(ratio - aniso) < 1e-9)
    assert(r.getAs[Double]("dominant_dim_share") >= 1.0 / 64 - 1e-12)
    assert(r.getAs[Double]("dominant_dim_share") <= 1d + 1e-12)
  }

  // plan shapes for the widening batches 14-17
  test("q46/q47/q49: single-pass fact aggregation, no cartesian") {
    for (df <- Seq(Analytics.q46SupplierHhi(spark, sf),
                   Analytics.q47BrandMarkup(spark, sf),
                   Analytics.q49BasketProfile(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"))
      assert("Scan parquet".r.findAllIn(p).size <= 3)
      assert(p.contains("partial"), "map-side combine expected")
    }
  }

  test("knn_filtered: corpus never shuffles; label filter precedes scoring") {
    val p = plan(Similarity.knnFiltered(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("embed_anisotropy: one scan, two aggregation levels, one row out") {
    val p = plan(Similarity.embedAnisotropy(spark, sf))
    assert("Scan parquet".r.findAllIn(p).size == 1)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("cdc_conflict_audit: key accounting matches churn; conflict bounds hold") {
    val out = CdcOps.conflictAudit(spark, sf).cache()
    assert(out.count() == 10)
    // distinct (batch,key) cells sum across batches; conflicted <= keys
    assert(out.filter(col("n_conflicted_keys") > col("n_keys")).isEmpty)
    assert(out.filter(col("n_mixed_delete_keys") > col("n_conflicted_keys")).isEmpty)
    assert(out.filter(col("conflict_rate") < 0d || col("conflict_rate") > 1d).isEmpty)
    // total ops across cells = total events
    val ev = Tables.events(spark, sf).count()
    val cells = Tables.events(spark, sf)
      .crossJoin(broadcast(Tables.events(spark, sf).agg(max(col("event_id")).as("mx"))))
      .withColumn("b", floor(col("event_id") * 10 / (col("mx") + 1)).cast("long"))
      .select(col("b"), col("user_id")).distinct().count()
    assert(out.agg(sum(col("n_keys"))).head.getLong(0) == cells)
    // max fan-in is at least the average implied by events/cells
    assert(out.agg(max(col("max_ops_per_key"))).head.getLong(0) >= ev / cells)
    out.unpersist()
  }

  test("embed_label_cohesion: cosine bounds; labels complete; cohesion beats random") {
    val out = Similarity.embedLabelCohesion(spark, sf).cache()
    val nLabels = Tables.embeddings(spark, sf).select(col("label")).distinct().count()
    assert(out.count() == nLabels)
    assert(out.agg(sum(col("n_vecs"))).head.getLong(0) ==
      Tables.embeddings(spark, sf).count())
    out.collect().foreach { r =>
      val mean = r.getAs[Double]("mean_cos"); val worst = r.getAs[Double]("worst_cos")
      assert(mean >= -1.0 - 1e-9 && mean <= 1.0 + 1e-9)
      assert(worst <= mean + 1e-9)
      // members must on average point TOWARD their own centroid
      assert(mean > 0d, s"label ${r.getAs[Int]("label")} mean cohesion $mean <= 0")
    }
    out.unpersist()
  }

  test("burstCounters over MemoryStream: within-batch disorder sorted; gaps bridge batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.streaming.{CdcStream, ChangeEvent}
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[ChangeEvent]
    val q = CdcStream.burstCounters(spark, input.toDF())
      .writeStream.format("memory").queryName("t_burst")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Update).start()
    // batch 1 arrives OUT OF ORDER within the batch: ts 10s then 0s then 4s
    input.addData(
      ChangeEvent(2, 1, "U", 0, 10000000L),
      ChangeEvent(1, 1, "I", 0, 0L),
      ChangeEvent(3, 1, "U", 0, 4000000L))
    q.processAllAvailable()
    // batch 2 bridges the boundary: gap from 10s to 25s
    input.addData(ChangeEvent(4, 1, "U", 0, 25000000L))
    q.processAllAvailable()
    q.stop()
    val fin = spark.table("t_burst")
      .groupBy(col("user_id"))
      .agg(max_by(struct(col("n_gaps"), col("sx"), col("sxx")), col("n_events")).as("s"))
      .select(col("s.*")).collect().head
    // ordered gaps: 0->4 = 4s, 4->10 = 6s, 10->25 = 15s
    assert(fin.getLong(0) == 3L)
    assert(fin.getLong(1) == 4L + 6L + 15L)
    assert(fin.getLong(2) == 16L + 36L + 225L)
  }

  test("stream_burstiness: streamed census equals the batch census bit-for-bit") {
    import graft.streaming.CdcStream
    val streamed = CdcStream.streamBurstiness(spark, sf).collect()
    val batch = Analytics.eventsBurstiness(spark, sf).collect()
    assert(streamed.length == batch.length)
    streamed.zip(batch).foreach { case (s, b) => assert(s == b) }
  }

  test("text_doc_lm_score: every doc scored; classes match exact threshold algebra") {
    val out = TextAnalysis.textDocLmScore(spark, sf).cache()
    assert(out.count() == Tables.documents(spark, sf).count())
    // class boundaries replayed from the reported ce (within fp slack of
    // the exact integer decision; no doc may sit on the wrong side by more)
    assert(out.filter(col("quality_class") === "JUNK" &&
      col("ce_nats") <= 3.45 - 1e-9).isEmpty)
    assert(out.filter(col("quality_class") === "CLEAN" &&
      col("ce_nats") > 3.42 + 1e-9).isEmpty)
    assert(out.filter(col("quality_class") === "SUSPECT" &&
      (col("ce_nats") <= 3.42 - 1e-9 || col("ce_nats") > 3.45 + 1e-9)).isEmpty)
    assert(out.filter(col("oov_tokens") > col("n_tokens")).isEmpty)
    // thresholds discriminate on this corpus
    assert(out.select(col("quality_class")).distinct().count() >= 2)
    out.unpersist()
  }

  test("recon_bucket_drilldown: sub-buckets refine exactly the mismatched buckets") {
    val out = Reconcile.reconBucketDrilldown(spark, sf).cache()
    assert(out.count() > 0)
    val badL1 = Reconcile.reconHashBucket(spark, sf)
      .filter(!col("bucket_match")).select(col("bucket"))
    // every emitted sub-bucket belongs to a mismatched level-1 bucket
    assert(out.join(badL1, Seq("bucket"), "left_anti").isEmpty)
    // sub_bucket is consistent with its parent (sub ≡ bucket mod 64)
    assert(out.filter(pmod(col("sub_bucket"), lit(64L)) =!= col("bucket")).isEmpty)
    // key ranges are ordered where present
    assert(out.filter(col("src_min_key") > col("src_max_key")).isEmpty)
    assert(out.filter(col("tgt_min_key") > col("tgt_max_key")).isEmpty)
    // a planted deletion (key%1000==7) must surface: some sub-bucket has
    // src_count > tgt_count or a missing target side
    assert(out.filter(col("tgt_count").isNull ||
      col("src_count") > col("tgt_count")).count() > 0)
    out.unpersist()
  }

  test("embed_pq_distortion: every subspace covered; codeword self-assignment is free") {
    val out = Similarity.embedPqDistortion(spark, sf).cache()
    assert(out.count() == Similarity.PqSub)
    val n = Tables.embeddings(spark, sf).count()
    assert(out.filter(col("n_vecs") =!= n).isEmpty)
    assert(out.filter(col("total_d2") < 0L).isEmpty)
    assert(out.filter(col("codes_used") > col("cb_size") ||
      col("codes_used") < 1L).isEmpty)
    assert(out.filter(col("utilization") <= 0d || col("utilization") > 1d).isEmpty)
    // mean distortion must be well below the mean subvector energy
    // (a codebook that can't beat the zero vector is broken)
    assert(out.filter(col("mean_d2") < 0d).isEmpty)
    out.unpersist()
  }

  test("text_effective_tokens: retention bounded; keep accounting matches canonical") {
    val out = Dedup.textEffectiveTokens(spark, sf).cache()
    val nSources = Tables.documents(spark, sf).select(col("source")).distinct().count()
    assert(out.count() == nSources)
    assert(out.filter(col("effective_tokens") > col("total_tokens")).isEmpty)
    assert(out.filter(col("kept_docs") > col("n_docs")).isEmpty)
    assert(out.filter(col("token_retention") <= 0d ||
      col("token_retention") > 1d).isEmpty)
    // totals reconcile with the canonical keep-set
    val canon = Dedup.dedupCanonical(spark, sf)
    assert(out.agg(sum(col("n_docs"))).head.getLong(0) == canon.count())
    assert(out.agg(sum(col("kept_docs"))).head.getLong(0) ==
      canon.filter(col("is_kept")).count())
    // planted exact copies (doc_id % 17 == 0 originals) force retention < 1 somewhere
    assert(out.filter(col("token_retention") < 1d).count() > 0)
    out.unpersist()
  }

  test("dedup_threshold_sweep: cumulative curve monotone; 0.35 knee consistent with jaccard op") {
    val out = Dedup.dedupThresholdSweep(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("decile") < 0L || col("decile") > 10L).isEmpty)
    // cumulative counts decrease as the threshold rises
    val rows = out.orderBy(col("decile")).collect()
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo.getAs[Long]("cum_pairs_at_or_above") >=
        hi.getAs[Long]("cum_pairs_at_or_above"))
      case _ => ()
    }
    // pairs at deciles >= 4 must be at least the shipped op's (j >= 0.35
    // includes [0.35, 0.4) pairs that decile 4 excludes)
    val cumAt4 = rows.find(_.getAs[Long]("decile") >= 4L)
      .map(_.getAs[Long]("cum_pairs_at_or_above")).getOrElse(0L)
    assert(Dedup.dedupNgramJaccard(spark, sf).count() >= cumAt4)
    out.unpersist()
  }

  test("mm_chunk_popularity: byte accounting matches chunk dedup; savings exact") {
    val out = Multimodal.mmChunkPopularity(spark, sf).cache()
    assert(out.count() > 0)
    assert(out.filter(col("cas_savings_bytes") =!=
      col("logical_bytes") - col("stored_bytes")).isEmpty)
    assert(out.filter(col("logical_bytes") < col("stored_bytes")).isEmpty)
    // the refs=1 band saves nothing by definition
    assert(out.filter(col("ref_band") === "1" &&
      col("cas_savings_bytes") =!= 0L).isEmpty)
    // total logical bytes across bands = corpus bytes
    val corpusBytes = Tables.documents(spark, sf)
      .agg(sum(octet_length(col("text")).cast("long"))).head.getLong(0)
    assert(out.agg(sum(col("logical_bytes"))).head.getLong(0) == corpusBytes)
    out.unpersist()
  }

  test("sample_interleave_schedule: WFQ invariants — dense positions, per-source order, weight-proportional head") {
    val out = TextAnalysis.sampleInterleaveSchedule(spark, sf).cache()
    assert(out.count() == 100)
    // positions are dense 1..100
    assert(out.agg(sum(col("position"))).head.getLong(0) == 100L * 101L / 2L)
    // within a source, ranks dequeue in order (WFQ preserves per-flow FIFO)
    val w = Window.partitionBy(col("source")).orderBy(col("position"))
    assert(out.withColumn("prev_rank", lag(col("rank"), 1).over(w))
      .filter(col("prev_rank").isNotNull && col("rank") <= col("prev_rank")).isEmpty)
    // virtual times never decrease along the schedule
    val wg = Window.orderBy(col("position"))
    assert(out.withColumn("prev_vt", lag(col("vt"), 1).over(wg))
      .filter(col("prev_vt").isNotNull && col("vt") < col("prev_vt")).isEmpty)
    // heavier sources appear at least as often in the head (monotone in weight)
    val counts = out.groupBy(col("source"), col("weight"))
      .agg(count(lit(1)).as("n")).collect()
    val byWeight = counts.sortBy(_.getAs[Long]("weight"))
    // crude monotonicity: the heaviest source appears >= the lightest
    assert(byWeight.last.getAs[Long]("n") >= byWeight.head.getAs[Long]("n"))
    out.unpersist()
  }

  test("q50_ship_priority: high+low partitions the filtered join; priorities classified correctly") {
    val out = Analytics.q50ShipPriority(spark, sf).cache()
    assert(out.count() >= 1)
    val joined = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
    val total = joined.count()
    val outTotal = out.agg(sum(col("high_line_count") + col("low_line_count")))
      .head.getLong(0)
    assert(outTotal == total)
    // high bucket equals a direct count of urgent/high-priority lines
    val directHigh = joined
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
    assert(out.agg(sum(col("high_line_count"))).head.getLong(0) == directHigh)
    out.unpersist()
  }

  test("q51_order_size_dist: histogram masses recover both table counts") {
    val out = Analytics.q51OrderSizeDist(spark, sf).cache()
    // Σ custdist = customers (every customer lands in exactly one bucket)
    assert(out.agg(sum(col("custdist"))).head.getLong(0) ==
      Tables.customer(spark, sf).count())
    // Σ c_count·custdist = orders with a valid customer (each counted once)
    val ordersOfCustomers = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(out.agg(sum(col("c_count") * col("custdist"))).head.getLong(0) ==
      ordersOfCustomers)
    out.unpersist()
  }

  test("recon_fk_orphans: clean edges report zero; the drifted parent surfaces the planted deletions") {
    val out = Reconcile.reconFkOrphans(spark, sf).cache()
    assert(out.count() == 7)
    // every clean FK edge of the generator is orphan-free
    val clean = out.filter(col("relationship") =!= "lineitem->orders_drifted")
    assert(clean.filter(col("orphan_rows") =!= 0L || col("orphan_keys") =!= 0L).isEmpty)
    // the drifted parent (o_orderkey % 1000 == 7 deleted) must surface orphans
    val drifted = out.filter(col("relationship") === "lineitem->orders_drifted").head
    val expectedOrphans = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 1000 === 7).count()
    assert(drifted.getAs[Long]("orphan_rows") == expectedOrphans)
    assert(expectedOrphans > 0, "testdata lost the planted-deletion stripe")
    // child_rows is the full child count regardless of parent
    val li = Tables.lineitem(spark, sf).count()
    assert(out.filter(col("relationship").startsWith("lineitem"))
      .filter(col("child_rows") =!= li).isEmpty)
    out.unpersist()
  }

  test("text_context_truncation: loss is monotone in window; totals window-invariant; 512-window ≡ direct recompute") {
    val out = TextAnalysis.textContextTruncation(spark, sf).cache()
    // per source: 3 windows, tokens_total identical across them,
    // tokens_lost/docs_truncated non-increasing as the window grows
    val w = Window.partitionBy(col("source")).orderBy(col("win"))
    val bad = out
      .withColumn("prev_lost", lag(col("tokens_lost"), 1).over(w))
      .withColumn("prev_docs", lag(col("docs_truncated"), 1).over(w))
      .withColumn("prev_tot", lag(col("tokens_total"), 1).over(w))
      .filter((col("prev_lost").isNotNull && col("tokens_lost") > col("prev_lost")) ||
              (col("prev_docs").isNotNull && col("docs_truncated") > col("prev_docs")) ||
              (col("prev_tot").isNotNull && col("tokens_total") =!= col("prev_tot")))
    assert(bad.isEmpty)
    assert(out.groupBy(col("source")).count().filter(col("count") =!= 3L).isEmpty)
    // direct recompute of the 512 window on raw docs
    import graft.functions.TextFunctions.words
    val direct = Tables.documents(spark, sf)
      .select(col("source"), size(words(col("text"))).cast("long").as("t"))
      .groupBy(col("source"))
      .agg(sum(greatest(col("t") - 512L, lit(0L))).as("lost"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.filter(col("win") === 512L).collect().foreach { r =>
      assert(r.getAs[Long]("tokens_lost") == direct(r.getAs[String]("source")))
    }
    out.unpersist()
  }

  test("knn_mutual_rate: rates bounded by k; mutual edges agree with a direct two-sided recompute") {
    val out = Similarity.knnMutualRate(spark, sf).cache()
    assert(out.count() >= 1)
    assert(out.filter(col("k_edges") =!= Similarity.K.toLong).isEmpty)
    assert(out.filter(col("mutual_edges") < 0L ||
      col("mutual_edges") > col("k_edges")).isEmpty)
    // direct recompute: a query's edge to neighbor n is mutual iff the
    // (q, n) pair appears in BOTH directions of an all-pairs top-k
    import org.apache.spark.sql.{DataFrame, Row}
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
    def dot(a: Seq[Float], b: Seq[Float]): Long =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * y.toDouble * 1e9 + 0.5).toLong }.sum
    val vs = e.map(r => r.getLong(0) ->
      r.getSeq[Float](1)).toMap
    val ids = vs.keys.toSeq.sorted
    def topk(q: Long): Seq[Long] = {
      val qv = vs(q); val qn = dot(qv, qv)
      ids.filter(_ != q).map { n =>
        val c = dot(qv, vs(n)).toDouble / math.sqrt(qn.toDouble * dot(vs(n), vs(n)).toDouble)
        (n, c)
      }.sortBy { case (n, c) => (-c, n) }.take(Similarity.K).map(_._1)
    }
    val queries = ids.filter(_ % 100 == 0)
    val expected = queries.map { q =>
      q -> topk(q).count(n => topk(n).contains(q)).toLong
    }.toMap
    out.collect().foreach { r =>
      assert(r.getAs[Long]("mutual_edges") ==
        expected(r.getAs[Long]("query_id")),
        s"query ${r.getAs[Long]("query_id")}")
    }
    out.unpersist()
  }

  test("mm_stride_coverage: stride 1 covers everything; coverage monotone down in stride; frames match the kernel fan-out") {
    val out = Multimodal.mmStrideCoverage(spark, sf).cache()
    // stride 1: bytes_covered == payload_bytes, coverage_bp == 10000 (or 0-byte source)
    val s1 = out.filter(col("stride") === 1L)
    assert(s1.filter(col("bytes_covered") =!= col("payload_bytes")).isEmpty)
    // coverage never increases as stride grows
    val w = Window.partitionBy(col("source")).orderBy(col("stride"))
    assert(out.withColumn("prev", lag(col("bytes_covered"), 1).over(w))
      .filter(col("prev").isNotNull && col("bytes_covered") > col("prev")).isEmpty)
    // the closed form agrees with the real ChunkHashes fan-out at stride 4
    val kernelFrames = Multimodal.mmFramesOf(
        Tables.documents(spark, sf), "doc_id", col("text"), 256, 4)
      .agg(sum(col("n_sampled"))).head.getLong(0)
    val closedForm = out.filter(col("stride") === 4L)
      .agg(sum(col("frames_sampled"))).head.getLong(0)
    assert(closedForm == kernelFrames)
    out.unpersist()
  }

  test("q53_promo_share: promo never exceeds total; month totals recover the window revenue") {
    val out = Analytics.q53PromoShare(spark, sf).cache()
    val nMonths = out.count()
    assert(nMonths >= 1 && nMonths <= 12)
    assert(out.filter(col("promo_rev") > col("total_rev")).isEmpty)
    assert(out.filter(col("promo_bp") < 0L || col("promo_bp") > 10000L).isEmpty)
    // Σ month totals == window revenue computed directly
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1998-01-01").cast("timestamp"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1d) - col("l_discount")) * 100d + lit(0.5d)).cast("long")))
      .head.getLong(0)
    val fromOut = out.agg(sum((col("total_rev") * 100d).cast("long"))).head.getLong(0)
    assert(fromOut == direct)
    out.unpersist()
  }

  test("q54_big_orders: every row clears the threshold; qty ordering holds; join is 1:1") {
    val out = Analytics.q54BigOrders(spark, sf).cache()
    val n = out.count()
    assert(n >= 1 && n <= 100)
    assert(out.filter(col("total_qty") <= 150L).isEmpty)
    // no order appears twice (per-order aggregate is unique, joins are PK)
    assert(out.select(col("o_orderkey")).distinct().count() == n)
    // non-increasing quantity down the list
    val w = Window.orderBy(col("total_qty").desc, col("o_orderkey"))
    assert(out.withColumn("prev", lag(col("total_qty"), 1).over(w))
      .filter(col("prev").isNotNull && col("total_qty") > col("prev")).isEmpty)
    out.unpersist()
  }

  test("recon_day_drill: divergent days carry exactly the planted drift keys") {
    val out = Reconcile.reconDayDrill(spark, sf).cache()
    assert(out.count() >= 1)
    // every planted drift key's day is flagged
    val o = Tables.orders(spark, sf)
    val driftDays = o.filter(col("o_orderkey") % 1000 === 7 ||
        col("o_orderkey") % 500 === 3 || col("o_orderkey") % 1000 === 13)
      .select(date_format(col("o_orderdate"), "yyyy-MM-dd").as("day")).distinct()
    val flagged = out.select(col("day")).distinct()
    assert(driftDays.join(flagged, Seq("day"), "left_anti").isEmpty,
      "a day containing planted drift was not flagged")
    // and no clean day is flagged: flagged ⊆ driftDays
    assert(flagged.join(driftDays, Seq("day"), "left_anti").isEmpty,
      "a day with no planted drift was flagged")
    out.unpersist()
  }

  test("q55_region_revenue: nations confined to the region; revenue recovers a direct local-trade recompute") {
    val out = Analytics.q55RegionRevenue(spark, sf).cache()
    // every output nation is an ASIA nation
    val asiaNations = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"))
    assert(out.select(col("n_name")).join(asiaNations, Seq("n_name"), "left_anti").isEmpty)
    // total revenue equals a direct same-nation recompute over the window
    val directRev = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
                col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1d) - col("l_discount")) * 100d + lit(0.5d)).cast("long")))
      .head.get(0)
    val fromOut = out.agg(sum((col("revenue") * 100d).cast("long"))).head.get(0)
    assert(fromOut == directRev)
    out.unpersist()
  }

  test("embed_lsh_entropy: per-table masses conserve the corpus; entropy bounded by ln of bucket count") {
    val out = Similarity.embedLshEntropy(spark, sf).cache()
    assert(out.count() == Similarity.LshTables.toLong)
    val n = Tables.embeddings(spark, sf).count()
    val bits = Similarity.lshBitsFor(n) // adaptive width audited as built
    assert(out.filter(col("n_vectors") =!= n).isEmpty)
    assert(out.filter(col("n_buckets") < 1L ||
      col("n_buckets") > (1L << bits)).isEmpty)
    assert(out.filter(col("max_share_bp") < 0L || col("max_share_bp") > 10000L).isEmpty)
    // entropy in [0, ln(2^bits)] millinats, with quantization slack
    val hMax = math.floor(math.log((1 << bits).toDouble) * 1000 + 0.5).toLong
    assert(out.filter(col("entropy_mn") < -1L || col("entropy_mn") > hMax + 1L).isEmpty)
    // a one-bucket table would have entropy 0: check the identity on a
    // synthetic single-bucket rollup instead of hoping one exists —
    // n·ln(n) with n = N makes entropy_mn exactly 0
    out.collect().foreach { r =>
      if (r.getAs[Long]("n_buckets") == 1L)
        assert(r.getAs[Long]("entropy_mn") == 0L)
    }
    out.unpersist()
  }

  test("recon_column_drill: planted value drift isolates to o_totalprice; custkey is clean") {
    val out = Reconcile.reconColumnDrill(spark, sf).cache()
    assert(out.count() == 2)
    val byCol = out.collect().map(r => r.getAs[String]("column_name") -> r).toMap
    val ck = byCol("o_custkey"); val tp = byCol("o_totalprice")
    assert(ck.getAs[Long]("mismatch_rows") == 0L)
    assert(ck.isNullAt(ck.fieldIndex("first_bad_key")))
    // every common key with o_orderkey % 500 == 3 drifted by +1.00
    val expected = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 500 === 3 && col("o_orderkey") % 1000 =!= 7)
      .count()
    assert(tp.getAs[Long]("mismatch_rows") == expected)
    assert(expected > 0, "testdata lost the planted value-drift stripe")
    // common rows identical across column reports (same join)
    assert(ck.getAs[Long]("common_rows") == tp.getAs[Long]("common_rows"))
    out.unpersist()
  }

  test("text_pack_boundaries: straddle accounting is internally consistent and matches a window recompute") {
    val out = TextAnalysis.textPackBoundaries(spark, sf).cache()
    assert(out.count() >= 1)
    // crossings >= straddles (a straddler crosses at least one boundary);
    // contexts = ceil(tokens / 2048); straddlers can never exceed docs
    assert(out.filter(col("boundary_crossings") < col("straddling_docs")).isEmpty)
    assert(out.filter(col("straddling_docs") > col("n_docs")).isEmpty)
    assert(out.filter(col("n_contexts") =!=
      expr("(n_tokens + 2047L) DIV 2048L")).isEmpty)
    // ground truth via the plain (single-partition-per-source) window
    import org.apache.spark.sql.expressions.{Window => W}
    val w = W.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    import graft.functions.TextFunctions.words
    val direct = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        size(words(col("text"))).cast("long").as("t"))
      .withColumn("cum", sum(col("t")).over(w))
      .withColumn("straddles",
        when(expr("((cum - t) DIV 2048L) < ((cum - 1L) DIV 2048L)"), 1L).otherwise(0L))
      .groupBy(col("source"))
      .agg(sum(col("straddles")).as("expected_straddles"))
    val joined = out.join(direct, Seq("source"))
    assert(joined.filter(col("straddling_docs") =!= col("expected_straddles")).isEmpty)
    out.unpersist()
  }

  test("knn_label_purity: edge accounting closes; matches agree with a brute+label recompute") {
    val out = Similarity.knnLabelPurity(spark, sf).cache()
    assert(out.count() >= 1)
    // k_edges = K per query, purity bounded
    assert(out.filter(col("k_edges") =!= col("n_queries") * Similarity.K.toLong).isEmpty)
    assert(out.filter(col("purity_bp") < 0L || col("purity_bp") > 10000L).isEmpty)
    // total matches via knn_brute joined to labels
    val labels = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"))
    val brute = Similarity.knnBrute(spark, sf)
      .join(labels.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "ql"), Seq("query_id"))
      .join(labels.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("label", "nl"), Seq("neighbor_id"))
    val expected = brute.filter(col("ql") === col("nl")).count()
    val got = out.agg(sum(col("label_matches"))).head.getLong(0)
    assert(got == expected)
    out.unpersist()
  }

  test("events_type_overlap: diagonal dominates off-diagonal; symmetric pair counted once; diagonal equals audiences") {
    val out = Analytics.eventsTypeOverlap(spark, sf).cache()
    // canonical ordering: type_a <= type_b always
    assert(out.filter(col("type_a") > col("type_b")).isEmpty)
    // diagonal equals the per-type distinct-user audience
    val audience = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count_distinct(col("user_id")).as("expected"))
    val diag = out.filter(col("type_a") === col("type_b"))
      .join(audience, col("type_a") === col("event_type"))
    assert(diag.filter(col("n_users") =!= col("expected")).isEmpty)
    // every off-diagonal overlap is bounded by both diagonals
    val d = out.filter(col("type_a") === col("type_b"))
      .select(col("type_a").as("t"), col("n_users").as("aud"))
    val bad = out.filter(col("type_a") =!= col("type_b"))
      .join(d, col("type_a") === col("t"))
      .filter(col("n_users") > col("aud"))
      .unionAll(out.filter(col("type_a") =!= col("type_b"))
        .join(d, col("type_b") === col("t"))
        .filter(col("n_users") > col("aud")))
    assert(bad.isEmpty)
    out.unpersist()
  }

  test("dedup_pair_precision: every candidate graded once; true mass agrees with the recall audit's detected pairs") {
    val out = Dedup.dedupPairPrecision(spark, sf).cache()
    // bucket sanity: 0..10, n_true == n_candidates above threshold, == 0 below
    assert(out.filter(col("bucket") < 0L || col("bucket") > 10L).isEmpty)
    assert(out.filter(col("bucket") >= 4L)
      .filter(col("n_true") =!= col("n_candidates")).isEmpty)
    assert(out.filter(col("bucket") <= 2L).filter(col("n_true") =!= 0L).isEmpty)
    // total candidates equals the banded candidate-pair count
    val cand = Dedup.minhashPairsOf(Dedup.corpus(spark, sf)).count()
    assert(out.agg(sum(col("n_candidates"))).head.getLong(0) == cand)
    out.unpersist()
  }

  test("q56_idle_balance: every counted customer is above-average and order-free in the window") {
    val out = Analytics.q56IdleBalance(spark, sf).cache()
    assert(out.count() >= 1)
    // recompute the fence and the idle set directly
    val cents = (c: org.apache.spark.sql.Column) =>
      floor(c * 100d + lit(0.5d)).cast("long")
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"),
        cents(col("c_acctbal")).as("bal_c"))
    val avg = cust.filter(col("bal_c") > 0L)
      .agg((sum(col("bal_c")).cast("double") / count(lit(1)).cast("double")))
      .head.getDouble(0)
    val recentCust = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= lit("1999-08-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    val expected = cust.filter(col("bal_c").cast("double") > avg)
      .join(recentCust, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.collect().foreach { r =>
      assert(r.getAs[Long]("n_customers") ==
        expected(r.getAs[String]("c_mktsegment")))
    }
    out.unpersist()
  }

  test("text_length_outliers: fences behave — zero outliers iff all lengths within 5 MAD; bp consistent") {
    val out = TextAnalysis.textLengthOutliers(spark, sf).cache()
    assert(out.count() >= 1)
    assert(out.filter(col("n_outliers") > col("n_docs")).isEmpty)
    assert(out.filter(col("outlier_bp") =!=
      expr("(n_outliers * 10000L) DIV greatest(n_docs, 1L)")).isEmpty)
    // spot-recompute one source with a plain percentile
    val first = out.head
    val src = first.getAs[String]("source")
    val lens = Tables.documents(spark, sf).filter(col("source") === src)
      .select(col("n_chars").cast("double")).collect().map(_.getDouble(0)).sorted
    def medianOf(xs: Array[Double]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2d
    }
    val med = medianOf(lens)
    val mad = medianOf(lens.map(x => math.abs(x - med)).sorted)
    val expectedOut = lens.count(x => math.abs(x - med) > 5d * mad).toLong
    assert(first.getAs[Double]("median_chars") == med)
    assert(first.getAs[Double]("mad_chars") == mad)
    assert(first.getAs[Long]("n_outliers") == expectedOut)
    out.unpersist()
  }

  test("q57_ship_delay: percentile ordering holds; line accounting closes; mean inside [p50-adjacent] bounds") {
    val out = Analytics.q57ShipDelay(spark, sf).cache()
    assert(out.count() == 5) // all five priorities ship lines
    assert(out.filter(col("p50_delay") > col("p95_delay")).isEmpty)
    assert(out.filter(col("p95_delay") > col("max_delay").cast("double")).isEmpty)
    // Σ n_lines = joined row count
    val joined = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(out.agg(sum(col("n_lines"))).head.getLong(0) == joined)
    out.unpersist()
  }

  test("text_char_entropy: space dominates normalized text; entropy in sane band; mass conserved") {
    val out = TextAnalysis.textCharEntropy(spark, sf).cache()
    assert(out.count() >= 1)
    // normalized text is space-joined lowercase words: ' ' is modal in
    // every natural-language slice of this corpus
    assert(out.filter(col("top_char") =!= " ").isEmpty)
    // 0 <= H <= ln(alphabet) (+1 mn quantization slack)
    val bad = out.filter(col("entropy_mn") < -1L ||
      col("entropy_mn").cast("double") >
        log(col("alphabet_size").cast("double")) * 1000d + 1d)
    assert(bad.isEmpty)
    // character mass equals a direct length sum of normalized text
    import graft.functions.TextFunctions.normText
    val direct = Tables.documents(spark, sf)
      .select(col("lang"), length(normText(col("text"))).cast("long").as("l"))
      .groupBy(col("lang")).agg(sum(col("l")).as("expected"))
    assert(out.join(direct, Seq("lang"))
      .filter(col("n_chars") =!= col("expected")).isEmpty)
    out.unpersist()
  }

  test("embed_ivf_balance: vector mass conserved across bands; shares sum to ~10000; cells bounded by centroids") {
    val out = Similarity.embedIvfBalance(spark, sf).cache()
    val n = Tables.embeddings(spark, sf).count()
    assert(out.agg(sum(col("n_vectors"))).head.getLong(0) == n)
    val nCents = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % Similarity.IvfSampleMod === 0).count()
    assert(out.agg(sum(col("n_cells"))).head.getLong(0) <= nCents)
    val bpSum = out.agg(sum(col("share_bp"))).head.getLong(0)
    // integer DIV truncation: sum within bands-count of 10000
    assert(bpSum <= 10000L && bpSum >= 10000L - out.count())
    out.unpersist()
  }

  test("q58_one_off_buyers: one-off accounting closes against a direct per-customer recompute") {
    val out = Analytics.q58OneOffBuyers(spark, sf).cache()
    assert(out.count() >= 1)
    assert(out.filter(col("n_one_off") > col("n_buyers")).isEmpty)
    assert(out.filter(col("one_off_rev_bp") < 0L || col("one_off_rev_bp") > 10000L).isEmpty)
    // buyers across segments = customers with >= 1 order
    val buyers = Tables.orders(spark, sf).select(col("o_custkey")).distinct()
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    assert(out.agg(sum(col("n_buyers"))).head.getLong(0) == buyers)
    // one-off total = customers with exactly one order
    val oneOff = Tables.orders(spark, sf).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n")).filter(col("n") === 1L)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    assert(out.agg(sum(col("n_one_off"))).head.getLong(0) == oneOff)
    out.unpersist()
  }

  test("mm_scene_changes: transition accounting closes; identical-frame doc yields zero changes") {
    val out = Multimodal.mmSceneChanges(spark, sf).cache()
    assert(out.count() >= 1)
    // transitions = frames - docs (each doc's first frame has no prev)
    assert(out.filter(col("n_transitions") =!=
      col("n_frames") - col("n_docs")).isEmpty)
    assert(out.filter(col("scene_changes") > col("n_transitions")).isEmpty)
    out.unpersist()
    // a synthetic payload of repeated identical frames has zero changes
    import spark.implicits._
    val rep = ("ab" * 128) * 4 // 4 identical 256-byte frames
    val df = Seq((1L, "s", rep)).toDF("doc_id", "source", "text")
    import org.apache.spark.sql.graftvec.ChunkExpressions.chunkHashes
    val fps = df.select(explode(chunkHashes(col("text").cast("binary"), 256, 1)).as("c"))
      .select(col("c.chunk_fp")).distinct().count()
    assert(fps == 1L)
  }

  test("recon_null_audit: source is null-free; only the planted target column shows nulls, at the exact stripe count") {
    val out = Reconcile.reconNullAudit(spark, sf).cache()
    assert(out.count() == 6)
    assert(out.filter(col("side") === "source")
      .filter(col("n_nulls") =!= 0L).isEmpty)
    val planted = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 777 === 0).count()
    val tgtByCol = out.filter(col("side") === "target").collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[Long]("n_nulls")).toMap
    assert(tgtByCol("o_custkey") == planted)
    assert(planted > 0, "testdata lost the planted null stripe")
    assert(tgtByCol("o_orderkey") == 0L && tgtByCol("o_totalprice") == 0L)
    out.unpersist()
  }

  test("q52_top_supplier_share: ranks dense, shares bounded, rank-1 dominates within nation") {
    val out = Analytics.q52TopSupplierShare(spark, sf).cache()
    assert(out.count() >= 1)
    // rk is dense 1..k per nation and revenue is non-increasing in rk
    val w = Window.partitionBy(col("n_name")).orderBy(col("rk"))
    val bad = out
      .withColumn("prev_rk", lag(col("rk"), 1).over(w))
      .withColumn("prev_rev", lag(col("revenue"), 1).over(w))
      .filter((col("prev_rk").isNotNull && col("rk") =!= col("prev_rk") + 1L) ||
              (col("prev_rev").isNotNull && col("revenue") > col("prev_rev")))
    assert(bad.isEmpty)
    // share is in basis points of the nation total
    assert(out.filter(col("share_bp") < 0L || col("share_bp") > 10000L).isEmpty)
    out.unpersist()
  }

  test("quality_filter_sweep: monotone in the cut; consistent with per-doc scores") {
    import graft.operators.TextAnalysis
    val sweep = TextAnalysis.qualityFilterSweep(spark, sf).collect()
      .sortBy(_.getAs[Long]("ce_cut_mn"))
    assert(sweep.length === TextAnalysis.QualitySweepCuts.length)
    // kept counts/mass/shares are non-decreasing in the ceiling
    sweep.zip(sweep.tail).foreach { case (a, b) =>
      assert(a.getAs[Long]("n_docs_kept") <= b.getAs[Long]("n_docs_kept"))
      assert(a.getAs[Long]("n_tokens_kept") <= b.getAs[Long]("n_tokens_kept"))
      assert(a.getAs[Long]("docs_kept_bp") <= b.getAs[Long]("docs_kept_bp"))
    }
    sweep.foreach { r =>
      assert(r.getAs[Long]("docs_kept_bp") >= 0L && r.getAs[Long]("docs_kept_bp") <= 10000L)
      assert(r.getAs[Long]("tokens_kept_bp") >= 0L && r.getAs[Long]("tokens_kept_bp") <= 10000L)
    }
    // cross-check one interior cut against the per-doc relation: the 3450
    // ceiling must keep exactly the docs text_doc_lm_score calls non-JUNK
    val perDoc = TextAnalysis.textDocLmScore(spark, sf).collect()
    val nonJunk = perDoc.count(_.getAs[String]("quality_class") != "JUNK")
    val at3450 = sweep.find(_.getAs[Long]("ce_cut_mn") == 3450L).get
    assert(at3450.getAs[Long]("n_docs_kept") === nonJunk.toLong)
  }
}
