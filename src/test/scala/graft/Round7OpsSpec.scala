package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Similarity, TextAnalysis}
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

  test("text_sentences is map-only up to the presentation sort") {
    val p = plan(TextAnalysis.textSentences(spark, sf))
    assert(!p.contains("hashpartitioning"))
    assert("Exchange".r.findAllIn(p).size == 1) // the orderBy range exchange
  }
}
