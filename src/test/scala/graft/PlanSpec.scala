package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dedup, Multimodal, Similarity, TextAnalysis}
import graft.core.Skew

/** Plan-shape regression tests: the scale properties claimed in
  * SURVEY.md §5 must be visible in the executed plan. */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2: both filters pushed to the parquet scan; only 5 columns read") {
    val p = plan(Analytics.q2FilterProject(spark, sf))
    // the rendered PushedFilters list is elided; assert the leading
    // entries and that both filter columns reached the scan
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), GreaterThanOrEqual(l_shipdate"))
    assert(!p.contains("l_partkey") && !p.contains("l_returnflag"))
  }

  test("q3: both dimension joins broadcast, no sort-merge join") {
    val p = plan(Analytics.q3JoinAgg(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size === 2)
    assert(!p.contains("SortMergeJoin"))
  }

  test("q4/q5: semi and anti joins build on the filtered side") {
    assert(plan(Analytics.q4SemiJoin(spark, sf)).contains("LeftSemi"))
    assert(plan(Analytics.q5AntiJoin(spark, sf)).contains("LeftAnti"))
  }

  test("dedup_embedding: banded LSH candidates, never a label self-join") {
    val p = plan(Similarity.dedupEmbedding(spark, sf))
    // signatures from the native kernel; pairs from grouped capped-bucket
    // expansion (sorted_pairs), not an N²/labels self-join; exact re-check
    // through the native qdot
    assert(p.contains("lsh_sigs"))
    assert(p.contains("sorted_pairs"))
    assert(p.contains("qdot("))
    assert(!p.contains("CartesianProduct"))
  }

  test("qdot participates in whole-stage codegen") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(org.apache.spark.sql.graftvec.VectorExpressions.qdot(col("a"), col("b")).as("d"))
    val codegen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(codegen.contains("Found 1 WholeStageCodegen") || codegen.contains("WholeStageCodegen"))
    assert(df.collect()(0).getLong(0) === 11000000000L) // 3e9 + 8e9
  }

  test("GraftExtensions: qdot callable from SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql("SELECT qdot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d").collect()
    assert(r(0).getLong(0) === 11000000000L)
  }

  test("GraftExtensions: every graft expression is SQL-callable") {
    GraftExtensions.register(spark)
    val ph = spark.sql("SELECT poly_hash('abc_def') AS h").collect()(0).getLong(0)
    assert(ph === 732313039L) // fold (acc*131 + byte) mod 1e9+7
    val sh = spark.sql("SELECT shingles3(array('a','b','c','d')) AS s").collect()(0)
      .getSeq[String](0)
    assert(sh === Seq("a_b_c", "b_c_d"))
    val shh = spark.sql("SELECT shingles3_hashed(array('a','b','c','d')) AS s").collect()(0)
      .getSeq[Long](0)
    assert(shh === Seq(ph2("a_b_c"), ph2("b_c_d")))
    val sig = spark.sql("SELECT lsh_sigs(array(1.0D, -2.0D), 2, 3, 2) AS s").collect()(0)
      .getSeq[Int](0)
    assert(sig.length === 2 && sig.forall(s => s >= 0 && s < 8))
    val kmv = spark.sql(
      "SELECT kmv_distinct(h, 16) AS nd FROM (SELECT CAST(id % 7 AS BIGINT) AS h FROM range(1000))")
      .collect()(0).getLong(0)
    assert(kmv === 7L) // under k: exact distinct count
    val bg = spark.sql("SELECT word_bigrams(array('a','b','c')) AS s").collect()(0)
      .getSeq[String](0)
    assert(bg === Seq("a b", "b c"))
    val cp = spark.sql("SELECT char_pairs(array('abc','de')) AS s").collect()(0)
      .getSeq[String](0)
    assert(cp === Seq("ab", "bc", "de"))
    // code-point semantics: the surrogate pair stays whole, matching
    // DuckDB string_split(w, '') — never a lone-surrogate string
    val astral = spark.sql("SELECT char_pairs(array('a😀b')) AS s").collect()(0)
      .getSeq[String](0)
    assert(astral === Seq("a😀", "😀b"))
    val wl = spark.sql("SELECT word_lines(array('a','b','c','d','e'), 2) AS s")
      .collect()(0).getSeq[String](0)
    assert(wl === Seq("a b", "c d", "e"))
    assert(spark.sql("SELECT word_lines(CAST(array() AS ARRAY<STRING>), 3) AS s")
      .collect()(0).getSeq[String](0) === Seq.empty)
  }

  test("word_lines kernel ≡ the declarative slice/transform form") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val w = graft.functions.TextFunctions.words(col("text"))
    val kernel = docs.select(col("doc_id"),
      posexplode(org.apache.spark.sql.graftvec.NgramExpressions.wordLines(w, 10))
        .as(Seq("l", "line")))
    val hof = docs
      .select(col("doc_id"), w.as("w"))
      .withColumn("nl", ceil(size(col("w")).cast("double") / 10).cast("int"))
      .filter(col("nl") >= 1)
      .select(col("doc_id"), posexplode(transform(sequence(lit(0), col("nl") - 1),
        i => array_join(slice(col("w"), i * 10 + 1, lit(10)), " "))).as(Seq("l", "line")))
    assert(kernel.exceptAll(hof).count() === 0)
    assert(hof.exceptAll(kernel).count() === 0)
  }

  private def ph2(s: String): Long =
    s.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 131 + (b & 0xFF)) % 1000000007L)

  test("dedup_decontaminate: eval probe broadcasts, no sort-merge join") {
    val p = plan(Dedup.dedupDecontaminate(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("dedup sketches run as single native kernel nodes") {
    assert(plan(Dedup.dedupMinhash(spark, sf)).contains("minhash_bands("))
    assert(plan(Dedup.dedupSimhash(spark, sf)).contains("simhash64("))
  }

  test("text_repetition is map-only up to the presentation sort") {
    val p = plan(TextAnalysis.textRepetition(spark, sf))
    assert(p.contains("top_bigram_count("))
    // the only exchange is the final sort's range partitioning
    assert("Exchange".r.findAllIn(p).size <= 1, p)
  }

  test("round-5 operators: broadcast-shaped joins, no single-partition windows") {
    // embed_outliers: centroids and label stats come back as broadcasts
    val po = plan(Similarity.embedOutliers(spark, sf))
    assert(po.contains("BroadcastHashJoin") && !po.contains("SortMergeJoin"))
    // events_attribution: the touch window partitions by user — never global
    val pa = plan(Analytics.eventsAttribution(spark, sf))
    assert(!pa.contains("SinglePartition"))
    // dedup_incremental: fingerprint equi-joins only, no pair explosion
    val pd = plan(Dedup.dedupIncremental(spark, sf))
    assert(!pd.contains("CartesianProduct") && !pd.contains("BroadcastNestedLoopJoin"))
  }

  test("prefix-rewritten operators: no single-partition exchange anywhere in the plan") {
    // recon_lsn_gap / q27_interval_sweep / shard_pack ran their running
    // computation through Window.orderBy() (Exchange SinglePartition =
    // the whole log through ONE task) until round 5; the Prefix two-pass
    // rewrite must keep every stage partitioned
    for (df <- Seq(graft.cdc.Reconcile.reconLsnGap(spark, sf),
                   Analytics.q27IntervalSweep(spark, sf),
                   TextAnalysis.shardPack(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("SinglePartition"), p)
    }
  }

  test("text_dup_spans: per-doc windows only — no single-partition exchange, no pair join") {
    val p = plan(Dedup.textDupSpans(spark, sf))
    assert(!p.contains("SinglePartition"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("new sketch functions are SQL-callable") {
    GraftExtensions.register(spark)
    val tb = spark.sql("SELECT top_bigram_count(array('a','b','a','b','a')) AS t")
      .collect()(0).getLong(0)
    assert(tb === 2L) // 'a b' occurs twice
    val nb = spark.sql(
      "SELECT size(minhash_bands(array(CAST(1 AS BIGINT), CAST(9 AS BIGINT)), 64, 32, 0)) AS n")
      .collect()(0).getInt(0)
    assert(nb === 32)
    val sh1 = spark.sql("SELECT simhash64(array('a','b'), 100) AS s").collect()(0).getLong(0)
    val sh2 = spark.sql("SELECT simhash64(array('a','b'), 100) AS s").collect()(0).getLong(0)
    assert(sh1 === sh2)
    val pr = spark.sql(
      "SELECT element_at(sorted_pairs(array(CAST(3 AS BIGINT), CAST(1 AS BIGINT))), 1) AS p")
      .collect()(0).getStruct(0)
    assert(pr.getLong(0) === 1L && pr.getLong(1) === 3L)
    val cc = spark.sql(
      "SELECT size(collect_capped(CAST(id AS BIGINT), 5)) AS n FROM range(100)")
      .collect()(0).getInt(0)
    assert(cc === 5)
  }

  test("q19: range join broadcasts the ledger side (no shuffle of the fact side)") {
    val p = plan(Analytics.q19RangeJoin(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("cdc_snapshot_merge: both apply stages partially aggregate (no row_number window)") {
    val p = plan(graft.cdc.CdcOps.snapshotMerge(spark, sf))
    // last-writer-wins is max_by aggregation — partial+final per stage —
    // never a sort-window (which cannot combine map-side)
    assert(p.contains("SortAggregate") || p.contains("HashAggregate"))
    assert(!p.contains("RunningWindowFunction") && !p.contains("row_number"))
  }

  test("mm_doc_embed: id join broadcasts one side at test scale") {
    val p = plan(graft.operators.Similarity.mmDocEmbed(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"))
  }

  test("writeBucketed: co-bucketed tables join with no exchange on either side") {
    import graft.sources.Sinks
    val o = graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
    Sinks.writeBucketed(o, "t_bk_src", "o_orderkey", 8)
    Sinks.writeBucketed(o.withColumn("o_totalprice", col("o_totalprice") * 2), "t_bk_tgt", "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      val j = spark.table("t_bk_src")
        .join(spark.table("t_bk_tgt"), "o_orderkey")
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"unexpected exchange in:\n$p")
      assert(j.count() === o.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS t_bk_src")
      spark.sql("DROP TABLE IF EXISTS t_bk_tgt")
    }
  }

  test("recon_bucketed_diff: the compare join is exchange-free on both sides") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val d = graft.cdc.Reconcile.reconBucketedDiff(spark, sf)
      // inspect the compare join subtree, below the presentation sort:
      // the full-outer join over co-bucketed scans must not shuffle
      val p = d.queryExecution.executedPlan.toString
      val joinIdx = p.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, s"expected a sort-merge compare in:\n$p")
      assert(!p.substring(joinIdx).contains("Exchange"),
        s"unexpected exchange under the compare join in:\n$p")
      // and it still finds the planted drift
      assert(d.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_bk_recon_src")
      spark.sql("DROP TABLE IF EXISTS graft_bk_recon_tgt")
    }
  }

  test("saltedJoin: equals the plain join, salt column not leaked") {
    import spark.implicits._
    // hot key 1 dominates
    val big = ((1 to 1000).map(i => (1L, i.toLong)) ++ Seq((2L, 0L))).toDF("k", "payload")
    val small = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched")).toDF("k", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), 8)
    val plain = big.join(small, Seq("k"))
    assert(salted.columns.toSeq === plain.columns.toSeq)
    assert(salted.count() === plain.count())
    assert(salted.except(plain).count() === 0 && plain.except(salted).count() === 0)
  }
  test("q22: all three dimension joins broadcast, fact side never shuffles pre-agg") {
    val p = plan(Analytics.q22StarJoin(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size === 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("shingles3 is a native expression inside whole-stage codegen") {
    // parquet-backed input — a local relation would be constant-folded
    // by ConvertToLocalRelation and never reach codegen
    val df = graft.core.Tables.documents(spark, sf).limit(5)
      .withColumn("ws", graft.functions.TextFunctions.words(col("text")))
      .select(graft.functions.TextFunctions.shingles3FromWords(col("ws")).as("sh"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("shingles3("))
    val codegen = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    assert(codegen.contains("Found 0") === false && codegen.contains("WholeStageCodegen"))
    // semantic check on a literal input (evaluated via eval path)
    import spark.implicits._
    val lit = Seq("a b c d").toDF("t")
      .select(graft.functions.TextFunctions.shingles3(col("t")).as("sh"))
    assert(lit.collect()(0).getSeq[String](0) === Seq("a_b_c", "b_c_d"))
  }

  test("text_pii is map-only up to the presentation sort") {
    val p = plan(TextAnalysis.textPii(spark, sf))
    // detection + redaction fuse into projections over the scan; the
    // only exchange is the final sort's range partitioning
    assert("Exchange".r.findAllIn(p).size <= 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("HashAggregate"))
  }

  test("recon_sample: the sample predicate filters at the scan, before any exchange") {
    val p = plan(graft.cdc.Reconcile.reconSample(spark, sf))
    // each side's key-hash sample filter must sit directly on its scan
    // (scan-speed sampling, not post-shuffle) — the modulo chain cannot
    // push INTO parquet, but it must run before the join exchanges
    assert(p.contains("% 5) = 0"), p)
    val filterBeforeExchange = p.linesIterator.indexWhere(_.contains("% 5) = 0"))
    val firstExchange = p.linesIterator.indexWhere(_.contains("Exchange"))
    assert(firstExchange < 0 || filterBeforeExchange >= 0)
  }

  test("embed_kmeans_iter: centroids broadcast; assignment argmin keeps partial aggregation") {
    val p = plan(Similarity.embedKmeansIter(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // min(struct) argmin: partial SortAggregate before the vec_id
    // exchange (map-side combine), never a row_number window
    assert(!p.contains("Window"), p)
    assert("SortAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("events_retention: activity collapses to distinct (user, day) before the cohort window") {
    val p = plan(Analytics.eventsRetention(spark, sf))
    // the distinct aggregate must appear under the window sort, and the
    // cohort-size join must broadcast (it is at most one row per day)
    assert(p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }


  test("mm_chunk_dedup: payload bytes never shuffle — only chunk hashes exchange") {
    val p = plan(graft.operators.Multimodal.mmChunkDedup(spark, sf))
    // the first exchange happens after the md5 projection: no Exchange
    // may carry the text or chunk columns
    val exchanges = p.split("Exchange").drop(1)
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(e => e.takeWhile(_ != '\n').contains("text")))
  }

  test("q31_unpivot: one scan feeds the melt — not four") {
    val p = plan(Analytics.q31Unpivot(spark, sf))
    assert("FileScan parquet".r.findAllIn(p).size === 1)
    assert(p.contains("Generate stack"))
  }

  test("embed_quantize_int8: per-dim bounds broadcast back to the element stream") {
    val p = plan(Similarity.embedQuantizeInt8(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("shard_pack: prefix offsets broadcast back — one hash shuffle on the doc stream") {
    val p = plan(TextAnalysis.shardPack(spark, sf))
    // the document stream crosses one full-data exchange (the per-slice
    // window's hash shuffle); the only range partitioning left is the
    // final presentation sort, and the offset table comes back as a
    // broadcast, never a shuffle join
    assert("Exchange rangepartitioning".r.findAllIn(p).size === 1)
    assert(p.contains("BroadcastExchange"))
    assert(!p.contains("SortMergeJoin") && !p.contains("SinglePartition"))
  }

  test("q55_region_revenue: dims broadcast; the only shuffle joins are on fact keys") {
    val p = plan(Analytics.q55RegionRevenue(spark, sf))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SinglePartition") || p.contains("rangepartitioning"))
  }

  test("q50/q53: ship-window filter pushes to the lineitem scan") {
    assert(plan(Analytics.q50ShipPriority(spark, sf))
      .contains("GreaterThanOrEqual(l_shipdate"))
    val p53 = plan(Analytics.q53PromoShare(spark, sf))
    assert(p53.contains("GreaterThanOrEqual(l_shipdate"))
    // part is the broadcast dim — no shuffle join against the fact
    assert(p53.contains("BroadcastHashJoin"))
  }

  test("knn_label_purity: the query side broadcasts, the corpus streams") {
    val p = plan(Similarity.knnLabelPurity(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("mm_stride_coverage: closed-form audit — no kernel, no payload shuffle, partial agg") {
    val p = plan(Multimodal.mmStrideCoverage(spark, sf))
    assert(!p.contains("chunk_hashes("), "the point is NOT paying the fan-out")
    assert(p.contains("partial_count") || p.contains("HashAggregate"))
  }

  test("text_pack_boundaries: prefix discipline — no single-partition window") {
    val p = plan(TextAnalysis.textPackBoundaries(spark, sf))
    assert(!p.contains("SinglePartition"))
  }

  test("recon_column_drill: one keyed join, no broadcast of the fact side") {
    val p = plan(graft.cdc.Reconcile.reconColumnDrill(spark, sf))
    assert(!p.contains("CartesianProduct"))
    // the orders⋈target join is keyed — either shuffle-hash or sort-merge
    assert(p.contains("Join"))
  }

  test("events_power_users: rank<=20 becomes a distributed top-k, not a global sort") {
    // Catalyst's window-group-limit rewrite: the per-user aggregate feeds a
    // TakeOrderedAndProject (per-partition top-20, then a 20-row merge) before
    // the single-partition row_number window — the billion-user-safe shape.
    val p = plan(Analytics.eventsPowerUsers(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("text_chunks: row-local fold — no hash exchange, no aggregate (sort is presentation-only)") {
    // the explode+groupBy formulation shuffled every (token, chunk)
    // assignment and measured 6x slower at sf10; the fold must stay
    // shuffle-free up to the presentation sort
    val p = plan(TextAnalysis.textChunks(spark, sf))
    assert(!p.contains("Exchange hashpartitioning"))
    assert(!p.contains("HashAggregate"))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("stream_chunk_index's chunkRows: STATELESS — no exchange, no aggregate at all") {
    // the per-row fold formulation must keep the whole chunk derivation
    // inside one map pass: any Exchange or Aggregate here would become
    // keyed streaming state at ingest
    val docs = graft.core.Tables.documents(spark, sf)
    val p = plan(graft.streaming.CdcStream.chunkRows(docs))
    assert(!p.contains("Exchange"))
    assert(!p.contains("Aggregate"))
  }
}
