package graft

import org.apache.spark.sql.functions._
import graft.operators.{Analytics, Dedup, TextAnalysis}

/** Semantic checks for the round-5 operators (the DuckDB oracle covers
  * exact replay; these assert the operator-level invariants). */
class Round5OpsSpec extends SparkSpec {

  test("dedup_incremental: every delta doc classified, planted statuses recovered") {
    val res = Dedup.dedupIncremental(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = docs.count(_ % 17 == 0) + docs.count(_ % 10 == 0) + docs.count(_ % 20 == 0)
    assert(res.length === expected)
    val byId = res.map(r => r.getLong(0) ->
      ((r.getAs[String]("status"), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    // exact copies always hit the index, claimed by their original
    byId.filter(_._1 < 2000000L).foreach { case (id, (status, dupOf)) =>
      assert(status === "DUP_OF_INDEX" && dupOf === Some(id - 1000000L))
    }
    // second copies of modifications: claimed inside the delta by the
    // +2M doc — unless the modification degenerated to the original
    // text (docs shorter than 7 words), which the index then claims
    byId.filter(_._1 >= 3000000L).foreach { case (id, (status, dupOf)) =>
      if (status == "DUP_IN_DELTA") assert(dupOf === Some(id - 1000000L))
      else assert(status === "DUP_OF_INDEX" && dupOf === Some(id - 3000000L))
    }
    assert(res.exists(_.getAs[String]("status") == "NEW"))
    assert(res.exists(_.getAs[String]("status") == "DUP_IN_DELTA"))
  }

  test("events_attribution: conversions and revenue fully accounted, DIRECT is paired") {
    val res = Analytics.eventsAttribution(spark, sf).collect()
    val purchases = graft.core.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
    val nPurch = purchases.count()
    assert(res.map(_.getAs[Long]("n_conversions")).sum === nPurch)
    val totalCents = purchases
      .agg(sum(floor(col("value") * 100d + 0.5d).cast("long"))).collect()(0).getLong(0)
    val attributedCents = res.map(r =>
      math.round(r.getAs[Double]("attributed_value") * 100)).sum
    assert(attributedCents === totalCents)
    // no prior touch means BOTH codes are null: DIRECT only pairs with DIRECT
    res.foreach { r =>
      val (f, l) = (r.getAs[String]("first_touch"), r.getAs[String]("last_touch"))
      assert((f == "DIRECT") === (l == "DIRECT"))
      assert(f != "purchase" && l != "purchase")
    }
  }

  test("text_line_dedup: exact copies fully line-duplicated, line counts exact") {
    val res = Dedup.textLineDedup(spark, sf).collect()
    val byId = res.map(r => r.getLong(0) -> r).toMap
    // every +1M doc is an exact copy: all of its lines occur in the
    // original too, so the whole doc is duplicated lines
    val copies = res.filter(r => r.getLong(0) >= 1000000L && r.getLong(0) < 2000000L)
    assert(copies.nonEmpty)
    copies.foreach { r =>
      assert(r.getAs[Long]("n_dup_lines") === r.getAs[Long]("n_lines"))
      assert(r.getAs[Double]("dup_line_frac") === 1.0)
      // and its original reports the mirror overlap
      assert(byId(r.getLong(0) - 1000000L).getAs[Double]("dup_line_frac") === 1.0)
    }
    // line count = ceil(words / LineWords), spot-checked against the raw text
    val doc0 = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") === 1L).select("text").collect()(0).getString(0)
    val words0 = doc0.trim.toLowerCase.split("\\s+").length
    assert(byId(1L).getAs[Long]("n_lines") ===
      math.ceil(words0 / Dedup.LineWords.toDouble).toLong)
  }

  test("knn_recall_audit: counts consistent, recall within bounds") {
    val res = graft.operators.Similarity.knnRecallAudit(spark, sf).collect()
    assert(res.map(_.getAs[String]("method")).toSeq === Seq("knn_ivfpq", "knn_lsh"))
    val nBrute = graft.operators.Similarity.knnBrute(spark, sf).count()
    res.foreach { r =>
      assert(r.getAs[Long]("n_pairs") === nBrute)
      val hits = r.getAs[Long]("n_hits")
      assert(hits >= 0L && hits <= nBrute)
      assert(r.getAs[Double]("recall_at_k") === hits.toDouble / nBrute)
    }
  }

  test("text_line_dedup: a doc with zero duplicated lines keeps its full text fingerprint") {
    import spark.implicits._
    val res = Dedup.textLineDedup(spark, sf).collect()
    val noDups = res.filter(_.getAs[Long]("n_dup_lines") == 0L)
    assert(noDups.nonEmpty)
    // removing zero lines must reproduce the normalized text exactly:
    // clean_fp == md5(normText) for every fully-unique doc
    val ids = noDups.map(_.getLong(0)).toSet
    val expect = Dedup.corpus(spark, sf)
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select(col("doc_id"),
        md5(graft.functions.TextFunctions.normText(col("text")).cast("binary")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    noDups.foreach(r => assert(r.getAs[String]("clean_fp") === expect(r.getLong(0))))
  }

  test("incrementalOf: statuses partition the delta, dup_of always names an earlier doc") {
    import spark.implicits._
    val index = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val delta = Seq((10L, "alpha beta"), (11L, "delta"), (12L, "delta"), (13L, "epsilon"))
      .toDF("doc_id", "text")
    val res = Dedup.incrementalOf(index, delta, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[String]("status"), Option(r.get(2)).map(_.asInstanceOf[Long])))).toMap
    assert(res === Map(
      10L -> (("DUP_OF_INDEX", Some(1L))),
      11L -> (("NEW", None)),
      12L -> (("DUP_IN_DELTA", Some(11L))),
      13L -> (("NEW", None))))
  }

  test("sample_dedup_aware: unique docs always survive, dup clusters downsample") {
    val res = Dedup.sampleDedupAware(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_size") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept")))).toMap
    // size-1 clusters: hash mod 1 == 0 for every doc → all kept
    val (c1, d1, k1) = res(1L)
    assert(k1 === d1 && c1 === d1)
    // the planted exact-dup clusters (size 2) keep fewer than all docs
    // but at least... each cluster keeps 0, 1, or 2 (expectation ~1)
    res.filterNot(_._1 == 1L).foreach { case (size, (nc, nd, nk)) =>
      assert(nd === nc * size)
      assert(nk <= nd)
    }
    assert(res.keySet.exists(_ > 1L)) // the corpus genuinely has dup clusters
  }

  test("embed_outliers: labels covered, outlier rule consistent with the stats") {
    val res = graft.operators.Similarity.embedOutliers(spark, sf).collect()
    val nLabels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label").distinct().count()
    assert(res.length === nLabels)
    res.foreach { r =>
      assert(r.getAs[Long]("n_vecs") > 0L)
      val mean = r.getAs[Double]("mean_dist_q")
      val mx = r.getAs[Long]("max_dist_q")
      assert(mx.toDouble >= mean)
      val outliers = r.getAs[Long]("n_outliers")
      assert(outliers >= 0L && outliers < r.getAs[Long]("n_vecs"))
      // the rule is > 4× mean: if the max itself is within 4× mean, no
      // vector can be flagged
      if (mx.toDouble <= 4.0 * mean) assert(outliers === 0L)
    }
  }

  test("text_docstats_drift: summary row aggregates bucket carriers exactly") {
    val res = TextAnalysis.textDocstatsDrift(spark, sf).collect()
    val (summary, buckets) = res.partition(_.getAs[Long]("bucket") == -1L)
    assert(summary.length === 1)
    val s = summary.head
    assert(buckets.map(_.getAs[Long]("n_index")).sum === s.getAs[Long]("n_index"))
    assert(buckets.map(_.getAs[Long]("n_delta")).sum === s.getAs[Long]("n_delta"))
    assert(buckets.map(_.getAs[Long]("drift_carrier")).sum === s.getAs[Long]("drift_carrier"))
    // planted delta genuinely shifts the length distribution
    assert(s.getAs[Long]("drift_carrier") > 0L)
    // l1_part = carrier / (n_index * n_delta), and L1 ≤ 2
    val l1 = s.getAs[Double]("l1_part")
    assert(l1 > 0.0 && l1 <= 2.0)
    assert(l1 === s.getAs[Long]("drift_carrier").toDouble /
      (s.getAs[Long]("n_index").toDouble * s.getAs[Long]("n_delta")))
  }

  test("text_distinctive_terms: contiguous ranks, descending lift, min support") {
    val res = TextAnalysis.textDistinctiveTerms(spark, sf).collect()
    val bySource = res.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (_, rows) =>
      val ranked = rows.sortBy(_.getAs[Long]("rank"))
      assert(ranked.map(_.getAs[Long]("rank")).toSeq === (1L to ranked.length).toSeq)
      assert(ranked.length <= TextAnalysis.DistinctiveTopK)
      val lifts = ranked.map(_.getAs[Double]("lift")).toSeq
      assert(lifts === lifts.sorted.reverse)
      rows.foreach(r => assert(r.getAs[Long]("df_global") >= TextAnalysis.DistinctiveMinDf))
    }
    // lift formula spot-check on one row
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val n = docs.count().toDouble
    val r0 = res.head
    val src = r0.getAs[String]("source")
    val nSrc = docs.filter(col("source") === src).count().toDouble
    val expect = r0.getAs[Long]("df_source") * n / (nSrc * r0.getAs[Long]("df_global"))
    assert(math.abs(r0.getAs[Double]("lift") - expect) < 1e-12)
  }
}
