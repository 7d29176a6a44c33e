package graft

import org.apache.spark.sql.functions._

import graft.cdc.{CdcOps, Reconcile}
import graft.operators.{Dedup, TextAnalysis}

/** Semantic checks for the round-3 pipeline operators (the oracle
  * verifies exact values; these verify the MEANING — planted leaks are
  * caught, audits reconcile, ladders agree with the flat compare). */
class PipelineOpsSpec extends SparkSpec {

  test("dedup_decontaminate flags every planted copy of an eval doc") {
    val flagged = Dedup.dedupDecontaminate(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // eval set = base docs with doc_id % 10 == 0; their planted near
    // copies live at +2_000_000 and are textual near-dups -> must be caught
    val nearLeaks = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 10 === 0).select("doc_id")
      .collect().map(_.getLong(0) + 2000000L)
    nearLeaks.foreach(d => assert(flagged.contains(d), s"near-copy leak $d not flagged"))
    // exact copies of eval docs (%170 = %17 ∩ %10) live at +1_000_000
    val exactLeaks = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 170 === 0).select("doc_id")
      .collect().map(_.getLong(0) + 1000000L)
    exactLeaks.foreach(d => assert(flagged.contains(d), s"exact-copy leak $d not flagged"))
  }

  test("text_repetition: ratios well-formed, repetition classes consistent") {
    val rows = TextAnalysis.textRepetition(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nWords = r.getAs[Int]("n_words")
      val nDistinct = r.getAs[Int]("n_distinct")
      val dr = r.getAs[Double]("distinct_ratio")
      val tf = r.getAs[Double]("top_bigram_frac")
      assert(nDistinct >= 1 && nDistinct <= nWords)
      assert(dr > 0 && dr <= 1.0)
      assert(tf > 0 && tf <= 1.0)
      val cls = r.getAs[String]("rep_class")
      if (dr < 0.5) assert(cls === "REPETITIVE")
      else if (tf > 0.1) assert(cls === "LOOPY")
      else assert(cls === "OK")
    }
  }

  test("sample_weighted: full-weight sources keep everything, quarter-weight sources thin out") {
    val rows = TextAnalysis.sampleWeighted(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("keep_per_mille"))).toSeq
    assert(rows.size === 20)
    rows.foreach { case (src, nDocs, nKept, thr) =>
      val n = src.stripPrefix("src").toLong
      assert(thr === (n % 4 + 1) * 250, s"$src threshold")
      if (thr == 1000) assert(nKept === nDocs, s"$src must keep all docs")
      else assert(nKept < nDocs, s"$src must thin out")
    }
  }

  test("cdc_log_compaction: audit reconciles with the raw event log") {
    val rows = CdcOps.logCompaction(spark, sf).collect()
    val totalEvents = rows.map(_.getAs[Long]("n_events")).sum
    assert(totalEvents === spark.read.parquet(s"$sf/events.parquet").count())
    rows.foreach { r =>
      val ne = r.getAs[Long]("n_events")
      val nc = r.getAs[Long]("n_compacted")
      assert(nc >= 1 && nc <= ne)
      val ratio = r.getAs[Double]("compaction_ratio")
      assert(math.abs(ratio - nc.toDouble / ne) < 1e-12)
    }
  }

  test("recon_merkle agrees with the flat bucket compare") {
    val ladder = Reconcile.reconMerkle(spark, sf).collect()
    val level0 = ladder.filter(_.getAs[Int]("level") == 0)
    assert(level0.length === 8)
    // drill-down appears exactly under mismatched super-buckets
    val badSup = level0.filter(!_.getAs[Boolean]("node_match")).map(_.getAs[Long]("bucket")).toSet
    val leaves = ladder.filter(_.getAs[Int]("level") == 1)
    assert(leaves.map(_.getAs[Long]("bucket") / 8).toSet === badSup)
    // leaf verdicts match recon_hash_bucket's flat 64-bucket compare
    val flat = Reconcile.reconHashBucket(spark, sf).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Boolean]("bucket_match")).toMap
    leaves.foreach { l =>
      assert(l.getAs[Boolean]("node_match") === flat(l.getAs[Long]("bucket")))
    }
    // a clean super-bucket implies every child bucket is clean in the flat compare
    val cleanSup = level0.filter(_.getAs[Boolean]("node_match")).map(_.getAs[Long]("bucket")).toSet
    flat.foreach { case (b, m) => if (cleanSup.contains(b / 8)) assert(m, s"bucket $b") }
  }
}
