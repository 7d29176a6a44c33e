package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Flat-star decade stress at DEFAULT split geometry — the round-15
  * extension of HubScale's forced-fan CC ITER path: a flat 10⁸-degree
  * star (CC_STAR_ITER) fed directly to
  * [[Dedup.connectedComponentsOf]] with the PRODUCTION fan cap (1024)
  * and split threshold (2¹⁷) untouched. What it measures, one decade
  * past the committed 2·10⁷ proof:
  *
  *  - the default split path: fan = d/((63/64)·T)+1 ≈ 776 is below the
  *    cap, so the split must converge in ONE round with every virtual
  *    node ≈ 2¹⁷·63/64 ≈ 129k degree (the margin keeps the binomial
  *    spread of the fmix64 route ≥ 6σ under the threshold — see the
  *    fan comment in Dedup);
  *  - the narrow census at 10⁸ edges in 32 scan partitions: each
  *    per-partition LongMap holds ~6.25M entries (~100 MB primitive),
  *    the candidate emission stays under the r15 per-partition cap
  *    (the hub is ONE id), and no overflow fallback fires;
  *  - exact labeling, the strong way: component membership by count
  *    AND id checksum.
  *
  * Usage: runMain graft.tools.HubIter [out=HUB_ITER_1E8.json]
  *   env CC_STAR_ITER (default 100000000)
  */
object HubIter {
  def main(args: Array[String]): Unit = {
    val out = args.lift(0).getOrElse("HUB_ITER_1E8.json")
    val starIter = sys.env.getOrElse("CC_STAR_ITER", "100000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val iterEdges = spark.range(1L, starIter)
      .select(lit(0L).as("doc_a"), col("id").as("doc_b"))
    val iterSumExp = starIter * (starIter - 1) / 2
    val t0 = System.nanoTime()
    val cc = Dedup.connectedComponentsOf(iterEdges).persist()
    cc.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val r = cc.filter(col("cluster_id") === 0L)
      .agg(count(lit(1)), coalesce(sum(col("doc_id")), lit(0L))).head
    cc.unpersist()
    val (cnt, sum0) = (r.getLong(0), r.getLong(1))
    val splitRounds = Dedup.ccLastSplitRounds.get()
    val ccRounds = Dedup.ccLastRounds.get()
    val hubs = Dedup.ccLastSplitHubs.get()
    val censusCands = Dedup.ccLastCensusCands.get()
    val censusOverflow = Dedup.ccLastCensusOverflow.get()

    val checks = Seq(
      // the (63/64)·T fan margin makes the non-binding split one-shot
      "default_fan_single_round" -> (splitRounds == 1),
      "cc_rounds_bounded" -> (ccRounds <= 8),
      "membership_exact" -> (cnt == starIter && sum0 == iterSumExp),
      "census_narrow" -> (censusOverflow == 0),
      // one real hub in round 1; round 2's census finds nothing
      "census_candidates_bounded" -> (censusCands >= 1 && censusCands <= 8))
    def num(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val json =
      s"""{"artifact":"HUB_ITER_1E8","flat_star":$starIter,""" +
      s""""fan_cap":${Dedup.ccSplitFanCap.get()},""" +
      s""""split_degree":${Dedup.ccSplitDegree.get()},""" +
      s""""split_rounds":$splitRounds,"cc_rounds":$ccRounds,""" +
      s""""split_hubs":$hubs,"census_candidates":$censusCands,""" +
      s""""census_overflow_rounds":$censusOverflow,""" +
      s""""count":$cnt,"sum_ok":${sum0 == iterSumExp},""" +
      s""""checks":{${checks.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},""" +
      s""""wall_sec":${num(wall)}}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    require(checks.forall(_._2), s"hub-iter checks failed: ${checks.filterNot(_._2).map(_._1)}")
    spark.stop()
  }
}
