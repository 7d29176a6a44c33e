package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** Prices the round-15 one-shot cluster-family materialization
  * ([[Dedup.dedupFamily]]) against the four standalone operators at
  * scale — the deployment question: a 100 TB dedup pass wants the
  * manifest (dedup_clusters), the training filter (dedup_canonical),
  * the savings report (dedup_cluster_stats) and the survivorship
  * census from ONE labeling, not four recomputations of the pair
  * relation + CC fixpoint.
  *
  * Measurement mirrors graft.Bench: count() materializes each frame,
  * wall time per leg, cache cleared between legs so the standalone leg
  * cannot ride the family leg's persisted labels (or vice versa).
  * DedupSpec already pins frame-for-frame equality, so this tool
  * times; it does not re-verify.
  *
  * Usage: runMain graft.tools.DedupFamilyBench <sfDir> [out=DEDUPFAM_ONESHOT_r15.json]
  */
object DedupFamilyBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("target/sf10")
    val out = args.lift(1).getOrElse("DEDUPFAM_ONESHOT_r15.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    val standaloneFns = Seq(
      "dedup_clusters" -> (() => Dedup.dedupClusters(spark, sfDir)),
      "dedup_canonical" -> (() => Dedup.dedupCanonical(spark, sfDir)),
      "dedup_cluster_stats" -> (() => Dedup.dedupClusterStats(spark, sfDir)),
      "dedup_survivorship" -> (() => Dedup.dedupSurvivorship(spark, sfDir)))

    // warm leg (parquet footers, codegen, JIT) charged to neither side
    Dedup.dedupClusterStats(spark, sfDir).count()
    spark.catalog.clearCache()

    // leg A: the four standalone operators, each recomputing pairs + CC
    val standalone = standaloneFns.map { case (name, fn) =>
      name -> timed(fn().count())
    }
    val standaloneTotal = standalone.map(_._2).sum
    spark.catalog.clearCache()

    // leg B: one labeling, four derived frames
    var famTimes = Seq.empty[(String, Double)]
    val familyTotal = timed {
      val fam = Dedup.dedupFamily(spark, sfDir)
      famTimes = standaloneFns.map { case (name, _) =>
        name -> timed(fam(name).count())
      }
      fam("labels").unpersist()
    }

    def num(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def jmap(rs: Seq[(String, Double)]) =
      rs.map { case (k, v) => "\"" + k + "\":" + num(v) }.mkString("{", ",", "}")
    val json =
      s"""{"artifact":"DEDUPFAM_ONESHOT","sf":"$sfDir",""" +
      s""""standalone":${jmap(standalone)},""" +
      s""""standalone_total_sec":${num(standaloneTotal)},""" +
      s""""family":${jmap(famTimes)},""" +
      s""""family_total_sec":${num(familyTotal)},""" +
      s""""family_vs_standalone":${num(familyTotal / standaloneTotal)}}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    spark.stop()
  }
}
