package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Planted-hub stress for the connected-components family — the oldest
  * standing scale watch item (round-9 → round-11 verdicts): the
  * large-star/small-star loop in [[Dedup.connectedComponentsOf]] holds
  * each node's neighborhood in ONE groupByKey task, so a boilerplate
  * hub (the same text pasted into 10⁵–10⁶ documents — mirror farms,
  * license headers, SEO spam) concentrates a component's whole edge set
  * in a single task at the hub center. This tool plants exactly that
  * shape at sf1 and measures the loop's behavior instead of assuming
  * it:
  *
  *  - TEXT path (the uncapped one): HubDocs copies of one boilerplate
  *    text appended to the sf1 corpus. dupPairs' exact-duplicate
  *    grouping emits the component as a STAR (group-min → member, never
  *    the clique), so CC receives one degree-HubDocs star — the
  *    worst-case single-neighborhood shape by construction. Checks:
  *    rounds to converge (a star must contract in O(1) rounds: the
  *    endpoint-sum fixpoint sees an already-contracted component),
  *    wall seconds, and the exact expected membership — the hub
  *    cluster must contain HubDocs plants + the ⌊…/17⌋ corpusOf +1M
  *    copies (same text), labeled by the min plant id; the %10 +2M
  *    copies (every-7th-word-dropped, still identical to EACH OTHER)
  *    must form their own second cluster. All derived arithmetic, no
  *    oracle needed — and the full-clique DuckDB closure is infeasible
  *    at this degree by construction (5·10⁵² pairs), which is WHY the
  *    star-edge design exists.
  *
  *  - EMBEDDING path (the capped one): HubVecs copies of one vector
  *    appended to the sf1 embeddings. dedup_embedding's banded LSH
  *    drops buckets past EmbBucketCap=100 at a bounded collectCapped
  *    (101 ids max per bucket, whatever the bucket's true size), so
  *    the planted hub must contribute ZERO candidate pairs — the CC
  *    loop never sees an embedding hub; the trade is the hub's members
  *    emerge as singletons in the manifest (the documented cap
  *    semantics; embed_dup_vectors is the census that still counts
  *    them). Checks: hub pair count == 0, op completes, wall seconds.
  *
  * Plant ids live in [HubBase, HubBase+HubDocs) which must stay below
  * Dedup.corpusOf's +1M synthetic-copy offset (the ScaleGen plant
  * discipline) — the require trips loudly otherwise.
  *
  * At 10⁸ members (a true 100 TB hub) the single-task neighborhood is
  * ~2.4 GB of boxed longs — past this tool's proof point; the standing
  * mitigation would be high-degree node splitting (salt the hub center
  * into √d virtual nodes joined by a chain) applied BEFORE the loop.
  * This run prices the 5·10⁵ point to decide whether that complexity
  * is needed below 10⁶.
  *
  * Usage: runMain graft.tools.HubScale [sfDir=target/sf1] [out=HUB_SF1.json]
  *   env HUB_DOCS (default 500000), HUB_VECS (default 200000)
  */
object HubScale {
  val HubBase = 100000L

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("target/sf1")
    val out = args.lift(1).getOrElse("HUB_SF1.json")
    val hubDocs = sys.env.getOrElse("HUB_DOCS", "500000").toLong
    val hubVecs = sys.env.getOrElse("HUB_VECS", "200000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      times(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    // ---- stage: sf1 corpus + text hub + embedding hub ----------------
    val stage = java.nio.file.Files.createTempDirectory("graft-hub").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val maxId = docs.agg(max(col("doc_id"))).head.getLong(0)
    require(HubBase > maxId, s"hub base $HubBase inside corpus id space (max $maxId)")
    require(HubBase + hubDocs < 1000000L,
      s"hub ids up to ${HubBase + hubDocs} would collide with corpusOf's +1M copy space")
    val boiler = ("this material is provided as is without warranty of any kind " +
      "express or implied including but not limited to the implied warranties " +
      "of merchantability fitness for a particular purpose and noninfringement " +
      "in no event shall the authors be liable for any claim damages or liability")
    timed("stage_docs") {
      val hub = spark.range(HubBase, HubBase + hubDocs)
        .select(col("id").as("doc_id"), lit(boiler).as("text"),
          lit("en").as("lang"), lit("hub").as("source"),
          lit(boiler.length.toLong).as("n_chars"))
      docs.unionByName(hub).repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$stage/documents.parquet")
    }
    val vecs0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val nVecs0 = vecs0.count()
    timed("stage_vecs") {
      val proto = vecs0.filter(col("vec_id") === 1L)
        .select(col("embedding"), col("label"))
      val hubV = spark.range(nVecs0, nVecs0 + hubVecs)
        .crossJoin(broadcast(proto))
        .select(col("id").as("vec_id"), col("embedding"), col("label"))
      vecs0.unionByName(hubV).repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$stage/embeddings.parquet")
    }

    // ---- text path: the uncapped star through the CC loop ------------
    val clusters = timed("dedup_clusters")(
      Dedup.dedupClusters(spark, stage).persist())
    val nRows = clusters.count()
    val ccRounds = Dedup.ccLastRounds.get()
    // expected hub membership: plants + their %17 +1M same-text copies
    val copies17 = (HubBase until HubBase + hubDocs).count(_ % 17 == 0).toLong
    val hubExpected = hubDocs + copies17
    val hubActual = clusters.filter(col("cluster_id") === HubBase).count()
    val hubSizeCol = clusters.filter(col("cluster_id") === HubBase)
      .agg(max(col("cluster_size"))).head.getLong(0)
    // the %10 +2M copies (identical filtered text) form their own cluster
    val firstMod10 = (HubBase until HubBase + hubDocs).find(_ % 10 == 0).get + 2000000L
    val copies10 = (HubBase until HubBase + hubDocs).count(_ % 10 == 0).toLong
    val secondActual = clusters.filter(col("cluster_id") === firstMod10).count()
    clusters.unpersist()
    val canonKept = timed("dedup_canonical")(
      Dedup.dedupCanonical(spark, stage).filter(col("is_kept")).count())

    // ---- embedding path: the cap guard must zero the hub out ---------
    val hubPairs = timed("dedup_embedding_pairs")(
      Similarity.dedupEmbedding(spark, stage)
        .filter(col("vec_a") >= nVecs0 && col("vec_b") >= nVecs0).count())
    val edc = timed("embed_dup_clusters")(
      Similarity.embedDupClusters(spark, stage).persist())
    val edcRows = edc.count()
    // every hub vector must come out a singleton (cluster of itself)
    val hubSingletons = edc.filter(col("vec_id") >= nVecs0 &&
      col("cluster_id") === col("vec_id") && col("cluster_size") === 1L).count()
    edc.unpersist()

    def num(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val checks = Seq(
      "hub_membership_exact" -> (hubActual == hubExpected),
      "hub_size_col_exact" -> (hubSizeCol == hubExpected),
      "second_cluster_exact" -> (secondActual == copies10),
      "cc_rounds_bounded" -> (ccRounds <= 8),
      "emb_hub_pairs_zero" -> (hubPairs == 0L),
      "emb_hub_all_singletons" -> (hubSingletons == hubVecs))
    val json =
      s"""{"artifact":"HUB_SF1","sf_dir":"$sfDir","hub_docs":$hubDocs,""" +
      s""""hub_vecs":$hubVecs,"hub_base":$HubBase,""" +
      s""""text_path":{"cc_rounds":$ccRounds,"clusters_rows":$nRows,""" +
      s""""hub_cluster_expected":$hubExpected,"hub_cluster_actual":$hubActual,""" +
      s""""hub_cluster_size_col":$hubSizeCol,"second_cluster_expected":$copies10,""" +
      s""""second_cluster_actual":$secondActual,"canonical_kept":$canonKept},""" +
      s""""embedding_path":{"hub_pairs":$hubPairs,"manifest_rows":$edcRows,""" +
      s""""hub_singletons":$hubSingletons},""" +
      s""""checks":{${checks.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},""" +
      s""""stages_sec":{""" +
      times.map { case (k, v) => s""""$k":${num(v)}""" }.mkString(",") +
      s"""},"total_sec":${num(times.values.sum)}}"""
    println(json)
    require(checks.forall(_._2), s"hub checks failed: ${checks.filterNot(_._2).map(_._1)}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    spark.stop()
  }
}
