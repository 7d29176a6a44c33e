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
  *  - EMBEDDING path: HubVecs copies of one vector appended to the sf1
  *    embeddings. dedup_embedding's banded LSH drops buckets past
  *    EmbBucketCap=100 at a bounded collectCapped, so the planted hub
  *    contributes ZERO LSH candidate pairs (checked) — but since round
  *    13, embed_dup_clusters ALSO feeds exact-dup star edges (group-min
  *    → member over the 1e-6-quantized array) into the CC pair stream,
  *    so the hub must now emerge as ONE cluster with exact membership
  *    and a single keeper — the blindness HUB_SF1 r12 measured (200k
  *    keep=true singletons) is the regression this guards against.
  *
  *  - CC SPLIT path (round-13 directive, re-geometried in round 14):
  *    two planted exact-dup stars of CC_STAR_A (20M) and CC_STAR_B
  *    (9M) identical-text docs, fed through the REAL star emitter
  *    (Dedup.exactDupStarEdges) into Dedup.connectedComponentsOf.
  *    The two-level emitter already divides a group's worst degree by
  *    StarSalt=64, so the stars must exceed 64·2^17 ≈ 8.4M members
  *    for any node to cross ccSplitDegree — the round-13 3M/2M
  *    geometry (committed by an intermediate FLAT-emitter build)
  *    never engages the split on the final binary, which is exactly
  *    why the artifact is regenerated here. At 20M/9M the ~130
  *    per-salt local roots all cross the threshold: splitting must
  *    engage (ccLastSplitHubs ≥ 2), converge in bounded rounds, and
  *    return both components with exact membership (count +
  *    id-checksum per cluster), no single-task neighborhood above
  *    ~degree/fan.
  *  - CC ITER path (round-14 directive: one decade past r13): a FLAT
  *    star of CC_STAR_ITER (20M) edges fed DIRECTLY to
  *    connectedComponentsOf — the raw 2·10⁷-degree hub an arbitrary
  *    pair relation (LSH buckets, jaccard pairs — no emitter salting
  *    in front) can contain. With the fan cap forced to 4, one round
  *    leaves 5M-degree virtual nodes, so the pass must ITERATE
  *    (expected 4 rounds: 20M → 5M → 1.25M → 312k → 78k) and still
  *    label the component exactly by count and id checksum.
  *
  * Text-path plant ids live in [HubBase, HubBase+HubDocs) which must
  * stay below Dedup.corpusOf's +1M synthetic-copy offset (the ScaleGen
  * plant discipline) — the require trips loudly otherwise. Embedding
  * plant ids start at max(vec_id)+1 of the actual corpus (no dense-id
  * assumption).
  *
  * Usage: runMain graft.tools.HubScale [sfDir=target/sf1] [out=HUB_SF1.json]
  *   env HUB_DOCS (default 500000), HUB_VECS (default 200000),
  *       CC_STAR_A (default 20000000), CC_STAR_B (default 9000000),
  *       CC_STAR_ITER (default 20000000)
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
    // plant base = max(vec_id)+1: no dense-id assumption — a sparse
    // layout would otherwise collide plant ids with existing vectors
    val hubVecBase = vecs0.agg(max(col("vec_id"))).head.getLong(0) + 1L
    timed("stage_vecs") {
      val proto = vecs0.filter(col("vec_id") === 1L)
        .select(col("embedding"), col("label"))
      val hubV = spark.range(hubVecBase, hubVecBase + hubVecs)
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

    // ---- embedding path: LSH stays capped, star edges carry the hub --
    // any pair touching a planted vector counts (|| — a hub↔original
    // pair must not escape the check)
    val hubPairs = timed("dedup_embedding_pairs")(
      Similarity.dedupEmbedding(spark, stage)
        .filter(col("vec_a") >= hubVecBase || col("vec_b") >= hubVecBase).count())
    // expected hub cluster = the exact 1e-6-quantized-vq group of the
    // prototype (vec_id 1) in the STAGED corpus: plants + vec 1 + any
    // corpus vector identical on the grid. Root = the group min.
    val stagedQv = spark.read.parquet(s"$stage/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"),
        x => floor(x.cast("double") * 1e6 + 0.5).cast("long")).as("vq"))
    val protoVq = stagedQv.filter(col("vec_id") === 1L).select(col("vq"))
    val expGroup = stagedQv.join(broadcast(protoVq), Seq("vq"))
    val expSize = expGroup.count()
    val expRoot = expGroup.agg(min(col("vec_id"))).head.getLong(0)
    val edc = timed("embed_dup_clusters")(
      Similarity.embedDupClusters(spark, stage).persist())
    val edcRows = edc.count()
    val hubMisplaced = edc.filter(col("vec_id") >= hubVecBase &&
      col("cluster_id") =!= expRoot).count()
    val hubClusterSize = edc.filter(col("cluster_id") === expRoot).count()
    val hubKeepers = edc.filter(col("cluster_id") === expRoot && col("is_kept")).count()
    edc.unpersist()

    // ---- CC split path: 20M + 9M planted stars through the real loop --
    // (must exceed 64·2^17 members each: the two-level emitter divides
    // the worst per-node degree by StarSalt=64 before CC ever sees it)
    val starA = sys.env.getOrElse("CC_STAR_A", "20000000").toLong
    val starB = sys.env.getOrElse("CC_STAR_B", "9000000").toLong
    val ccDocs = spark.range(0L, starA + starB)
      .select(col("id").as("doc_id"),
        when(col("id") < starA, lit("alpha boilerplate mirrored across the farm"))
          .otherwise(lit("beta license header stamped on every file")).as("text"))
    val ccClusters = timed("cc_split")(
      Dedup.connectedComponentsOf(Dedup.exactDupStarEdges(ccDocs)).persist())
    val ccSplitRows = ccClusters.count()
    val ccSplitRounds = Dedup.ccLastRounds.get() // CC-loop rounds
    val splitHubs = Dedup.ccLastSplitHubs.get()
    val splitPassRounds = Dedup.ccLastSplitRounds.get() // pre-loop split rounds
    def clusterAgg(root: Long): (Long, Long) = {
      // coalesce: sum() over an empty cluster is null — a membership
      // regression must FAIL the named check, not NPE before the JSON
      val r = ccClusters.filter(col("cluster_id") === root)
        .agg(count(lit(1)), coalesce(sum(col("doc_id")), lit(0L))).head
      (r.getLong(0), r.getLong(1))
    }
    val (aCount, aSum) = clusterAgg(0L)
    val (bCount, bSum) = clusterAgg(starA)
    ccClusters.unpersist()
    val aSumExp = starA * (starA - 1) / 2
    val bSumExp = starB * starA + starB * (starB - 1) / 2

    // ---- forced-iteration split: a FLAT 20M-degree star (no emitter
    // salting in front — the arbitrary-pair-relation shape) with the
    // fan cap forced to 4, so one round leaves 5M-degree virtual nodes
    // and the pass must iterate (20M → 5M → 1.25M → 312k → 78k, 4
    // rounds) and still label the component exactly
    val starIter = sys.env.getOrElse("CC_STAR_ITER", "20000000").toLong
    val iterEdges = spark.range(1L, starIter)
      .select(lit(0L).as("doc_a"), col("id").as("doc_b"))
    val iterSumExp = starIter * (starIter - 1) / 2
    val savedFan = Dedup.ccSplitFanCap.get()
    val (itSplitRounds, itCcRounds, itHubs, itCount, itSumOk) =
      try {
        Dedup.ccSplitFanCap.set(4)
        val cc2 = timed("cc_split_iter")(
          Dedup.connectedComponentsOf(iterEdges).persist())
        cc2.count()
        val r = cc2.filter(col("cluster_id") === 0L)
          .agg(count(lit(1)), coalesce(sum(col("doc_id")), lit(0L))).head
        cc2.unpersist()
        (Dedup.ccLastSplitRounds.get(), Dedup.ccLastRounds.get(),
          Dedup.ccLastSplitHubs.get(), r.getLong(0), r.getLong(1) == iterSumExp)
      } finally Dedup.ccSplitFanCap.set(savedFan)

    def num(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val checks = Seq(
      "hub_membership_exact" -> (hubActual == hubExpected),
      "hub_size_col_exact" -> (hubSizeCol == hubExpected),
      "second_cluster_exact" -> (secondActual == copies10),
      "cc_rounds_bounded" -> (ccRounds <= 8),
      "emb_hub_pairs_zero" -> (hubPairs == 0L),
      "emb_hub_one_cluster" -> (hubMisplaced == 0L && hubClusterSize == expSize),
      "emb_hub_single_keeper" -> (hubKeepers == 1L),
      "cc_split_hubs_engaged" -> (splitHubs >= 2),
      "cc_split_rounds_bounded" -> (ccSplitRounds <= 8),
      "cc_split_a_exact" -> (aCount == starA && aSum == aSumExp),
      "cc_split_b_exact" -> (bCount == starB && bSum == bSumExp),
      "cc_split_iter_multi_round" -> (itSplitRounds >= 2),
      "cc_split_iter_rounds_bounded" -> (itCcRounds <= 8),
      "cc_split_iter_exact" -> (itCount == starIter && itSumOk))
    val json =
      s"""{"artifact":"HUB_SF1","sf_dir":"$sfDir","hub_docs":$hubDocs,""" +
      s""""hub_vecs":$hubVecs,"hub_base":$HubBase,"hub_vec_base":$hubVecBase,""" +
      s""""text_path":{"cc_rounds":$ccRounds,"clusters_rows":$nRows,""" +
      s""""hub_cluster_expected":$hubExpected,"hub_cluster_actual":$hubActual,""" +
      s""""hub_cluster_size_col":$hubSizeCol,"second_cluster_expected":$copies10,""" +
      s""""second_cluster_actual":$secondActual,"canonical_kept":$canonKept},""" +
      s""""embedding_path":{"hub_pairs":$hubPairs,"manifest_rows":$edcRows,""" +
      s""""hub_cluster_root":$expRoot,"hub_cluster_expected":$expSize,""" +
      s""""hub_cluster_actual":$hubClusterSize,"hub_misplaced":$hubMisplaced,""" +
      s""""hub_keepers":$hubKeepers},""" +
      s""""cc_split":{"star_a":$starA,"star_b":$starB,"rows":$ccSplitRows,""" +
      s""""cc_rounds":$ccSplitRounds,"split_rounds":$splitPassRounds,""" +
      s""""split_hubs":$splitHubs,""" +
      s""""a_count":$aCount,"a_sum_ok":${aSum == aSumExp},""" +
      s""""b_count":$bCount,"b_sum_ok":${bSum == bSumExp}},""" +
      s""""cc_split_iter":{"forced_fan":4,"flat_star":$starIter,""" +
      s""""split_rounds":$itSplitRounds,"cc_rounds":$itCcRounds,""" +
      s""""split_hubs":$itHubs,"count":$itCount,"sum_ok":$itSumOk},""" +
      s""""checks":{${checks.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},""" +
      s""""stages_sec":{""" +
      times.map { case (k, v) => s""""$k":${num(v)}""" }.mkString(",") +
      s"""},"total_sec":${num(times.values.sum)}}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    // staged corpora are multi-GB — never leave them in /tmp
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
    require(checks.forall(_._2), s"hub checks failed: ${checks.filterNot(_._2).map(_._1)}")
    spark.stop()
  }
}
