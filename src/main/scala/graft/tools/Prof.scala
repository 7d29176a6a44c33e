package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiling harness: stage-level wall times for the heavy queries.
  * `runMain graft.tools.Prof <sfDir> <stage...>` — each stage is timed
  * twice (cold, warm) with the cache cleared in between, mirroring
  * Bench's best-of-2 so numbers are comparable. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(mk: => DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        (dt, n)
      }
      println(f"PROF $name%-28s min=${ts.map(_._1).min}%6.2fs rows=${ts.head._2}")
    }

    import graft.operators.{Dedup, Similarity}
    val stages = if (args.length > 1) args.drop(1).toSet else Set.empty[String]
    def want(n: String) = stages.isEmpty || stages(n)
    if (want("corpus")) time("corpus")(Dedup.corpus(spark, sfDir))
    if (want("corpusShingles")) time("corpusShingles")(Dedup.corpusShingles(spark, sfDir))
    if (want("rareShingleGroups")) time("rareShingleGroups")(Dedup.rareShingleGroups(spark, sfDir))
    if (want("jaccardPairs")) time("jaccardPairs")(Dedup.jaccardPairs(spark, sfDir))
    if (want("dupPairs")) time("dupPairs")(Dedup.dupPairs(spark, sfDir))
    if (want("clusters_full")) time("clusters_full")(Dedup.dedupClusters(spark, sfDir))
    if (want("canonical_full")) time("canonical_full")(Dedup.dedupCanonical(spark, sfDir))
    if (want("minhash_full")) time("minhash_full")(Dedup.dedupMinhash(spark, sfDir))
    if (want("simhash_full")) time("simhash_full")(Dedup.dedupSimhash(spark, sfDir))
    if (want("knn_lsh_full")) time("knn_lsh_full")(Similarity.knnLsh(spark, sfDir))
    import graft.streaming.CdcStream
    if (want("stream_cdc_apply")) time("stream_cdc_apply")(CdcStream.streamCdcApply(spark, sfDir))
    if (want("stream_window_agg")) time("stream_window_agg")(CdcStream.streamWindowAgg(spark, sfDir))
    if (want("stream_sessionize")) time("stream_sessionize")(CdcStream.streamSessionize(spark, sfDir))
    if (want("stream_dedup")) time("stream_dedup")(CdcStream.streamDedup(spark, sfDir))
    if (want("rp")) {
      val df = Similarity.embedRpDistortion(spark, sfDir)
      df.explain("formatted")
      time("rp")(df)
    }
    if (want("rp_stages")) {
      // embedRpDistortion decomposed (dev-only mirror of its stages) to
      // localize where the wall time goes.
      import org.apache.spark.sql.graftvec.{LshSignatures => LS}
      import org.apache.spark.sql.Column
      // reference the production constants so this mirror cannot drift
      // from the real query's plane family / scale (ADVICE r11: a
      // re-declared RpPlaneBase=77 profiled LSH-reserved planes).
      val RpDim = Similarity.RpDim; val RpScale = Similarity.RpScale
      val RpPlaneBase = Similarity.RpPlaneBase; val Dim = 64
      val SimHistBand = Similarity.SimHistBand
      import org.apache.spark.sql.graftvec.VectorExpressions.qdot
      val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("v"))
        .withColumn("nrm", qdot(col("v"), col("v")))
      def planeCol(j: Int): Column =
        array((0 until Dim).map(i => lit(LS.planeSign(RpPlaneBase + j, i))): _*)
      val projected = e
        .withColumn("pm", array((0 until RpDim).map(j =>
          floor(qdot(col("v"), planeCol(j)).cast("double") / RpScale).cast("long")): _*))
      // count() would prune the computed columns; aggregate them so the
      // expressions actually evaluate.
      time("rp_project_only")(
        projected.agg(sum(element_at(col("pm"), 1)).as("s")))
      val a = projected.select(col("label"), col("vec_id").as("vec_a"),
        col("v").as("va"), col("nrm").as("na"), col("pm").as("pa"))
        .withColumn("band", floor(col("vec_a") / SimHistBand))
      val b = projected.select(col("label"), col("vec_id").as("vec_b"),
        col("v").as("vb"), col("nrm").as("nb"), col("pm").as("pb"))
        .withColumn("band", explode(array(floor(col("vec_b") / SimHistBand),
          floor(col("vec_b") / SimHistBand) - 1)))
      val joined = a.join(b, Seq("label", "band"))
        .filter(col("vec_a") < col("vec_b") &&
          col("vec_b") - col("vec_a") <= SimHistBand)
      time("rp_join_only")(joined.agg(sum(col("vec_b") - col("vec_a")).as("s")))
      val cos = joined.withColumn("cos64",
        qdot(col("va"), col("vb")).cast("double")
          / sqrt(col("na").cast("double") * col("nb").cast("double")))
      time("rp_join_cos64")(cos.agg(sum(col("cos64")).as("s")))
      val dot16 = (0 until RpDim).map(j =>
        element_at(col("pa"), j + 1) * element_at(col("pb"), j + 1)).reduce(_ + _)
      time("rp_join_dot16")(joined.agg(sum(dot16).as("s")))
      val n16 = (p: Column) => (0 until RpDim).map(j =>
        element_at(p, j + 1) * element_at(p, j + 1)).reduce(_ + _)
      val full = joined
        .withColumn("cos64", qdot(col("va"), col("vb")).cast("double")
          / sqrt(col("na").cast("double") * col("nb").cast("double")))
        .withColumn("cos16",
          when(n16(col("pa")) > 0L && n16(col("pb")) > 0L,
            dot16.cast("double")
              / sqrt(n16(col("pa")).cast("double") * n16(col("pb")).cast("double")))
            .otherwise(lit(0d)))
        .withColumn("err_mn",
          abs(floor(col("cos64") * 1000d + 0.5d).cast("long")
            - floor(col("cos16") * 1000d + 0.5d).cast("long")))
        .withColumn("err_bucket", expr("err_mn DIV 25"))
        .groupBy(col("err_bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("err_mn")).as("err_min_mn"),
          max(col("err_mn")).as("err_max_mn"))
      time("rp_full_mirror")(full)
      // exact real shape: n16 precomputed pre-join, select boundary
      val a2 = projected.select(col("label"), col("vec_id").as("vec_a"),
        col("v").as("va"), col("nrm").as("na"), col("pm").as("pa"))
        .withColumn("n16a", n16(col("pa")))
        .withColumn("band", floor(col("vec_a") / SimHistBand))
      val b2 = projected.select(col("label"), col("vec_id").as("vec_b"),
        col("v").as("vb"), col("nrm").as("nb"), col("pm").as("pb"))
        .withColumn("n16b", n16(col("pb")))
        .withColumn("band", explode(array(floor(col("vec_b") / SimHistBand),
          floor(col("vec_b") / SimHistBand) - 1)))
      val joined2 = a2.join(b2, Seq("label", "band"))
        .filter(col("vec_a") < col("vec_b") &&
          col("vec_b") - col("vec_a") <= SimHistBand)
      def tail(cos64: Column, cos16: Column) = joined2
        .withColumn("err_mn",
          abs(floor(cos64 * 1000d + 0.5d).cast("long")
            - floor(cos16 * 1000d + 0.5d).cast("long")))
        .select(col("err_mn"))
        .withColumn("err_bucket", expr("err_mn DIV 25"))
        .groupBy(col("err_bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          min(col("err_mn")).as("err_min_mn"), max(col("err_mn")).as("err_max_mn"))
      val cos64e = qdot(col("va"), col("vb")).cast("double")
        ./(sqrt(col("na").cast("double") * col("nb").cast("double")))
      val cos16e = when(col("n16a") > 0L && col("n16b") > 0L,
        dot16.cast("double")
          / sqrt(col("n16a").cast("double") * col("n16b").cast("double")))
        .otherwise(lit(0d))
      time("rp_real_shape")(tail(cos64e, cos16e))
      time("rp_abl_no_cos16")(tail(cos64e, lit(0d)))
      time("rp_abl_no_cos64")(tail(lit(0d), cos16e))
      time("rp_abl_no_dot16")(tail(cos64e,
        when(col("n16a") > 0L && col("n16b") > 0L,
          lit(1d) / sqrt(col("n16a").cast("double") * col("n16b").cast("double")))
          .otherwise(lit(0d))))
    }
    if (want("mh_stages")) {
      // dedup_minhash decomposed: bands kernel vs bucket-pair join.
      import org.apache.spark.sql.graftvec.MinHashExpressions.{collectCapped, minhashBands, sortedPairs}
      import graft.functions.TextFunctions.{shingles3HashedFromWords, words}
      val bands = Dedup.corpus(spark, sfDir)
        .withColumn("hs", shingles3HashedFromWords(words(col("text"))))
        .filter(size(col("hs")) > 0)
        .select(col("doc_id"),
          posexplode(minhashBands(col("hs"), Dedup.NumHashes, Dedup.NumBands))
            .as(Seq("band_id", "band_hash")))
      time("mh_bands_only")(bands.agg(sum(col("band_hash")).as("s")))
      val persisted = bands.persist()
      persisted.count() // materialize outside the timer
      val pairs = persisted
        .groupBy(col("band_id"), col("band_hash"))
        .agg(collectCapped(col("doc_id"), 101).as("ds"), count(lit(1)).as("sz"))
        .filter(col("sz") >= 2 && col("sz") <= 100)
        .select(explode(sortedPairs(col("ds"))).as("p"))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      time("mh_pairs_only")(pairs
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("n_shared_bands"))
          .filter(col("n_shared_bands") >= 2))
      persisted.unpersist()
      // candidate fix: explicit exchange between the kernel-heavy band
      // producer and the collectCapped aggregate (splits the fused stage)
      val pairsRepart = bands.repartition(32, col("band_id"), col("band_hash"))
        .groupBy(col("band_id"), col("band_hash"))
        .agg(collectCapped(col("doc_id"), 101).as("ds"), count(lit(1)).as("sz"))
        .filter(col("sz") >= 2 && col("sz") <= 100)
        .select(explode(sortedPairs(col("ds"))).as("p"))
        .select(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("n_shared_bands"))
        .filter(col("n_shared_bands") >= 2)
      time("mh_full_repart")(pairsRepart)
    }
    if (want("rsg_ab")) {
      // rareShingleGroups fused-vs-split A/B: does the bucketPairs
      // codegen-split observation (explicit exchange between the
      // kernel-heavy producer and the object-hash-aggregate) apply to
      // the rare-shingle groupBy too?
      import org.apache.spark.sql.graftvec.MinHashExpressions.collectCapped
      val sh = Dedup.corpusShingles(spark, sfDir)
      def fused = sh.groupBy(col("h"))
        .agg(collectCapped(col("doc_id"), Dedup.ShingleFreqCap + 1).as("ds"),
          count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= Dedup.ShingleFreqCap)
        .select(col("ds"))
      def split = sh.repartition(col("h")).groupBy(col("h"))
        .agg(collectCapped(col("doc_id"), Dedup.ShingleFreqCap + 1).as("ds"),
          count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= Dedup.ShingleFreqCap)
        .select(col("ds"))
      time("rsg_fused")(fused.select(explode(col("ds")).as("d")).agg(sum(col("d"))))
      time("rsg_split")(split.select(explode(col("ds")).as("d")).agg(sum(col("d"))))
      time("rsg_fused2")(fused.select(explode(col("ds")).as("d")).agg(sum(col("d"))))
      time("rsg_split2")(split.select(explode(col("ds")).as("d")).agg(sum(col("d"))))
    }
    if (want("star_ab")) {
      // exactDupStarEdges cost + the dupPairs union.distinct cost
      val star = Dedup.exactDupStarEdges(Dedup.corpus(spark, sfDir))
      time("star_edges")(star.agg(sum(col("doc_a") + col("doc_b"))))
      val jp = Dedup.jaccardPairs(spark, sfDir).select(col("doc_a"), col("doc_b"))
      time("dup_union_nodist")(star.unionByName(jp).agg(sum(col("doc_a") + col("doc_b"))))
      time("dup_union_dist")(star.unionByName(jp).distinct().agg(sum(col("doc_a") + col("doc_b"))))
    }
    if (want("cc_only")) {
      val pairs = Dedup.dupPairs(spark, sfDir).persist()
      pairs.count() // materialize outside the timer
      time("cc_only")(Dedup.connectedComponentsOf(pairs))
      pairs.unpersist()
    }
    spark.stop()
  }
}
