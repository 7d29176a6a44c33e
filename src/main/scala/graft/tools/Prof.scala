package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    if (want("cc_only")) {
      val pairs = Dedup.dupPairs(spark, sfDir).persist()
      pairs.count() // materialize outside the timer
      time("cc_only")(Dedup.connectedComponentsOf(pairs))
      pairs.unpersist()
    }
    spark.stop()
  }
}
