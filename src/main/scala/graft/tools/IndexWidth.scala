package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Prices the round-15 code-width serving restructure in BYTES — the
  * term the 2M wall-clock A/B (AB_KNNIVFPQ_2M_r15) cannot see while
  * the index is memory-resident: the persisted footprint of the
  * serving index stream_knn_ivfpq probes per query, code-width
  * (cent_id, neighbor_id, codes — the exact frames the operator
  * serves from — (cent_id, neighbor_id, code_pack), via
  * [[Similarity.ivfPqServeIndex]]) vs the r14
  * vector-width shape (the same index joined with each member's exact
  * 64-double vector + norm). At a billion vectors this ratio decides
  * whether the index fits executor memory at all.
  *
  * Usage: runMain graft.tools.IndexWidth <sfDir> [out=INDEX_WIDTH_2M_r15.json]
  */
object IndexWidth {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("target/sf100e")
    val out = args.lift(1).getOrElse("INDEX_WIDTH_2M_r15.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Similarity.exactVecsFor(spark, sfDir)
    val (index, _, _, _, _) = Similarity.ivfPqServeIndex(spark, e)

    // measure one persisted frame at a time so storage info is
    // unambiguous
    def persistedBytes(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val p = df.persist()
      val n = p.count()
      val bytes = spark.sparkContext.getRDDStorageInfo
        .map(i => i.memSize + i.diskSize).sum
      p.unpersist(blocking = true)
      (n, bytes)
    }

    index.count() // materialize the operator's own persist
    val codeOnly = index.select(col("cent_id"), col("neighbor_id"), col("code_pack"))
    index.unpersist(blocking = true) // leave only the measured frame below
    val (nCode, codeBytes) = persistedBytes(codeOnly)

    val vectorWidth = codeOnly.join(
      e.select(col("vec_id").as("neighbor_id"), col("v"), col("nrm")),
      Seq("neighbor_id"))
    val (nVec, vecBytes) = persistedBytes(vectorWidth)

    require(nCode == nVec, s"row counts must match: $nCode vs $nVec")
    def num(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val json =
      s"""{"artifact":"INDEX_WIDTH","sf":"$sfDir","index_rows":$nCode,""" +
      s""""code_width_bytes":$codeBytes,"vector_width_bytes":$vecBytes,""" +
      s""""code_bytes_per_row":${num(codeBytes.toDouble / nCode)},""" +
      s""""vector_bytes_per_row":${num(vecBytes.toDouble / nVec)},""" +
      s""""vector_over_code":${num(vecBytes.toDouble / codeBytes)}}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    spark.stop()
  }
}
