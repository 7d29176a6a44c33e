package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Active-regime evidence for the adaptive IVF geometry (the round-11
  * directive): at every SF with committed gate evidence the embeddings
  * corpus sits at or below IvfCellThresh=256k vectors (sf10 = 200k), so
  * `ivfCellsFor` returns the round-9 128-cell/8-probe geometry and the
  * round-10 chain never changes an answer. This tool runs the IVF
  * family at a corpus PAST the first thresholds — the embeddings-only
  * ×10 ScaleGen step from sf10 gives 2M vectors → 512 cells /
  * 12 probes — and measures what the gate cannot:
  *
  *  - the chain values the Spark side derives from the corpus count
  *    (printed and required to be past the 128-cell floor);
  *  - recall@K of knn_ivf and knn_ivfpq against exact knn_brute,
  *    computed in-Spark with knnRecallAudit's hit-join arithmetic.
  *    The full DuckDB replay of the ivf oracles is INFEASIBLE here by
  *    construction: the corpus-assignment join alone is N×C =
  *    2M×512 = 1.0e9 64-dim list dots (the sf1 recall-audit oracle
  *    already OOMed at 109 GB), and NarrowReplay's query-batch
  *    narrowing cannot shrink it — the INDEX side, not the serving
  *    batch, carries the cost. embed_index_plan's count-only oracle IS
  *    replayed at this corpus (Verify + compare.py alongside this
  *    tool), so the geometry numbers themselves are oracle-checked;
  *  - embed_ivf_balance's occupancy bands at the new geometry (r12:
  *    band edges are now geometry-relative — quarters of the mean
  *    occupancy — so the census discriminates at every chain rung
  *    instead of saturating in a fixed absolute top band);
  *  - wall seconds per stage, for the growth table vs sf10.
  *
  * Writes one JSON line to IVF_ACTIVE_2M.json (or argv(1)).
  *
  * Usage: runMain graft.tools.IvfScale [sfDir=target/sf100e] [out=IVF_ACTIVE_2M.json]
  */
object IvfScale {

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("target/sf100e")
    val out = args.lift(1).getOrElse("IVF_ACTIVE_2M.json")
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

    val n = spark.read.parquet(s"$sfDir/embeddings.parquet").count()
    val cells = Similarity.ivfCellsFor(n)
    val nprobe = Similarity.ivfNprobeFor(n)
    require(cells > Similarity.IvfCentMin,
      s"corpus of $n vectors does not reach the adaptive regime " +
        s"(cells=$cells == floor ${Similarity.IvfCentMin}) — scale the input up")

    // Exact reference: brute-force top-K over the fixed serving batch.
    val brute = timed("knn_brute_exact") {
      val b = Similarity.knnBrute(spark, sfDir)
        .select(col("query_id"), col("neighbor_id")).persist()
      b.count()
      b
    }
    val nPairs = brute.count()

    def recall(name: String, approx: => DataFrame): Double = timed(name) {
      val hits = approx.select(col("query_id"), col("neighbor_id"))
        .join(brute, Seq("query_id", "neighbor_id"), "left_semi").count()
      hits.toDouble / nPairs
    }
    val rIvf = recall("knn_ivf", Similarity.knnIvf(spark, sfDir))
    val rIvfPq = recall("knn_ivfpq", Similarity.knnIvfPq(spark, sfDir))

    // Recall/cost curve over the composite's two serving knobs (the
    // round-12 directive): is Nprobe or the ADC shortlist the binding
    // constraint behind the 0.942 operating point? Each cell re-runs
    // the full operator (assignment + ADC + re-rank), so `sec` is the
    // true serving cost of that configuration, not a marginal delta.
    def num(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val sweep = for {
      np <- Seq(8, 12, 16, 24)
      sl <- Seq(50, 100)
    } yield {
      val key = s"ivfpq_np${np}_sl$sl"
      val r = recall(key, Similarity.knnIvfPqTuned(spark, sfDir, Some(np), Some(sl)))
      s"""{"nprobe":$np,"shortlist":$sl,"recall":${num(r)},"sec":${num(times(key))}}"""
    }

    val balance = timed("embed_ivf_balance")(
      Similarity.embedIvfBalance(spark, sfDir).collect())
    val balJson = balance.map { r =>
      s""""${r.getString(0)}":{"n_cells":${r.getLong(1)},""" +
        s""""n_vectors":${r.getLong(2)},"share_bp":${r.getLong(3)}}"""
    }.mkString(",")
    val meanOcc = balance.headOption.map(_.getLong(4)).getOrElse(0L)

    val json =
      s"""{"regime":"ivf_adaptive_active","sf_dir":"$sfDir","n_vectors":$n,""" +
      s""""ivf_cells":$cells,"ivf_nprobe":$nprobe,"n_exact_pairs":$nPairs,""" +
      s""""recall_at_k":{"knn_ivf":${num(rIvf)},"knn_ivfpq":${num(rIvfPq)}},""" +
      s""""ivfpq_sweep":[${sweep.mkString(",")}],""" +
      s""""balance_mean_occ":$meanOcc,"balance_bands":{$balJson},"stages_sec":{""" +
      times.map { case (k, v) => s""""$k":${num(v)}""" }.mkString(",") +
      s"""},"total_sec":${num(times.values.sum)}}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    spark.stop()
  }
}
