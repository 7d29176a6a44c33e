package graft.tools

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.CdcStream

/** Crash-recovery AT SCALE (the round-9 directive's last failure-path
  * gap): RecoverySpec proves kill/restart ≡ uninterrupted at test SF;
  * this tool replays the heaviest RocksDB-backed stateful op —
  * stream_near_dedup's band-bucket index, millions of live state keys
  * at sf1 — kills it in the worst-case window (batch output durable,
  * offset NOT committed), restarts from the same checkpoint, and
  * proves the recovered confirmed-pair set equals the uninterrupted
  * run's, row-hash-exact.
  *
  * Mechanics mirror RecoverySpec #1 (the lake sink's discipline):
  *  - the sf1 documents table is staged one part-file per micro-batch
  *    (maxFilesPerTrigger=1, 8 batches), so near-dup cluster members
  *    genuinely span the crash boundary — post-crash arrivals must
  *    find pre-crash bucket members in RECOVERED RocksDB state to emit
  *    their pairs;
  *  - the sink is an idempotent per-batch partition overwrite
  *    (out/batch=<id>), so the retried batch rewrites identical rows;
  *  - the crash is injected AFTER the batch's sink write, BEFORE its
  *    offset commit — the window where at-least-once retry happens and
  *    where the round-8 versioned-digest bug hid.
  *
  * The pair streams are confirmed exactly as streamNearDedup does
  * (≥ 2 shared bands) and compared as (row count, sum of row hashes) —
  * order-invariant and cell-exact.
  *
  * Writes one JSON line to RECOVERY_SF1.json (or argv(1)).
  *
  * Usage: runMain graft.tools.RecoveryScale [sfDir=target/sf1] [out=RECOVERY_SF1.json]
  */
object RecoveryScale {

  /** Stage a parquet table's part files as a flat dir of symlinks
    * (same discipline as CdcStream.replay — the file stream source
    * does not descend into directory tables). */
  private val stagedDirs = scala.collection.mutable.ArrayBuffer[String]()

  private def stageParts(dir: String, table: String): String = {
    val stage = java.nio.file.Files.createTempDirectory("graft-recovery-stage")
    stagedDirs += stage.toString
    val src = java.nio.file.Paths.get(s"$dir/$table.parquet").toAbsolutePath
    // listFiles (not Files.list — no stream handle to leak), sorted by
    // name so the part-to-batch mapping is deterministic regardless of
    // filesystem listing order.
    val parts = Option(src.toFile.listFiles())
      .getOrElse(sys.error(s"no parquet dir at $src"))
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
    parts.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.createSymbolicLink(
        stage.resolve(f"part-$i%05d.parquet"), f.toPath.toAbsolutePath)
    }
    stage.toString
  }

  /** One stream_near_dedup candidate run: file-per-batch source →
    * nearDupBandHits (flatMapGroupsWithState over RocksDB) →
    * idempotent per-batch overwrite sink. `crashOn` fires after the
    * sink write, before the offset commit. Returns batch ids run. */
  private def runCandidates(spark: SparkSession, stage: String, outDir: String,
      ck: String, crashOn: Long => Unit): Seq[Long] = {
    val ran = scala.collection.mutable.ArrayBuffer[Long]()
    val schema = spark.read.parquet(stage).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
    val q = CdcStream.nearDupBandHits(spark)(stream)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ran.synchronized { ran += batchId }
        crashOn(batchId)
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    ran.toSeq
  }

  /** The streamNearDedup confirm rule over a sink dir (count ≡
    * distinct bands: one emission per shared band, idempotent sink). */
  private def confirmed(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .filter(col("n_shared_bands") >= 2)

  /** Order-invariant cell-exact digest: (rows, sum of row hashes mod P).
    * The mod-P fold (rowDigest discipline) keeps the sum inside a long
    * under ANSI arithmetic — a raw sum of full-range xxhash64 values
    * overflows after a handful of rows (found by this tool's first sf1
    * run: ARITHMETIC_OVERFLOW in the final-compare aggregate). */
  private def digest(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)),
      coalesce(sum(pmod(
        xxhash64(col("doc_a"), col("doc_b"), col("n_shared_bands")),
        lit(1000000007L))), lit(0L)))
      .head()
    (r.getLong(0), r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("target/sf1")
    val out = args.lift(1).getOrElse("RECOVERY_SF1.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stage = stageParts(sfDir, "documents")
    val nBatches = new java.io.File(stage).listFiles()
      .count(_.getName.endsWith(".parquet"))
    require(nBatches >= 2,
      s"need >= 2 staged batches for a mid-stream crash, got $nBatches")
    val crashAt = nBatches / 2L
    // every scratch dir is deleted after the artifact is written — the
    // HubScale/StateSoak round-13 residue discipline
    val scratch = scala.collection.mutable.ArrayBuffer[String]()
    def tmp(p: String) = {
      val d = java.nio.file.Files.createTempDirectory(p).toString
      scratch += d; d
    }

    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      times(name) = (System.nanoTime() - t0) / 1e9
      r
    }

    // run A: uninterrupted reference
    val outA = tmp("graft-rscale-A") + "/out"
    timed("uninterrupted_run")(
      runCandidates(spark, stage, outA, tmp("graft-rscale-ckA"), _ => ()))

    // run B: killed in the worst-case window of the middle batch
    val outB = tmp("graft-rscale-B") + "/out"
    val ckB = tmp("graft-rscale-ckB")
    // Only the INJECTED crash counts: an unrelated streaming failure
    // (source error, config problem) must propagate, not be silently
    // accepted as the kill we meant to test recovery from.
    // depth-capped cause walk (no unbounded recursion on a pathological
    // self-referential cause chain).
    def isInjected(t: Throwable): Boolean =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(20)
        .exists(c => Option(c.getMessage).exists(_.contains("injected crash")))
    val crashed =
      try {
        timed("crashed_run")(
          runCandidates(spark, stage, outB, ckB,
            bid => if (bid == crashAt)
              sys.error(s"injected crash: batch $bid output durable, offset uncommitted")))
        false
      } catch {
        case e: Exception if isInjected(e) => true
      }
    require(crashed, "the injected crash must have fired")

    // restart from the same checkpoint: committed batches must not
    // reprocess; the uncommitted batch retries; post-crash arrivals
    // must see pre-crash bucket members from recovered RocksDB state
    val resumed = timed("recovered_run")(
      runCandidates(spark, stage, outB, ckB, _ => ()))
    require(!resumed.contains(0L),
      s"restart must resume, not reprocess committed batch 0 (ran: $resumed)")
    require(resumed.contains(crashAt),
      s"the uncommitted batch $crashAt must be retried (ran: $resumed)")

    val (rowsA, hashA) = timed("confirm_digest_a")(digest(confirmed(spark, outA)))
    val (rowsB, hashB) = timed("confirm_digest_b")(digest(confirmed(spark, outB)))
    require(rowsA > 0, "the sf1 replay must produce confirmed pairs")
    require(rowsA == rowsB && hashA == hashB,
      s"recovered pair set must equal uninterrupted: A=($rowsA,$hashA) B=($rowsB,$hashB)")

    def num(v: Double) = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    val json =
      s"""{"recovery":"stream_near_dedup_sf1","batches":$nBatches,""" +
      s""""crash_after_batch":$crashAt,"resumed_batches":[${resumed.mkString(",")}],""" +
      s""""confirmed_pairs":$rowsA,"pair_hash_match":true,"stages_sec":{""" +
      times.map { case (k, v) => s""""$k":${num(v)}""" }.mkString(",") +
      s"""},"total_sec":${num(times.values.sum)}}"""
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    (scratch ++ stagedDirs).foreach { d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
    }
    spark.stop()
  }
}
