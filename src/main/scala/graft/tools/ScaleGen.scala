package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the driver's testdata layout.
  *
  * Reads an existing sf directory (e.g. /root/testdata/sf0.1) and writes a
  * FACTOR× replica-with-key-offset scale-up (e.g. target/sf1): every fact
  * row is emitted FACTOR times with `key → key*FACTOR + copy` applied
  * uniformly to every key/FK column, so referential integrity, per-key
  * group sizes, and join fan-outs are preserved exactly while key-space
  * cardinality, row counts, and scan bytes grow FACTOR×. The fixed
  * dimensions (region, nation) are copied verbatim — their FKs
  * (c_nationkey, s_nationkey, n_regionkey) are left untouched.
  *
  * Text and vectors get a tiny deterministic per-copy perturbation
  * (a 3-char `c<copy> ` prefix on documents.text; +0.001*copy on one
  * vector component) so exact-hash dedup does not collapse the copies,
  * while near-dup/ANN structure scales realistically: each original doc
  * or vector becomes a FACTOR-sized near-dup cluster — exactly the
  * adversarial shape (bigger clusters, hotter LSH buckets) a 100 TB
  * corpus scale-up produces.
  *
  * No wall-clock or RNG anywhere: output is a pure function of the
  * input and FACTOR, so oracle replays (DuckDB over the same parquet)
  * are reproducible run-to-run.
  *
  * Usage: runMain graft.tools.ScaleGen <srcSfDir> <dstDir> [factor=10] [tables]
  * `tables` (optional, comma-separated) restricts output to a subset —
  * e.g. an embeddings-only ×10 step past sf10 to reach the adaptive
  * IVF chain's upper regimes without paying (or id-colliding on) the
  * full corpus.
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val only = args.lift(3).map(_.split(",").toSet).getOrElse(Set.empty[String])
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, factor, only)
    spark.stop()
  }

  /** Replicate `df` `factor`× with `copy` ∈ [0, factor) joined in. */
  private def fanOut(df: DataFrame, factor: Int): DataFrame =
    df.withColumn("copy", explode(lit((0 until factor).toArray)))

  /** How many quote-in-superset families [[containmentPlants]] adds. */
  val PlantFamilies = 8

  /** Scale-surviving containment plants: the replica fan-out multiplies
    * every shared shingle's document frequency by FACTOR, so by sf10 all
    * natural (and previously planted) co-occurring shingles blow through
    * dedup's df ≤ ShingleFreqCap=50 rarity window and
    * dedup_containment/dedup_ngram_jaccard return ~zero rows — the
    * detection direction those ops exist for goes unexercised at scale
    * (round-9 finding, SURVEY §12). The fix is unique-suffix salting:
    * each plant family's words carry the destination id base, so its
    * shingles are BORN at this scale step with df ∈ {2,3} and only the
    * NEXT step's ×FACTOR near-dup fan-out multiplies them (10×3 + the
    * corpus-expansion copies ≈ 36 < 50 — still inside the window).
    *
    * Family shape (8 families): an 8-word quote Q and two 28-word
    * supersets A = f0·Q·f1, B = f1·Q·f0 sharing fillers f0/f1. Rare
    * shingle sets (df ∈ [2, 50], so each doc's df-1 privates fall out):
    * Q = 6 (df 3: Q, A, B), A = B = 22 (6 quote + 2×8 filler interiors
    * at df 2 — the order-boundary shingles are df 1 and drop). So
    * (Q,A) and (Q,B) are TRUE containment pairs the symmetric
    * threshold misses — containment 6/6 = 1.0, jaccard 6/22 ≈ 0.27
    * < 0.35 — and (A,B) is a rare-space near-dup (containment 1.0,
    * jaccard ≥ 22/26: the private boundary shingles are df 1 and
    * invisible unless a Dedup.corpusOf %10/%17 copy of that doc
    * rescues them to df 2). Every derived quantity is deterministic,
    * so the DuckDB oracle recovers exactly the plants.
    *
    * Plant ids sit just past the scaled id space and must stay clear of
    * Dedup.corpusOf's +1M/+2M synthetic-copy offsets — the require
    * trips loudly at the scale step where that would break (~sf100)
    * rather than silently aliasing doc ids. */
  private[tools] def containmentPlants(spark: SparkSession, srcDocs: DataFrame,
      factor: Int): DataFrame = {
    import spark.implicits._
    val base = (srcDocs.agg(max(col("doc_id"))).head.getLong(0) + 1L) * factor
    require(base + 3L * PlantFamilies < 1000000L,
      s"plant ids from $base would collide with Dedup.corpusOf's +1M copy space")
    val rows = (0 until PlantFamilies).flatMap { i =>
      val q = (0 until 8).map(j => s"zq${base}f${i}w$j")
      val f0 = (0 until 10).map(j => s"zf${base}f${i}a$j")
      val f1 = (0 until 10).map(j => s"zf${base}f${i}b$j")
      def doc(id: Long, ws: Seq[String]) = {
        val text = ws.mkString(" ")
        (id, text, "en", "plant", text.length.toLong)
      }
      Seq(doc(base + 3L * i, q),
        doc(base + 3L * i + 1, f0 ++ q ++ f1),
        doc(base + 3L * i + 2, f1 ++ q ++ f0))
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** key*factor + copy — keeps keys unique and FK-consistent across all
    * tables (the same transform is applied to both sides of every FK). */
  private def scaleKey(name: String, factor: Int): Column =
    col(name) * factor + col("copy")

  def run(spark: SparkSession, src: String, dst: String, factor: Int,
          only: Set[String] = Set.empty): Unit = {
    def want(t: String) = only.isEmpty || only(t)
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: => DataFrame, t: String, files: Int): Unit =
      if (want(t)) df.repartition(files).write.mode(SaveMode.Overwrite)
        .parquet(s"$dst/$t.parquet")

    // Fixed dimensions: verbatim.
    write(read("region"), "region", 1)
    write(read("nation"), "nation", 1)

    write(fanOut(read("customer"), factor)
      .withColumn("c_custkey", scaleKey("c_custkey", factor))
      .drop("copy"), "customer", 8)

    write(fanOut(read("supplier"), factor)
      .withColumn("s_suppkey", scaleKey("s_suppkey", factor))
      .drop("copy"), "supplier", 4)

    write(fanOut(read("part"), factor)
      .withColumn("p_partkey", scaleKey("p_partkey", factor))
      .drop("copy"), "part", 8)

    write(fanOut(read("orders"), factor)
      .withColumn("o_orderkey", scaleKey("o_orderkey", factor))
      .withColumn("o_custkey", scaleKey("o_custkey", factor))
      .drop("copy"), "orders", 16)

    write(fanOut(read("lineitem"), factor)
      .withColumn("l_orderkey", scaleKey("l_orderkey", factor))
      .withColumn("l_partkey", scaleKey("l_partkey", factor))
      .withColumn("l_suppkey", scaleKey("l_suppkey", factor))
      .drop("copy"), "lineitem", 32)

    // Events: same timestamps per copy (FACTOR× traffic at the same
    // rate), distinct ids/users so sessions/funnels scale in user count
    // not in per-user depth. `ts` passes through in whatever parquet
    // encoding the source shipped.
    write(fanOut(read("events"), factor)
      .withColumn("event_id", scaleKey("event_id", factor))
      .withColumn("user_id", scaleKey("user_id", factor))
      .drop("copy"), "events", 16)

    // Documents: 3-char deterministic prefix on copies > 0 keeps exact
    // hashes distinct while leaving minhash/simhash similarity ≈ 1, so
    // every original doc becomes a FACTOR-sized near-dup cluster.
    val scaledDocs = fanOut(read("documents"), factor)
      .withColumn("doc_id", scaleKey("doc_id", factor))
      .withColumn("text",
        when(col("copy") === 0, col("text"))
          .otherwise(concat(lit("c"), col("copy").cast("string"), lit(" "),
            col("text"))))
      .withColumn("n_chars",
        when(col("copy") === 0, col("n_chars"))
          .otherwise(col("n_chars") + 3L))
      .drop("copy")
    write(scaledDocs.unionByName(
      containmentPlants(spark, read("documents"), factor)), "documents", 8)

    // Embeddings: nudge one component by 0.001*copy — vectors stay
    // near-identical (each original is a FACTOR-sized ANN twin set)
    // but never bit-equal across copies.
    write(fanOut(read("embeddings"), factor)
      .withColumn("vec_id", scaleKey("vec_id", factor))
      .withColumn("embedding", expr(
        """transform(embedding, (x, i) ->
          |  CAST(x + IF(i = copy % size(embedding),
          |              0.001D * copy, 0D) AS FLOAT))""".stripMargin))
      .withColumn("label", col("label"))
      .drop("copy"), "embeddings", 8)
  }
}
