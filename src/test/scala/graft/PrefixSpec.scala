package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Prefix

/** Prefix (two-pass distributed running computations) vs the
  * single-partition window ground truth it replaces. */
class PrefixSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random rows: (group, id, value)
  private lazy val rows = (1 to 4001).map { i =>
    val h = (i * 2654435761L) % 1000000007L
    (s"g${h % 7}", i.toLong, (h % 100L) - 50L)
  }
  private lazy val df = rows.toDF("g", "id", "v")

  test("runningSum grouped ≡ per-group window cumsum") {
    val got = Prefix.runningSum(df, Seq("g"), Seq(col("id")), col("v"), "cum", ranges = 16)
      .orderBy("g", "id").select("g", "id", "cum").collect()
    val w = Window.partitionBy("g").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .orderBy("g", "id").select("g", "id", "cum").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("runningSum global with mixed-direction order ≡ global window cumsum") {
    val ord = Seq(col("v").desc, col("id"))
    // the primary order is DESC, so the ascending-monotone slice key is
    // its negation
    val got = Prefix.runningSum(df, Seq.empty, ord, col("v"), "cum", ranges = 16,
        sliceKey = Some(-col("v")))
      .orderBy(col("v").desc, col("id")).select("id", "cum").collect()
    val w = Window.orderBy(col("v").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .orderBy(col("v").desc, col("id")).select("id", "cum").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("runningSum degenerate slice key: constant key collapses to one slice, still exact") {
    // all boundaries equal → dedupe to one value → every row compares
    // <= boundary → slice 0 holds everything; ordering falls back to
    // the secondary key and the result must still be exact
    val const = (1 to 500).map(i => (1L, i.toLong, (i % 13).toLong)).toDF("k", "id", "v")
    val got = Prefix.runningSum(const, Seq.empty, Seq(col("k"), col("id")), col("v"),
        "cum", ranges = 8, sliceKey = Some(col("k")))
      .orderBy("id").select("id", "cum").collect()
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = const.withColumn("cum", sum(col("v")).over(w))
      .orderBy("id").select("id", "cum").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("runningSum with nullable values ≡ window semantics (null until first non-null)") {
    // window sum skips nulls but stays null until the first non-null —
    // including across slice boundaries (a leading slice of only nulls
    // must not turn the next slice's prefix into 0)
    val nv = (1 to 400).map { i =>
      (i.toLong, if (i <= 50 || i % 3 == 0) None else Some(i.toLong))
    }.toDF("id", "v")
    val got = Prefix.runningSum(nv, Seq.empty, Seq(col("id")), col("v"), "cum", ranges = 8)
      .orderBy("id").select("id", "cum").collect()
    val w = Window.orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = nv.withColumn("cum", sum(col("v")).over(w))
      .orderBy("id").select("id", "cum").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("lag1 ≡ global-order lag, robust to empty range slices") {
    // 10 rows over 64 requested ranges: most slices are empty, so the
    // boundary handoff must skip over them
    val tiny = (1 to 10).map(i => i * 7L).toDF("id")
    val got = Prefix.lag1(tiny, "id", "prev", ranges = 64)
      .orderBy("id").select("id", "prev").collect()
    val want = tiny.withColumn("prev", lag(col("id"), 1).over(Window.orderBy("id")))
      .orderBy("id").select("id", "prev").collect()
    assert(got.toSeq === want.toSeq)
    val big = Prefix.lag1(df.select(col("id")), "id", "prev", ranges = 8)
      .orderBy("id").select("prev").collect()
    val bigWant = df.select(col("id"))
      .withColumn("prev", lag(col("id"), 1).over(Window.orderBy("id")))
      .orderBy("id").select("prev").collect()
    assert(big.toSeq === bigWant.toSeq)
  }
}
