package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-3-gram shingles as a native expression:
  *
  *   shingles3(ws) = array_distinct([ wsᵢ ++ "_" ++ wsᵢ₊₁ ++ "_" ++ wsᵢ₊₂ ])
  *
  * Exactly equivalent to the declarative form used by the dedup family
  * (`array_distinct(transform(sequence(0, n-3), i -> concat_ws("_", ...)))`
  * in TextFunctions.shingles3FromWords, and the DuckDB oracle's
  * list_transform/DISTINCT) — but the higher-order-function formulation
  * evaluates interpreted, one lambda dispatch per element with the words
  * array re-read each time. This expression runs one tight helper call
  * per row inside whole-stage codegen — the hot first stage of
  * dedup_ngram_jaccard / dedup_minhash / dedup_clusters / dedup_canonical.
  *
  * Null or shorter-than-3 input yields an EMPTY array (matching the
  * `when(size(ws) >= 3, ...).otherwise(array())` contract), so the
  * expression is non-nullable.
  */
case class Shingles3(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "shingles3"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleOps.empty else ShingleOps.compute(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ops = "org.apache.spark.sql.graftvec.ShingleOps$.MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $ops.empty() : $ops.compute(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word-3-gram shingles as their portable polyhash (see
  * PolyHash): hash of the bytes of `wsᵢ ++ "_" ++ wsᵢ₊₁ ++ "_" ++
  * wsᵢ₊₂`, computed incrementally — the shingle STRING is never
  * materialized (the concat + UTF8String allocation was the dominant
  * per-row cost of the string form when the consumer only needs a join
  * key). Distinctness is by hash; the DuckDB oracle mirrors with
  * `SELECT DISTINCT doc_id, polyhash(shingle)`, so an intra-doc hash
  * collision merges the same pair of shingles on both sides.
  * Null words are skipped exactly as concat_ws skips null arguments. */
case class Shingles3Hashed(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "shingles3_hashed"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleOps.empty else ShingleOps.computeHashed(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ops = "org.apache.spark.sql.graftvec.ShingleOps$.MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $ops.empty() : $ops.computeHashed(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row-level shingle kernel (called from generated code). */
object ShingleOps {
  private val Sep = UTF8String.fromString("_")
  private val Empty = new GenericArrayData(Array.empty[Any])

  def empty(): ArrayData = Empty

  /** Distinct 3-gram shingles in first-occurrence order (array_distinct
    * semantics); null words are skipped inside a shingle exactly as
    * concat_ws skips null arguments. Element reads are isNullAt-guarded:
    * columnar-backed arrays (ColumnarArray) return UNDEFINED values for
    * null slots if read without the guard. */
  def compute(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    if (n < 3) return Empty
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(4, n))
    var i = 0
    while (i <= n - 3) {
      val a = if (ws.isNullAt(i)) null else ws.getUTF8String(i)
      val b = if (ws.isNullAt(i + 1)) null else ws.getUTF8String(i + 1)
      val c = if (ws.isNullAt(i + 2)) null else ws.getUTF8String(i + 2)
      seen.add(UTF8String.concatWs(Sep, a, b, c))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  private final val M = 1000000007L
  private final val B = 131L

  /** Fold `word`'s bytes into a running polyhash. */
  private def hashWord(acc0: Long, w: UTF8String): Long = {
    val bytes = w.getBytes
    var acc = acc0
    var i = 0
    while (i < bytes.length) {
      acc = (acc * B + (bytes(i) & 0xFF)) % M
      i += 1
    }
    acc
  }

  /** Distinct polyhashes of the 3-gram shingles (hash of the exact bytes
    * the string form would concat — '_'-joined non-null words). */
  def computeHashed(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    if (n < 3) return Empty
    val seen = new java.util.LinkedHashSet[java.lang.Long](math.max(4, n))
    var i = 0
    while (i <= n - 3) {
      var acc = 0L
      var emitted = false
      var k = 0
      while (k < 3) {
        if (!ws.isNullAt(i + k)) {
          if (emitted) acc = (acc * B + '_') % M
          acc = hashWord(acc, ws.getUTF8String(i + k))
          emitted = true
        }
        k += 1
      }
      seen.add(acc)
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Positional (non-distinct) polyhashes of every k-gram window in
    * start-position order — the exact-substring dedup carrier: a
    * position's k-window hash having corpus frequency ≥ 2 certifies a
    * WHOLE duplicated k-word substring (unlike a chain of duplicated
    * 3-shingles, which certifies only its 3-word pieces). O(n·k) byte
    * hashing; '_'-joined with null words skipped, matching concat_ws. */
  def computeHashedSeqK(ws: ArrayData, kk: Int): ArrayData = {
    val n = ws.numElements()
    if (n < kk) return Empty
    val out = new Array[Any](n - kk + 1)
    var i = 0
    while (i <= n - kk) {
      var acc = 0L
      var emitted = false
      var j = 0
      while (j < kk) {
        if (!ws.isNullAt(i + j)) {
          if (emitted) acc = (acc * B + '_') % M
          acc = hashWord(acc, ws.getUTF8String(i + j))
          emitted = true
        }
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Positional (non-distinct) polyhashes: hash of every 3-gram shingle
    * in start-position order. */
  def computeHashedSeq(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    if (n < 3) return Empty
    val out = new Array[Any](n - 2)
    var i = 0
    while (i <= n - 3) {
      var acc = 0L
      var emitted = false
      var k = 0
      while (k < 3) {
        if (!ws.isNullAt(i + k)) {
          if (emitted) acc = (acc * B + '_') % M
          acc = hashWord(acc, ws.getUTF8String(i + k))
          emitted = true
        }
        k += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** POSITIONAL polyhashes of the 3-gram shingles: one hash per shingle
  * start position, duplicates KEPT in order (unlike Shingles3Hashed's
  * distinct set) — posexplode over the result yields (position, hash)
  * pairs, the input the duplicated-SPAN detector needs (runs of
  * consecutive duplicated shingles locate copied substrings, which a
  * distinct set cannot). Same incremental byte hashing, same null-word
  * skipping as the distinct kernel. */
case class Shingles3HashedSeq(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "shingles3_hashed_seq"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleOps.empty else ShingleOps.computeHashedSeq(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ops = "org.apache.spark.sql.graftvec.ShingleOps$.MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $ops.empty() : $ops.computeHashedSeq(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** POSITIONAL polyhashes of the k-gram windows, duplicates kept in
  * order — Shingles3HashedSeq generalized to window width `k`. A
  * position whose k-window hash is duplicated corpus-wide sits inside
  * an EXACT duplicated substring of ≥ k words, so maximal runs of such
  * positions are precisely the union of all duplicated ≥k-word
  * substrings (the Lee-et-al ExactSubstr removal set at threshold k —
  * see Dedup.dupSpansExactOf). `k` must be a literal; same byte
  * hashing and null-word skipping as the 3-gram kernels. */
case class ShinglesKHashedSeq(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1, s"window width must be positive, got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.LongType,
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "shingles_k_hashed_seq"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleOps.empty
    else ShingleOps.computeHashedSeqK(v.asInstanceOf[ArrayData], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ops = "org.apache.spark.sql.graftvec.ShingleOps$.MODULE$"
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $ops.empty() : $ops.computeHashedSeqK(${c.value}, $k);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-API surface for the graft text expressions. */
object StringExpressions {
  def shingles3(ws: Column): Column =
    ExpressionUtils.column(Shingles3(ExpressionUtils.expression(ws)))

  def shingles3Hashed(ws: Column): Column =
    ExpressionUtils.column(Shingles3Hashed(ExpressionUtils.expression(ws)))

  def shingles3HashedSeq(ws: Column): Column =
    ExpressionUtils.column(Shingles3HashedSeq(ExpressionUtils.expression(ws)))

  def shinglesKHashedSeq(ws: Column, k: Int): Column =
    ExpressionUtils.column(ShinglesKHashedSeq(ExpressionUtils.expression(ws), k))
}
