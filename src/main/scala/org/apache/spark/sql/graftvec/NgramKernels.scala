package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All adjacent word bigrams (" "-joined, duplicates preserved) as one
  * native kernel call:
  *
  *   word_bigrams(ws) = [ wsᵢ ++ " " ++ wsᵢ₊₁ | i <- 0..n-2 ]
  *
  * Exactly the `zip_with(slice(ws,1,n-1), slice(ws,2,n-1),
  * concat_ws(" "))` form text_ngram_topk used — but the HOF formulation
  * evaluates interpreted (one lambda dispatch per element, the slices
  * materialized separately, no common-subexpression elimination), while
  * this is one tight loop per row inside whole-stage codegen. Nulls are
  * skipped pairwise exactly as concat_ws skips null arguments; arrays
  * shorter than 2 yield an empty array (non-nullable output — explode
  * drops those rows, matching the old `filter(size(ws) >= 2)` guard). */
case class WordBigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_bigrams"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) NgramOps.empty else NgramOps.wordBigrams(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ops = "org.apache.spark.sql.graftvec.NgramOps$.MODULE$"
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $ops.empty() : $ops.wordBigrams(${c.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All adjacent character pairs of every word in a words array,
  * concatenated across words (duplicates preserved) — the BPE
  * pair-counting kernel's per-row stage:
  *
  *   char_pairs(ws) = [ w[i..i+1] | w <- ws, i <- 0..len(w)-2 ]
  *
  * Equivalent to exploding the words, splitting each into characters,
  * and zip_with-ing adjacent slices (text_bpe_pairs' original shape) —
  * but one kernel call per DOC replaces an explode row per word plus an
  * interpreted lambda per character. Character boundaries are Unicode
  * CODE POINTS (surrogate pairs stay whole — "a😀b" pairs as
  * ["a😀","😀b"], never a lone surrogate), matching DuckDB's
  * string_split(w, '') semantics; the kernel is registered as a general
  * SQL function, so this must hold beyond the ASCII corpus. Null words
  * are skipped; words shorter than 2 code points contribute nothing. */
case class CharPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "char_pairs"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) NgramOps.empty else NgramOps.charPairs(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ops = "org.apache.spark.sql.graftvec.NgramOps$.MODULE$"
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $ops.empty() : $ops.charPairs(${c.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fixed word-window "lines" of a words array — the line fan-out stage
  * of line-level dedup (text_line_dedup):
  *
  *   word_lines(ws, w) = [ " ".join(ws[i·w .. min((i+1)·w, n))) | i <- 0..⌈n/w⌉-1 ]
  *
  * Equivalent to `transform(sequence(0, nl-1), i -> array_join(
  * slice(ws, i*w+1, w), ' '))` — but that HOF chain evaluates
  * interpreted (a lambda dispatch per line, each slice materialized as
  * its own array) while this is one tight loop per row inside
  * whole-stage codegen. Nulls are skipped exactly as array_join skips
  * them; an empty array yields an empty result (non-nullable output —
  * explode drops those rows). `lineWords` is a plan-time literal. */
case class WordLines(child: Expression, lineWords: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(lineWords > 0, "word_lines: lineWords must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_lines"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) NgramOps.empty
    else NgramOps.wordLines(v.asInstanceOf[ArrayData], lineWords)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val ops = "org.apache.spark.sql.graftvec.NgramOps$.MODULE$"
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $ops.empty() : $ops.wordLines(${c.value}, $lineWords);
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row-level n-gram kernels (called from generated code). */
object NgramOps {
  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  def empty(): ArrayData = Empty

  def wordBigrams(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    if (n < 2) return Empty
    val out = new Array[AnyRef](n - 1)
    var i = 0
    while (i < n - 1) {
      val a = if (ws.isNullAt(i)) null else ws.getUTF8String(i)
      val b = if (ws.isNullAt(i + 1)) null else ws.getUTF8String(i + 1)
      out(i) = UTF8String.concatWs(Space, a, b)
      i += 1
    }
    new GenericArrayData(out)
  }

  def charPairs(ws: ArrayData): ArrayData = {
    val n = ws.numElements()
    if (n == 0) return Empty
    val out = new java.util.ArrayList[AnyRef](n * 4)
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        val s = ws.getUTF8String(i).toString
        // walk by code point: a pair spans two code points, so a
        // surrogate pair (one astral char, two UTF-16 units) is never
        // split into lone surrogates
        var j = 0
        while (j < s.length) {
          val next = s.offsetByCodePoints(j, 1)
          if (next < s.length) {
            val end = s.offsetByCodePoints(next, 1)
            out.add(UTF8String.fromString(s.substring(j, end)))
          }
          j = next
        }
      }
      i += 1
    }
    if (out.isEmpty) Empty else new GenericArrayData(out.toArray)
  }

  def wordLines(ws: ArrayData, w: Int): ArrayData = {
    val n = ws.numElements()
    if (n == 0) return Empty
    val nl = (n + w - 1) / w
    val out = new Array[AnyRef](nl)
    var i = 0
    while (i < nl) {
      val start = i * w
      val end = math.min(start + w, n)
      val parts = new Array[UTF8String](end - start)
      var j = start
      while (j < end) {
        parts(j - start) = if (ws.isNullAt(j)) null else ws.getUTF8String(j)
        j += 1
      }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Column-API surface for the n-gram kernels. */
object NgramExpressions {
  def wordBigrams(ws: Column): Column =
    ExpressionUtils.column(WordBigrams(ExpressionUtils.expression(ws)))

  def charPairs(ws: Column): Column =
    ExpressionUtils.column(CharPairs(ExpressionUtils.expression(ws)))

  def wordLines(ws: Column, lineWords: Int): Column =
    ExpressionUtils.column(WordLines(ExpressionUtils.expression(ws), lineWords))
}
