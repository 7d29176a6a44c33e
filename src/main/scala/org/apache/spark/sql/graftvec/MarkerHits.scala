package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence counts of a words array against K marker sets in ONE
  * pass, as a native kernel:
  *
  *   marker_hits(ws, [S₁..S_K]) = [ |{i : wsᵢ ∈ S₁}| , … ]
  *
  * Exactly the `size(filter(ws, w -> w.isin(S)))` form — counts, not
  * distinct; null words never match — but that HOF evaluates
  * interpreted (a lambda dispatch per element per set, and the words
  * split recomputed for every set since HOFs get no common-
  * subexpression elimination). text_langid probes three language
  * marker sets per doc: one kernel call replaces three interpreted
  * filters over three re-splits. */
case class MarkerHits(child: Expression, markerSets: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "marker_hits"

  @transient private lazy val holder = new MarkerSetsHolder(
    markerSets.map(_.toArray).toArray)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) holder.zeros else holder.count(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val h = ctx.addReferenceObj("markerSets", holder,
      classOf[MarkerSetsHolder].getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${c.isNull} ? $h.zeros() : $h.count(${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row-level marker-count kernel (referenced from generated code). */
class MarkerSetsHolder(markerSets: Array[Array[String]]) extends Serializable {

  @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
    markerSets.map { ms =>
      val s = new java.util.HashSet[UTF8String](ms.length * 2)
      ms.foreach(m => s.add(UTF8String.fromString(m)))
      s
    }

  def zeros(): ArrayData =
    new GenericArrayData(Array.fill[Any](markerSets.length)(0))

  def count(ws: ArrayData): ArrayData = {
    val k = sets.length
    val counts = new Array[Int](k)
    val n = ws.numElements()
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        val w = ws.getUTF8String(i)
        var j = 0
        while (j < k) {
          if (sets(j).contains(w)) counts(j) += 1
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(counts.map(Integer.valueOf).asInstanceOf[Array[Any]])
  }
}

object MarkerHitsExpressions {
  def markerHits(ws: Column, markerSets: Seq[Seq[String]]): Column =
    ExpressionUtils.column(MarkerHits(ExpressionUtils.expression(ws), markerSets))
}
