package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, LongType}

/** Rank of `child` in a sorted literal boundary array: the number of
  * boundaries strictly below the value (a value equal to a boundary is
  * NOT counted, so it ranks with the lower side). This is the slice-id
  * function of the two-pass prefix discipline (graft.core.Prefix): the
  * boundary array comes from one driver-side approxQuantile pass and
  * the per-row lookup must be O(log B), not the O(B) chain of `when`
  * comparisons Catalyst would build from a fold — with `ranges` now
  * tracking `spark.sql.shuffle.partitions`, B is cluster-sized (10³),
  * not a constant 32.
  *
  * `bounds` must be sorted ascending and duplicate-free (binarySearch
  * precondition; Prefix dedups after the quantile pass). Evaluation is
  * a plain `java.util.Arrays.binarySearch` in both interpreted and
  * codegen paths, with the array shipped once per task as a codegen
  * reference object, never per row.
  *
  * Lives under org.apache.spark.sql because the Expression/codegen API
  * is package-private to Spark.
  */
case class SearchSortedDouble(child: Expression, bounds: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "search_sorted"

  override def nullSafeEval(a: Any): Any = {
    val idx = java.util.Arrays.binarySearch(bounds, a.asInstanceOf[Double])
    (if (idx >= 0) idx else -idx - 1).toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val arr = ctx.addReferenceObj("ssBounds", bounds, "double[]")
      val idx = ctx.freshName("idx")
      s"""
        |int $idx = java.util.Arrays.binarySearch($arr, $v);
        |${ev.value} = (long) ($idx >= 0 ? $idx : -$idx - 1);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SearchSortedExpressions {
  /** Column wrapper: number of `bounds` strictly below `key`. */
  def searchSorted(key: Column, bounds: Array[Double]): Column =
    ExpressionUtils.column(SearchSortedDouble(ExpressionUtils.expression(key), bounds))
}
