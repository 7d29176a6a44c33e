package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Quantized dot product as a native Catalyst expression:
  *
  *   qdot(a, b) = Σᵢ floor(aᵢ·bᵢ·1e9 + 0.5)  (exact long)
  *
  * The hot inner loop of every cosine in the similarity family
  * (dedup_embedding / knn_brute / knn_lsh re-rank): per-element products
  * quantized to a 1e-9 grid and summed as exact longs, so the result is
  * bit-identical across engines and summation orders (the determinism
  * contract of SURVEY.md §6).
  *
  * A higher-order-function formulation (`aggregate(zip_with(...))`)
  * computes the same value but evaluates interpreted, one lambda call
  * per element; this expression generates a tight Java loop inside
  * whole-stage codegen (`doGenCode`) — the (b) tier of the
  * custom-operator preference order (custom Expression before
  * mapPartitions).
  *
  * Lives under org.apache.spark.sql because the Expression/codegen API
  * is package-private to Spark — the conventional placement for
  * Spark-native extension libraries.
  *
  * Null elements contribute 0; a null array yields null.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "qdot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += math.floor(x.getDouble(i) * y.getDouble(i) * 1e9 + 0.5).toLong
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |long $acc = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
        |    $acc += (long) java.lang.Math.floor(
        |      $a.getDouble($i) * $b.getDouble($i) * 1.0E9 + 0.5);
        |  }
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Exact dot product of two long arrays:
  *
  *   ldot(a, b) = Σᵢ aᵢ·bᵢ  (raw long arithmetic: overflow WRAPS, unlike
  *   the ANSI `element_at(a,i) * element_at(b,i)` sum it replaced, which
  *   would throw on long overflow; null ELEMENTS are skipped as 0 where
  *   the ANSI sum would propagate NULL. Callers must verify their value
  *   ranges keep every partial sum inside a long — the rp projections
  *   are |x| ≤ RpScale-bounded 16-element arrays, far inside the bound.)
  *
  * Added for embed_rp_distortion: its 16-element unrolled
  * element_at-product forest, combined with the post-join qdot tree in
  * ONE fused whole-stage-codegen stage, pushed the generated consume
  * method past the code-splitting threshold and the stage ran 9×
  * slower than interpreted eval (measured: 6.8 s vs the ablated
  * pieces' 0.4 + 2.4 s at sf0.1). One compact generated loop keeps the
  * fused stage small. Null elements contribute 0; a null array yields
  * null — the same contract as [[QuantizedDot]].
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ldot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        acc += x.getLong(i) * y.getLong(i)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |long $acc = 0L;
        |for (int $i = 0; $i < $n; $i++) {
        |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
        |    $acc += $a.getLong($i) * $b.getLong($i);
        |  }
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API surface for the graft vector expressions. */
object VectorExpressions {
  def qdot(a: Column, b: Column): Column =
    ExpressionUtils.column(QuantizedDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def ldot(a: Column, b: Column): Column =
    ExpressionUtils.column(LongDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def lshSigs(v: Column, tables: Int, bits: Int, dim: Int): Column =
    ExpressionUtils.column(LshSignatures(
      ExpressionUtils.expression(v), tables, bits, dim))

  def lshSigs(v: Column, tables: Int, bits: Int, dim: Int, stride: Int): Column =
    ExpressionUtils.column(LshSignatures(
      ExpressionUtils.expression(v), tables, bits, dim, stride))

  def polyHash(s: Column): Column =
    ExpressionUtils.column(PolyHash(ExpressionUtils.expression(s)))
}
