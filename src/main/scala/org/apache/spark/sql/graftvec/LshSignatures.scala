package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** All `tables` random-hyperplane LSH signatures of a vector in ONE
  * expression node:
  *
  *   sig(t) = Σ_k  [ qdot(v, plane(t·bits+k)) > 0 ] · 2^k
  *
  * Bit-for-bit the signature the composed form produces — `bits` qdot
  * columns per table, `when(qdot > 0, 1<<k)` summed — but the composed
  * plan carries tables·bits literal-array dot-product subtrees
  * (16·6 = 96 trees of ~64 nodes each), which Catalyst re-analyzes on
  * every query run; measured, that planning overhead dominated knn_lsh.
  * Here the plane matrix is a constructor-computed `double[]` referenced
  * from generated code, and the whole signature family is one tight
  * nested loop inside whole-stage codegen.
  *
  * Planes are deterministic Rademacher ±1 signs from a split-mix of the
  * (plane, dim) index — reproducible across runs with no RNG state.
  *
  * Lives under org.apache.spark.sql because the Expression/codegen API
  * is package-private to Spark — the conventional placement for
  * Spark-native extension libraries.
  */
case class LshSignatures(child: Expression, tables: Int, bits: Int, dim: Int,
    stride: Int = -1)
    extends UnaryExpression with ExpectsInputTypes {

  // Plane-family stride: table t's bit k uses plane (t*S + k). With
  // S > bits (the adaptive-width path) the computed b-bit signature is
  // bit-for-bit the low-b-bit mask of the full S-bit signature — the
  // oracle replays the full width and masks, the kernel computes only
  // the b planes that survive the mask.
  private val S: Int = math.max(bits, stride)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_sigs"

  // plane (t*S + k) lives at offset (t*S + k)*dim, row-major
  private lazy val planes: Array[Double] = LshSignatures.planes(tables * S, dim)

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val sigs = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var k = 0
      while (k < bits) {
        val off = (t * S + k) * dim
        var acc = 0L
        var i = 0
        while (i < n) {
          if (!v.isNullAt(i)) {
            acc += math.floor(v.getDouble(i) * planes(off + i) * 1e9 + 0.5).toLong
          }
          i += 1
        }
        if (acc > 0L) sig |= (1 << k)
        k += 1
      }
      sigs(t) = sig
      t += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pl = ctx.addReferenceObj("planes", planes, "double[]")
      val n = ctx.freshName("n")
      val sigs = ctx.freshName("sigs")
      val t = ctx.freshName("t")
      val k = ctx.freshName("k")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val sig = ctx.freshName("sig")
      s"""
        |int $n = java.lang.Math.min($v.numElements(), $dim);
        |int[] $sigs = new int[$tables];
        |for (int $t = 0; $t < $tables; $t++) {
        |  int $sig = 0;
        |  for (int $k = 0; $k < $bits; $k++) {
        |    int $off = ($t * $S + $k) * $dim;
        |    long $acc = 0L;
        |    for (int $i = 0; $i < $n; $i++) {
        |      if (!$v.isNullAt($i)) {
        |        $acc += (long) java.lang.Math.floor(
        |          $v.getDouble($i) * $pl[$off + $i] * 1.0E9 + 0.5);
        |      }
        |    }
        |    if ($acc > 0L) $sig |= (1 << $k);
        |  }
        |  $sigs[$t] = $sig;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignatures {
  /** Deterministic Rademacher sign for (plane p, dim i): split-mix of
    * p·64 + i (the same mixing constant family as splitmix64). */
  def planeSign(p: Int, i: Int): Double = {
    var x = p.toLong * 64 + i + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    if (((x ^ (x >>> 31)) & 1L) == 0L) 1.0 else -1.0
  }

  def planes(nPlanes: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](nPlanes * dim)
    var p = 0
    while (p < nPlanes) {
      var i = 0
      while (i < dim) { out(p * dim + i) = planeSign(p, i); i += 1 }
      p += 1
    }
    out
  }
}
