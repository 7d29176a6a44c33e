package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** All `subs` PQ codes of a vector in ONE expression node: for each
  * subspace m, the index (slot) of the codebook entry minimizing the
  * exact quantized squared L2
  *
  *   d2(m, c) = snrm(m) + cnrm(m, c) − 2·qdot(sv_m, cv_{m,c})
  *
  * where qdot is the 1e-9-grid quantized dot (Σ floor(aᵢ·bᵢ·1e9 + 0.5)
  * as exact longs — the QuantizedDot contract), snrm/cnrm the same
  * quantization of the self-dots, and ties break toward the LOWEST slot
  * — bit-for-bit the argmin the declarative form computes with
  * `min(struct(d2, cent_id))` over a codebook join.
  *
  * The codebook ships as a constructor array (slot-major within
  * subspace: entry (m, c) at offset (m·cents + c)·dim), exactly how a
  * production PQ index distributes its offline-trained codebook to
  * scan workers; cnrm is precomputed once per expression instance. The
  * declarative equivalent materializes an N×subs×cents join through
  * broadcast-hash-join + hash-aggregate machinery — same arithmetic,
  * ~15 ns/row of operator overhead on 410 M rows at the sf10
  * spot-bench; here the whole encode is one tight generated loop
  * inside whole-stage codegen.
  *
  * Lives under org.apache.spark.sql because the Expression/codegen API
  * is package-private to Spark — the conventional placement for
  * Spark-native extension libraries.
  */
case class PqCodes(child: Expression, codebook: Array[Double],
    subs: Int, cents: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_codes"

  // cnrm(m, c) = qdot(cv, cv), exact quantized self-dot per codebook entry
  private lazy val cnrm: Array[Long] = {
    val out = new Array[Long](subs * cents)
    var mc = 0
    while (mc < subs * cents) {
      var acc = 0L
      var d = 0
      while (d < dim) {
        val x = codebook(mc * dim + d)
        acc += math.floor(x * x * 1e9 + 0.5).toLong
        d += 1
      }
      out(mc) = acc
      mc += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    // Like QuantizedDot/LshSignatures: positions past the vector's actual
    // length read as 0 instead of reading past the array.
    val n = v.numElements()
    val codes = new Array[Int](subs)
    var m = 0
    while (m < subs) {
      var snrm = 0L
      var d = 0
      while (d < dim) {
        val idx = m * dim + d
        val x = if (idx >= n || v.isNullAt(idx)) 0d else v.getDouble(idx)
        snrm += math.floor(x * x * 1e9 + 0.5).toLong
        d += 1
      }
      var best = Long.MaxValue
      var bestC = 0
      var c = 0
      while (c < cents) {
        val off = (m * cents + c) * dim
        var dot = 0L
        var i = 0
        while (i < dim) {
          val idx = m * dim + i
          val x = if (idx >= n || v.isNullAt(idx)) 0d else v.getDouble(idx)
          dot += math.floor(x * codebook(off + i) * 1e9 + 0.5).toLong
          i += 1
        }
        val d2 = snrm + cnrm(m * cents + c) - 2L * dot
        if (d2 < best) { best = d2; bestC = c }
        c += 1
      }
      codes(m) = bestC
      m += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("codebook", codebook, "double[]")
      val cnRef = ctx.addReferenceObj("cnrm", cnrm, "long[]")
      val codes = ctx.freshName("codes")
      val m = ctx.freshName("m")
      val snrm = ctx.freshName("snrm")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val d2 = ctx.freshName("d2")
      val n = ctx.freshName("n")
      s"""
        |int[] $codes = new int[$subs];
        |int $n = $v.numElements();
        |for (int $m = 0; $m < $subs; $m++) {
        |  long $snrm = 0L;
        |  for (int $d = 0; $d < $dim; $d++) {
        |    double $x = ($m * $dim + $d >= $n || $v.isNullAt($m * $dim + $d)) ? 0.0 : $v.getDouble($m * $dim + $d);
        |    $snrm += (long) java.lang.Math.floor($x * $x * 1.0E9 + 0.5);
        |  }
        |  long $best = Long.MAX_VALUE;
        |  int $bestC = 0;
        |  for (int $c = 0; $c < $cents; $c++) {
        |    int $off = ($m * $cents + $c) * $dim;
        |    long $dot = 0L;
        |    for (int $i = 0; $i < $dim; $i++) {
        |      double $x = ($m * $dim + $i >= $n || $v.isNullAt($m * $dim + $i)) ? 0.0 : $v.getDouble($m * $dim + $i);
        |      $dot += (long) java.lang.Math.floor($x * $cbRef[$off + $i] * 1.0E9 + 0.5);
        |    }
        |    long $d2 = $snrm + $cnRef[$m * $cents + $c] - 2L * $dot;
        |    if ($d2 < $best) { $best = $d2; $bestC = $c; }
        |  }
        |  $codes[$m] = $bestC;
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqCodes {
  def pqCodes(v: Column, codebook: Array[Double], subs: Int, cents: Int, dim: Int): Column =
    ExpressionUtils.column(PqCodes(ExpressionUtils.expression(v), codebook, subs, cents, dim))
}
