package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** The top-`n` IVF coarse-quantizer cells of a vector in ONE expression
  * node: the `cent_ids` of the `n` roster centroids maximizing the exact
  * quantized cosine
  *
  *   cos(v, c) = qdot(v, c) / sqrt(qdot(v, v) · qdot(c, c))
  *
  * where qdot is the 1e-9-grid quantized dot (Σ floor(aᵢ·bᵢ·1e9 + 0.5)
  * as exact longs — the QuantizedDot contract) and the final divide/sqrt
  * are single IEEE ops. Ordering is cosine DESC with ties toward the
  * LOWEST cent_id, compared with java.lang.Double semantics (NaN sorts
  * greatest, −0.0 < 0.0) — bit-for-bit the
  * `ROW_NUMBER() OVER (ORDER BY cent_cos DESC, cent_id) <= n` the
  * declarative crossJoin+window form computes, and what the DuckDB
  * oracle replays.
  *
  * The centroid roster ships as constructor arrays (cent_ids ascending;
  * vectors flattened centroid-major), exactly how a production IVF index
  * distributes its offline-trained coarse quantizer to scan workers;
  * centroid self-norms are precomputed once per expression instance.
  * The declarative equivalent materializes an N×C crossJoin and sorts C
  * rows per vector under a partitionBy(vec_id) window — a shuffle of the
  * whole assignment matrix that grows with the (now corpus-adaptive)
  * cell count; here assignment is one tight generated loop inside
  * whole-stage codegen and the corpus is never shuffled at all.
  *
  * Lives under org.apache.spark.sql because the Expression/codegen API
  * is package-private to Spark — the conventional placement for
  * Spark-native extension libraries.
  */
case class IvfAssign(child: Expression, cents: Array[Double],
    centIds: Array[Long], n: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(centIds.nonEmpty && cents.length == centIds.length * dim,
    s"roster shape mismatch: ${cents.length} doubles for ${centIds.length} ids × $dim dims")
  require(n >= 1, s"need n >= 1 probes, got $n")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ivf_assign"

  // cn(c) = qdot(cv, cv), exact quantized self-dot per roster centroid
  private lazy val cn: Array[Long] = {
    val out = new Array[Long](centIds.length)
    var c = 0
    while (c < centIds.length) {
      var acc = 0L
      var d = 0
      while (d < dim) {
        val x = cents(c * dim + d)
        acc += math.floor(x * x * 1e9 + 0.5).toLong
        d += 1
      }
      out(c) = acc
      c += 1
    }
    out
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    // Like QuantizedDot/PqCodes: positions past the vector's actual
    // length read as 0 instead of reading past the array.
    val len = v.numElements()
    var vn = 0L
    var d = 0
    while (d < dim) {
      val x = if (d >= len || v.isNullAt(d)) 0d else v.getDouble(d)
      vn += math.floor(x * x * 1e9 + 0.5).toLong
      d += 1
    }
    val k = math.min(n, centIds.length)
    val topCos = new Array[Double](k)
    val topId = new Array[Long](k)
    var filled = 0
    var c = 0
    while (c < centIds.length) {
      var dot = 0L
      var i = 0
      while (i < dim) {
        val x = if (i >= len || v.isNullAt(i)) 0d else v.getDouble(i)
        dot += math.floor(x * cents(c * dim + i) * 1e9 + 0.5).toLong
        i += 1
      }
      val cos = dot.toDouble / math.sqrt(vn.toDouble * cn(c).toDouble)
      val id = centIds(c)
      // insertion position: before the first kept entry this (cos, id)
      // outranks — cosine DESC (java.lang.Double order), then id ASC
      var p = filled
      while (p > 0 && {
        val cmp = java.lang.Double.compare(cos, topCos(p - 1))
        cmp > 0 || (cmp == 0 && id < topId(p - 1))
      }) p -= 1
      if (p < k) {
        val stop = math.min(filled, k - 1)
        var m = stop
        while (m > p) { topCos(m) = topCos(m - 1); topId(m) = topId(m - 1); m -= 1 }
        topCos(p) = cos
        topId(p) = id
        if (filled < k) filled += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topId, filled))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ceRef = ctx.addReferenceObj("cents", cents, "double[]")
      val cnRef = ctx.addReferenceObj("cn", cn, "long[]")
      val idRef = ctx.addReferenceObj("centIds", centIds, "long[]")
      val len = ctx.freshName("len")
      val vn = ctx.freshName("vn")
      val d = ctx.freshName("d")
      val x = ctx.freshName("x")
      val k = ctx.freshName("k")
      val topCos = ctx.freshName("topCos")
      val topId = ctx.freshName("topId")
      val filled = ctx.freshName("filled")
      val c = ctx.freshName("c")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val cos = ctx.freshName("cos")
      val id = ctx.freshName("id")
      val p = ctx.freshName("p")
      val cmp = ctx.freshName("cmp")
      val m = ctx.freshName("m")
      s"""
        |int $len = $v.numElements();
        |long $vn = 0L;
        |for (int $d = 0; $d < $dim; $d++) {
        |  double $x = ($d >= $len || $v.isNullAt($d)) ? 0.0 : $v.getDouble($d);
        |  $vn += (long) java.lang.Math.floor($x * $x * 1.0E9 + 0.5);
        |}
        |int $k = java.lang.Math.min($n, $idRef.length);
        |double[] $topCos = new double[$k];
        |long[] $topId = new long[$k];
        |int $filled = 0;
        |for (int $c = 0; $c < $idRef.length; $c++) {
        |  long $dot = 0L;
        |  for (int $i = 0; $i < $dim; $i++) {
        |    double $x = ($i >= $len || $v.isNullAt($i)) ? 0.0 : $v.getDouble($i);
        |    $dot += (long) java.lang.Math.floor($x * $ceRef[$c * $dim + $i] * 1.0E9 + 0.5);
        |  }
        |  double $cos = (double) $dot / java.lang.Math.sqrt((double) $vn * (double) $cnRef[$c]);
        |  long $id = $idRef[$c];
        |  int $p = $filled;
        |  while ($p > 0) {
        |    int $cmp = java.lang.Double.compare($cos, $topCos[$p - 1]);
        |    if ($cmp > 0 || ($cmp == 0 && $id < $topId[$p - 1])) $p--; else break;
        |  }
        |  if ($p < $k) {
        |    for (int $m = java.lang.Math.min($filled, $k - 1); $m > $p; $m--) {
        |      $topCos[$m] = $topCos[$m - 1];
        |      $topId[$m] = $topId[$m - 1];
        |    }
        |    $topCos[$p] = $cos;
        |    $topId[$p] = $id;
        |    if ($filled < $k) $filled++;
        |  }
        |}
        |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        |  java.util.Arrays.copyOf($topId, $filled));
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfAssign {
  def ivfAssign(v: Column, cents: Array[Double], centIds: Array[Long],
      n: Int, dim: Int): Column =
    ExpressionUtils.column(IvfAssign(
      ExpressionUtils.expression(v), cents, centIds, n, dim))
}
