package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Portable polynomial rolling hash of a string's bytes:
  *
  *   h = fold(0) { acc, byte => (acc·131 + byte) mod 1_000_000_007 }
  *
  * The dedup sketches (MinHash, SimHash) need a base hash that a SQL
  * oracle can reproduce exactly; Spark's `xxhash64` has no DuckDB twin,
  * but this fold is one `list_reduce` there. All intermediate values fit
  * in int64 (acc < 2³⁰, acc·131 + 255 < 2³⁸), so both engines compute
  * identical exact integers. Collisions (birthday ≈ n²/2·10⁻⁹) are
  * CONSISTENT across engines — both sides merge the same tokens — so
  * they affect sketch quality infinitesimally, never oracle equality.
  *
  * For ASCII input, bytes coincide with code points, which is what the
  * DuckDB twin (`unicode()` per char) hashes; the test corpus is ASCII
  * (asserted in MultimodalSpec via n_bytes = n_chars).
  *
  * Lives under org.apache.spark.sql because the Expression/codegen API
  * is package-private to Spark.
  */
case class PolyHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 131L + (bytes(i) & 0xFF)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
        |byte[] $bytes = $s.getBytes();
        |long $acc = 0L;
        |for (int $i = 0; $i < $bytes.length; $i++) {
        |  $acc = ($acc * 131L + ($bytes[$i] & 0xFF)) % 1000000007L;
        |}
        |${ev.value} = $acc;
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
