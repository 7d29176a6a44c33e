package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fixed-size chunking + fingerprinting of a binary payload in ONE
  * pass: split `child` into `chunkBytes` chunks, keep every `stride`-th
  * chunk, and emit `array<struct<chunk_i, chunk_fp, chunk_bytes>>`
  * where `chunk_fp` is the lowercase MD5 hex of the chunk's raw bytes
  * (byte-identical to `md5(substring(payload, ci*B+1, B))` on a
  * BinaryType column — slicing may split multi-byte UTF-8 sequences,
  * which is exactly what content-addressed chunk stores do).
  *
  * Replaces the declarative `explode(sequence(...))` → `substring` →
  * `md5` pipeline of the mm chunk ops (SketchKernelSpec asserts
  * equivalence): that shape duplicates the FULL payload once per chunk
  * row between the generate and the projection — a 5 KB doc at 128-byte
  * chunks briefly becomes 40 payload copies in the exploded stream.
  * Here the payload is scanned once and only (index, 32-char hex,
  * length) triples leave the expression, so the exploded stream carries
  * hashes, never payload bytes. The per-chunk MD5 work is identical;
  * the saved work is the payload copying and the interpreted Generate
  * input. An empty or null payload contributes no chunks.
  *
  * Lives under org.apache.spark.sql because the Expression/codegen API
  * is package-private to Spark.
  */
case class ChunkHashes(child: Expression, chunkBytes: Int, stride: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(chunkBytes > 0, "chunkBytes must be positive")
  require(stride > 0, "stride must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(ChunkHashes.Elem, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "chunk_hashes"

  override def nullSafeEval(a: Any): Any =
    ChunkHashes.compute(a.asInstanceOf[Array[Byte]], chunkBytes, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = org.apache.spark.sql.graftvec.ChunkHashes.compute($v, $chunkBytes, $stride);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ChunkHashes {
  val Elem: StructType = StructType(Seq(
    StructField("chunk_i", LongType, nullable = false),
    StructField("chunk_fp", StringType, nullable = false),
    StructField("chunk_bytes", IntegerType, nullable = false)))

  private val HexDigits = "0123456789abcdef".toCharArray

  /** One static call per row from both eval and generated code. */
  def compute(payload: Array[Byte], chunkBytes: Int, stride: Int): ArrayData = {
    val n = payload.length
    val nChunks = (n + chunkBytes - 1) / chunkBytes
    val nOut = if (nChunks == 0) 0 else (nChunks + stride - 1) / stride
    val out = new Array[Any](nOut)
    val md = java.security.MessageDigest.getInstance("MD5")
    var o = 0
    var ci = 0
    while (ci < nChunks) {
      val start = ci * chunkBytes
      val len = math.min(chunkBytes, n - start)
      md.reset()
      md.update(payload, start, len)
      val digest = md.digest()
      val hex = new Array[Char](32)
      var i = 0
      while (i < 16) {
        hex(2 * i) = HexDigits((digest(i) >> 4) & 0xF)
        hex(2 * i + 1) = HexDigits(digest(i) & 0xF)
        i += 1
      }
      out(o) = new GenericInternalRow(Array[Any](
        ci.toLong, UTF8String.fromString(new String(hex)), len))
      o += 1
      ci += stride
    }
    new GenericArrayData(out)
  }
}

object ChunkExpressions {
  /** Column wrapper: every `stride`-th `chunkBytes` chunk of `payload`
    * (a BinaryType column) as (chunk_i, chunk_fp, chunk_bytes). */
  def chunkHashes(payload: Column, chunkBytes: Int, stride: Int = 1): Column =
    ExpressionUtils.column(
      ChunkHashes(ExpressionUtils.expression(payload), chunkBytes, stride))
}
