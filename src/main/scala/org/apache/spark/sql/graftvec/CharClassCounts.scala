package org.apache.spark.sql.graftvec

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-class census of a string in ONE byte scan, as a native
  * kernel:
  *
  *   char_class_counts(s) = [n_chars, n_alpha, n_digit, n_space]
  *
  * Semantics match the composable form EXACTLY — `length(s)` (code
  * points) and three `length(s) − length(regexp_replace(s, cls, ''))`
  * strip-counts for `[A-Za-z]`, `[0-9]`, `[ \t\n\r]` — but that form
  * walks the string four times, allocates three stripped copies per
  * row, and runs the regex engine on each. One kernel call counts all
  * four in a single pass over the UTF-8 bytes: code points are bytes
  * that are not continuation bytes (`(b & 0xC0) != 0x80`), and the
  * three ASCII classes are single-byte compares (non-ASCII characters
  * fall through to "other", exactly as the ASCII regex classes leave
  * them). text_charset_profile's hot path.
  *
  * Null input yields [0,0,0,0] (an empty census, like the regex form on
  * an empty string after the upstream null guard). */
case class CharClassCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "char_class_counts"

  @transient private lazy val holder = new CharClassKernel

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) holder.zeros() else holder.count(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val h = ctx.addReferenceObj("charClassKernel", holder,
      classOf[CharClassKernel].getName)
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

/** Row-level char-census kernel (referenced from generated code). */
class CharClassKernel extends Serializable {

  def zeros(): ArrayData =
    new GenericArrayData(Array[Any](0L, 0L, 0L, 0L))

  def count(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    var chars = 0L; var alpha = 0L; var digit = 0L; var space = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if ((b & 0xC0) != 0x80) chars += 1
      if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) alpha += 1
      else if (b >= '0' && b <= '9') digit += 1
      else if (b == ' ' || b == '\t' || b == '\n' || b == '\r') space += 1
      i += 1
    }
    new GenericArrayData(Array[Any](chars, alpha, digit, space))
  }
}

object CharClassExpressions {
  def charClassCounts(s: Column): Column =
    ExpressionUtils.column(CharClassCounts(ExpressionUtils.expression(s)))
}
