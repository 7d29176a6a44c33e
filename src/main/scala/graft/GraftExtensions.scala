package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftvec.QuantizedDot

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("... qdot(a, b) ...")`
  * works next to the Column API. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` or call
  * `GraftExtensions.register(spark)` on a live session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.qdotDescriptor)
}

object GraftExtensions {
  private val qdotDescriptor = (
    FunctionIdentifier("qdot"),
    new ExpressionInfo(classOf[QuantizedDot].getName, null, "qdot",
      "qdot(a, b) - exact fixed-point dot product: sum of floor(a_i*b_i*1e9 + 0.5) as BIGINT",
      ""),
    (children: Seq[Expression]) => QuantizedDot(children(0), children(1)))

  /** Register on an already-built session (tests, spark-shell). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      qdotDescriptor._1, qdotDescriptor._2, qdotDescriptor._3)
}
