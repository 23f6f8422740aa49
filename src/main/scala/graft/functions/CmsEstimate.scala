package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point query into a serialized count-min sketch: `cms_estimate(sketch,
  * term)` returns the sketch's frequency estimate for the term. Spark
  * ships the WRITE half of CMS natively (`count_min_sketch(...)`
  * aggregate → binary) but no read half — estimates normally require a
  * driver-side deserialize, which pulls the whole contract computation
  * off-plan. This expression closes the loop: the sketch column (one
  * aggregate row, broadcast) joins against any number of probe terms and
  * the estimate evaluates inside codegen, so heavy-hitter contracts stay
  * in-band (d31) and a 100 TB frequency-join never leaves the executors.
  *
  * Matching the aggregate's hashing: `CountMinSketchAgg` adds STRING
  * values as their UTF-8 bytes, so the lookup uses `estimateCount` on the
  * same byte form. Deserialization is memoized per (thread, sketch
  * reference) — one parse per task per sketch, not per row.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate needs (BINARY sketch, STRING term), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def nullSafeEval(sketch: Any, term: Any): Any =
    CmsEstimate.estimate(sketch.asInstanceOf[Array[Byte]],
      term.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, t) =>
      s"${ev.value} = graft.functions.CmsEstimate.estimate($sk, $t);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cms_estimate"
}

object CmsEstimate {
  // per-thread memo of the last deserialized sketch (tasks are
  // thread-confined; the common shape is one broadcast sketch probed by
  // many rows, so a 1-entry memo hits every row after the first)
  private val memo =
    new ThreadLocal[(Array[Byte], CountMinSketch)]

  def estimate(sketchBytes: Array[Byte], term: UTF8String): Long = {
    val cached = memo.get()
    val sketch =
      if (cached != null && (cached._1 eq sketchBytes)) cached._2
      else {
        val s = CountMinSketch.readFrom(sketchBytes)
        memo.set((sketchBytes, s))
        s
      }
    // CountMinSketchAgg adds strings as UTF-8 bytes — probe identically
    sketch.estimateCount(term.getBytes)
  }

  /** Column API over the registered function. */
  def cmsEstimate(sketch: Column, term: Column): Column =
    org.apache.spark.sql.functions.call_function("cms_estimate", sketch, term)

  /** Direct Column builder (no session registration needed). */
  def cmsEstimateCol(sketch: Column, term: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(CmsEstimate(
      org.apache.spark.sql.graft.ColumnBridge.expression(sketch),
      org.apache.spark.sql.graft.ColumnBridge.expression(term)))
}
