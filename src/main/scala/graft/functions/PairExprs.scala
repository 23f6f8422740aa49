package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native pair-generation kernel for the graph queries (r18 optimization
  * round): all unordered pairs {a < b} of a long array's distinct
  * elements, emitted per row inside whole-stage codegen.
  *
  * d41/d56's edge recipe was a self-join of the distinct (order, part)
  * table on the order key — two exchanges of the lineitem projection just
  * to enumerate within-order part pairs. `collect_set(part) per order +
  * sorted_pairs(ps)` produces the identical pair SET (both are "all a < b
  * with a,b distinct parts of the order"; the downstream `.distinct()`
  * over pairs is unchanged) from ONE exchange. Per-order arrays are tiny
  * (TPC-H ≤ 7 lines/order), so the quadratic emit is bounded per row.
  */
object PairExprs {

  def sortedPairs(arr: ArrayData): ArrayData = {
    val n0 = arr.numElements()
    val tmp = new Array[Long](n0)
    var m = 0
    var i = 0
    while (i < n0) {
      if (!arr.isNullAt(i)) { tmp(m) = arr.getLong(i); m += 1 }
      i += 1
    }
    java.util.Arrays.sort(tmp, 0, m)
    // dedupe in place (collect_set already dedupes; keep the kernel total)
    var w = 0
    i = 0
    while (i < m) {
      if (w == 0 || tmp(i) != tmp(w - 1)) { tmp(w) = tmp(i); w += 1 }
      i += 1
    }
    val out = new Array[Any](w * (w - 1) / 2 max 0)
    var k = 0
    i = 0
    while (i < w) {
      var j = i + 1
      while (j < w) {
        val row = new GenericInternalRow(2)
        row.setLong(0, tmp(i))
        row.setLong(1, tmp(j))
        out(k) = row
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  case class SortedPairs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("a", LongType, nullable = false),
      StructField("b", LongType, nullable = false))), containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_pairs needs ARRAY<BIGINT>, got $other")
    }
    override def nullSafeEval(a: Any): Any =
      sortedPairs(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.PairExprs.sortedPairs($a);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "sorted_pairs"
  }

  def sortedPairsCol(arr: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SortedPairs(org.apache.spark.sql.graft.ColumnBridge.expression(arr)))
}
