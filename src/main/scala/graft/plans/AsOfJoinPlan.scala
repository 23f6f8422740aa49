package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator as-of join — the custom-plan tier of the extension
  * ladder (compose built-ins > Expression > Aggregator > LogicalPlan +
  * Strategy + SparkPlan), used where the composed form costs more than
  * the operator needs: the union+window formulation
  * ([[graft.operators.AsOfJoin]]) funnels BOTH sides through one sort
  * and carries the left payload through the window; this operator
  * declares the same distribution/ordering requirements as a sort-merge
  * join (each side hash-partitioned by its key and sorted by (key, ts))
  * and then streams each partition pair once with O(1) state — no
  * buffering, no window, no unioned super-row.
  *
  * Semantics (matches DuckDB `ASOF LEFT JOIN ... ON l.key = r.key AND
  * l.ts >= r.ts` and the union+window form): for every left row, attach
  * the right row with the greatest ts <= left.ts in the same key group,
  * or nulls when none exists.
  */
final case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // same physical contract as a sort-merge join: co-partition by key,
  // sort each partition by (key, ts) — EnsureRequirements inserts the
  // exchanges/sorts, AQE can still re-plan them
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKey :: Nil), ClusteredDistribution(rightKey :: Nil))
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyExpr = bind(leftKey, left.output)
    val lTsExpr = bind(leftTs, left.output)
    val rKeyExpr = bind(rightKey, right.output)
    val rTsExpr = bind(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rWidth = right.output.size

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rWidth)
      val joined = new JoinedRow
      // one-row lookahead over the right side with its key/ts cached
      // (re-evaluated only on advance, not per left row); `curMatch` is
      // the latest right row whose (key, ts) is at-or-before the current
      // left row. curMatchKey is evaluated from the COPIED row — an eval
      // against the sorter's live row can point into a spill-reader
      // buffer that gets reused after the iterator advances.
      var rHead: InternalRow = null
      var rk: Any = null
      var rt: Any = null
      def advance(): Unit =
        if (rIter.hasNext) {
          rHead = rIter.next()
          rk = rKeyExpr.eval(rHead)
          rt = rTsExpr.eval(rHead)
        } else { rHead = null; rk = null; rt = null }
      advance()
      var curMatch: InternalRow = null
      var curMatchKey: Any = null

      lIter.map { lRow =>
        val lk = lKeyExpr.eval(lRow)
        val lt = lTsExpr.eval(lRow)
        if (lk == null || lt == null) {
          joined(lRow, nullRight)
        } else {
          var advancing = true
          while (advancing && rHead != null) {
            if (rk == null) {
              // null-key right rows can never match anyone: skip them
              // without disturbing the current candidate
              advance()
            } else {
              val cmp = keyOrd.compare(rk, lk)
              if (cmp < 0) {
                // right side still on an earlier key: drop and advance
                curMatch = null; curMatchKey = null
                advance()
              } else if (cmp == 0 && rt == null) {
                // null-ts row inside our key group (nulls sort first):
                // unmatchable, skip — do NOT stall on it
                advance()
              } else if (cmp == 0 && tsOrd.compare(rt, lt) <= 0) {
                // at-or-before row in our key group: becomes the candidate
                curMatch = rHead.copy()
                curMatchKey = rKeyExpr.eval(curMatch)
                advance()
              } else {
                advancing = false
              }
            }
          }
          val matched = curMatch != null && curMatchKey != null &&
            keyOrd.compare(curMatchKey, lk) == 0
          joined(lRow, if (matched) curMatch else nullRight)
        }
      }
    }
  }

  private def bind(e: Expression, attrs: Seq[Attribute]): Expression =
    org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(e, org.apache.spark.sql.catalyst.expressions.AttributeSeq(attrs))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: plan-level as-of join between two DataFrames. Column
  * names must be disjoint between the sides (alias the right side) so
  * attribute resolution is unambiguous. */
object GraftAsOf {
  def join(leftDf: DataFrame, rightDf: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String): DataFrame = {
    val spark = leftDf.sparkSession
    // idempotently register the planner strategy on this session
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = org.apache.spark.sql.graft.ColumnBridge.logicalPlan(leftDf)
    val rPlan = org.apache.spark.sql.graft.ColumnBridge.logicalPlan(rightDf)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    require(lPlan.output.map(_.exprId).toSet
      .intersect(rPlan.output.map(_.exprId).toSet).isEmpty,
      "as-of join sides must not share attributes — alias one side")
    // fail fast on the driver: the exec compares with the LEFT side's
    // ordering, so mismatched key/ts types would throw (or mis-compare)
    // deep inside a task
    require(attr(lPlan, leftKey).dataType == attr(rPlan, rightKey).dataType,
      s"key types differ: ${attr(lPlan, leftKey).dataType} vs " +
        s"${attr(rPlan, rightKey).dataType}")
    require(attr(lPlan, leftTs).dataType == attr(rPlan, rightTs).dataType,
      s"ts types differ: ${attr(lPlan, leftTs).dataType} vs " +
        s"${attr(rPlan, rightTs).dataType}")
    org.apache.spark.sql.graft.ColumnBridge.dataFrame(spark,
      AsOfJoinNode(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTs), attr(rPlan, rightTs)))
  }
}
