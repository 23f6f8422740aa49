package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `lcs_len(a, b)` — EXACT longest-common-substring length (code points)
  * via a suffix automaton of `a` streamed over `b`: O(|a| + |b|) per
  * pair, against the O(|a|·|b|) dynamic program a naive formulation
  * needs. This is the exact tier of the substring-dedup ladder (Lee et
  * al., "Deduplicating Training Data Makes Language Models Better" —
  * d21/d27 are windowed-hash approximations; d45 measures the true
  * longest verbatim span per candidate pair). Codegen stays in
  * whole-stage: the generated code makes one static call per row, like
  * Spark's own `levenshtein`.
  */
case class LcsLen(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lcs_len needs (STRING, STRING), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(a: Any, b: Any): Any =
    StringAlgos.lcsLen(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringAlgos.lcsLen($a.toString(), $b.toString());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "lcs_len"
}

object StringAlgos {

  /** Direct Column builder (no session registration needed). */
  def lcsLenCol(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(LcsLen(
      org.apache.spark.sql.graft.ColumnBridge.expression(a),
      org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Longest common substring length in CODE POINTS. Suffix automaton of
    * `a` (≤ 2|a| states, linear construction), then one left-to-right
    * pass of `b` tracking the longest current match. Runs over Unicode
    * code points, not UTF-16 units — a supplementary-plane char (emoji,
    * CJK-ext) counts as 1 and half-surrogates can never match across
    * different astral chars, matching the per-codepoint substring
    * semantics the d45/d46 DuckDB oracles use. */
  def lcsLen(a: String, b: String): Long = {
    if (a.isEmpty || b.isEmpty) return 0L
    val as = a.codePoints().toArray
    val bs = b.codePoints().toArray
    val maxStates = 2 * as.length + 2
    val link = new Array[Int](maxStates)
    val len = new Array[Int](maxStates)
    val trans = new Array[java.util.HashMap[Integer, Integer]](maxStates)
    trans(0) = new java.util.HashMap[Integer, Integer]()
    link(0) = -1
    var size = 1
    var last = 0
    var ai = 0
    while (ai < as.length) {
      val c = Integer.valueOf(as(ai))
      val cur = size; size += 1
      trans(cur) = new java.util.HashMap[Integer, Integer]()
      len(cur) = len(last) + 1
      var p = last
      while (p != -1 && !trans(p).containsKey(c)) {
        trans(p).put(c, cur)
        p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q = trans(p).get(c).intValue()
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          trans(clone) =
            new java.util.HashMap[Integer, Integer](trans(q))
          link(clone) = link(q)
          while (p != -1 && {
            val t = trans(p).get(c); t != null && t.intValue() == q
          }) {
            trans(p).put(c, clone)
            p = link(p)
          }
          link(cur) = clone
          link(q) = clone
        }
      }
      last = cur
      ai += 1
    }
    // stream b through the automaton
    var v = 0
    var l = 0
    var best = 0
    var bi = 0
    while (bi < bs.length) {
      val c = Integer.valueOf(bs(bi))
      while (v != 0 && !trans(v).containsKey(c)) {
        v = link(v)
        l = len(v)
      }
      if (trans(v).containsKey(c)) {
        v = trans(v).get(c).intValue()
        l += 1
      } else { v = 0; l = 0 }
      if (l > best) best = l
      bi += 1
    }
    best.toLong
  }
}
