package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the document-fingerprinting hot paths.
  *
  * The round-1 formulation computed MinHash signatures and SimHash
  * fingerprints as explode + 64 aggregates: correct and map-side-combined,
  * but it still shuffles ~one row per doc per aggregate and burns a
  * hash-aggregation pass. Both are really PER-ROW functions of the token /
  * shingle array — so compute them as such: one tight loop per document,
  * inside whole-stage codegen, zero shuffle. At 100 TB this turns
  * signature generation from a shuffle stage into a streaming projection.
  *
  * Hash compatibility: uses Spark's own XXH64 (seed 42) so the values are
  * bit-identical to the builtin `xxhash64(...)` the aggregates used —
  * outputs are byte-for-byte the same as round 1 (asserted in
  * FingerprintQueriesSpec / PipelineSpec).
  */
object TextHashes {
  private final val Seed = 42L

  /** SimHash over token strings: each token's 64-bit hash votes ±1 per
    * bit; the sign of each tally becomes that bit (strictly-positive →
    * 1, matching IF(s > 0, ...) of the aggregate formulation). Empty
    * arrays return 0L — callers that want the old "token-less docs absent"
    * semantics filter on size(tokens) > 0. Null array elements are
    * skipped (they cannot vote). */
  def simhash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val tally = new Array[Int](64)
    var i = 0
    while (i < n) {
      val tok = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      if (tok == null) { i += 1 }
      else {
      val h = XXH64.hashUTF8String(tok, Seed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
        b += 1
      }
      i += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (tally(b) > 0) fp |= (1L << b); b += 1 }
    fp
  }

  /** MinHash signature over shingle hashes: permutation i is
    * h_i(x) = xxhash64(i, x) — exactly the builtin's two-field fold:
    * hashLong(x, hashLong(i, seed)). Returns long[numPerms] of minima. */
  def minhashSig(hashes: ArrayData, seeds: Array[Long]): ArrayData = {
    val hs = hashes.toLongArray()
    val out = Array.fill(seeds.length)(Long.MaxValue)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var i = 0
      while (i < seeds.length) {
        val v = XXH64.hashLong(h, seeds(i))
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def permSeeds(numPerms: Int): Array[Long] =
    Array.tabulate(numPerms)(i => XXH64.hashLong(i.toLong, Seed))

  /** Distinct 64-bit hashes of word k-gram shingles, one loop per doc —
    * bit-identical to xxhash64(concat(tok_i, ' ', ..., tok_{i+k-1}))
    * over array_distinct(transform(...)) but with no interpreted lambda
    * dispatch and no intermediate gram strings kept alive. Docs with
    * fewer than k tokens yield [xxhash64(text)] (the MinHash convention:
    * every doc gets a signature) or [] when `emptyIfShort` (the exact-
    * Jaccard convention: short docs never pair). */
  def shingleHash64(text: org.apache.spark.unsafe.types.UTF8String,
      tokens: ArrayData, k: Int, emptyIfShort: Boolean): ArrayData = {
    val n = tokens.numElements()
    if (n < k) {
      return new GenericArrayData(
        if (emptyIfShort) Array.emptyLongArray
        else Array(XXH64.hashUTF8String(text, Seed)))
    }
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val parts = new Array[org.apache.spark.unsafe.types.UTF8String](2 * k - 1)
    var j = 0
    while (j < k - 1) { parts(2 * j + 1) = space; j += 1 }
    var i = 0
    while (i <= n - k) {
      var hasNull = false
      j = 0
      while (j < k) {
        if (tokens.isNullAt(i + j)) hasNull = true
        else parts(2 * j) = tokens.getUTF8String(i + j)
        j += 1
      }
      if (!hasNull)
        seen.add(XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.concat(parts: _*), Seed))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new GenericArrayData(out)
  }

  case class ShingleHash64(left: Expression, right: Expression, k: Int,
      emptyIfShort: Boolean) extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (StringType, ArrayType(StringType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"shingle_hash64 needs (STRING, ARRAY<STRING>), got $other")
      }
    override def nullSafeEval(t: Any, a: Any): Any =
      shingleHash64(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        a.asInstanceOf[ArrayData], k, emptyIfShort)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (t, a) =>
        s"${ev.value} = graft.functions.TextHashes.shingleHash64($t, $a, $k, $emptyIfShort);")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "shingle_hash64"
  }

  def shingleHash64Col(text: Column, tokens: Column, k: Int,
      emptyIfShort: Boolean = false): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ShingleHash64(org.apache.spark.sql.graft.ColumnBridge.expression(text),
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens), k, emptyIfShort))

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 needs ARRAY<STRING>, got $other")
    }
    override def nullSafeEval(a: Any): Any =
      simhash64(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextHashes.simhash64($a);")
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "simhash64"
  }

  case class MinHashSig(child: Expression, numPerms: Int)
      extends UnaryExpression {
    @transient private lazy val seeds: Array[Long] = permSeeds(numPerms)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs ARRAY<BIGINT>, got $other")
    }
    override def nullSafeEval(a: Any): Any =
      minhashSig(a.asInstanceOf[ArrayData], seeds)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextHashes.minhashSig($a, $seedsRef);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "minhash_sig"
  }

  def simhash64Col(tokens: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SimHash64(org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))
  def minhashSigCol(hashes: Column, numPerms: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      MinHashSig(org.apache.spark.sql.graft.ColumnBridge.expression(hashes), numPerms))
}
