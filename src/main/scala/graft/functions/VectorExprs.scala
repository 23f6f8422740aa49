package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector-similarity hot paths.
  *
  * The HOF formulations (`aggregate(zip_with(...))`) of dot products and
  * hyperplane hashing stay interpreted — every element goes through a
  * boxed lambda dispatch — and a stage carrying one loses whole-stage
  * codegen above it. These expressions compute the same values (identical
  * sequential fold order, so bit-identical doubles) in tight JIT-compiled
  * loops invoked once per row from generated code.
  *
  * Reference behavior: brute-force + LSH-bucketed vector search over an
  * embedding column (SURVEY.md §2 similarity-search rows).
  */
object VectorOps {
  /** True if any element slot is SQL NULL. The kernels read primitives
    * via toFloatArray (null slots would silently read as 0.0), so the
    * expressions return NULL for arrays with null elements — matching
    * the HOF formulation's null propagation. */
  def hasNullElement(a: ArrayData): Boolean = {
    var i = 0
    val n = a.numElements()
    while (i < n) { if (a.isNullAt(i)) return true; i += 1 }
    false
  }

  /** cos(a, b) = dot / (sqrt(|a|²) * sqrt(|b|²)), folded left-to-right in
    * doubles — the exact order of `aggregate(zip_with(a, b, ...))` for
    * equal-length inputs. Ragged inputs use the common prefix (the HOF
    * form would return NULL from the padded nulls — a number is the saner
    * library contract; all gate embeddings are fixed 64-dim). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val av = a.toFloatArray()
    val bv = b.toFloatArray()
    val n = math.min(av.length, bv.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = av(i).toDouble; val y = bv(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def l2norm(a: ArrayData): Double = {
    val av = a.toFloatArray()
    var acc = 0.0
    var i = 0
    while (i < av.length) { val x = av(i).toDouble; acc += x * x; i += 1 }
    math.sqrt(acc)
  }

  /** Deterministic pseudo-random hyperplane component: splitmix64 of
    * (plane, dim) scaled to [-1, 1). Same constant on every executor. */
  def hyperplane(plane: Int, dims: Int): Array[Double] =
    Array.tabulate(dims) { d =>
      var z = plane.toLong * 131071 + d + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }

  /** One bucket id per hash table: `planesPerTable` sign bits of
    * hyperplane dot products, weighted 1 << p. Fold order per plane
    * matches the HOF formulation (sequential, doubles). */
  def srpBuckets(emb: ArrayData, planes: Array[Array[Double]],
      planesPerTable: Int): ArrayData = {
    val v = emb.toFloatArray()
    val numTables = planes.length / planesPerTable
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val w = planes(t * planesPerTable + p)
        val n = math.min(v.length, w.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v(i).toDouble * w(i); i += 1 }
        if (acc > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** max |x| over the elements, folded from 0.0 — the fold order of
    * `aggregate(emb, 0.0D, (a, x) -> greatest(a, abs(x)))`. */
  def maxAbs(a: ArrayData): Double = {
    val av = a.toFloatArray()
    var acc = 0.0
    var i = 0
    while (i < av.length) {
      val ax = math.abs(av(i).toDouble)
      if (ax > acc) acc = ax
      i += 1
    }
    acc
  }

  /** Symmetric int8 encode against a caller-supplied scale:
    * q[i] = trunc(x/scale + (x >= 0 ? 0.5 : -0.5)) — round-half-away,
    * truncating double→long cast exactly like Spark's non-ANSI CAST. */
  def int8Encode(a: ArrayData, scale: Double): ArrayData = {
    val av = a.toFloatArray()
    val out = new Array[Long](av.length)
    var i = 0
    while (i < av.length) {
      val x = av(i)
      out(i) = (x.toDouble / scale + (if (x >= 0.0f) 0.5 else -0.5)).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass encode with the scale derived in-kernel (max-abs / 127,
    * zero vectors → 1.0): the hot-path form for scans that don't emit
    * the scale (the scales cancel in cosine anyway). */
  def int8EncodeAuto(a: ArrayData): ArrayData = {
    val m = maxAbs(a) / 127.0
    int8Encode(a, if (m == 0.0) 1.0 else m)
  }

  /** Cosine over int8 codes: pure long dot products (bounded by
    * dims × 127², no overflow), one double division per norm in the
    * exact order of the Column formulation `dot / sqrt(na) / sqrt(nb)`. */
  def intCosine(a: ArrayData, b: ArrayData): Double = {
    val av = a.toLongArray()
    val bv = b.toLongArray()
    val n = math.min(av.length, bv.length)
    var dot = 0L
    var i = 0
    while (i < n) { dot += av(i) * bv(i); i += 1 }
    var na = 0L
    i = 0
    while (i < av.length) { na += av(i) * av(i); i += 1 }
    var nb = 0L
    i = 0
    while (i < bv.length) { nb += bv(i) * bv(i); i += 1 }
    dot.toDouble / math.sqrt(na.toDouble) / math.sqrt(nb.toDouble)
  }

  /** Sign-bit packing of a float vector into one long: bit d set iff
    * v(d) > 0. The 1-bit quantization tier below int8 — a 64-dim float32
    * vector compresses 32× to 8 bytes, and candidate scoring becomes a
    * single XOR + POPCNT per pair (hamming distance approximates angular
    * distance for mean-centered data; same family as the SRP bucket
    * bits, but kept as a full 64-bit code for distance ranking instead
    * of being chopped into bucket keys). Dims beyond 64 are ignored;
    * shorter vectors leave high bits zero. */
  def signBits64(a: ArrayData): Long = {
    val v = a.toFloatArray()
    val n = math.min(v.length, 64)
    var bits = 0L
    var i = 0
    while (i < n) { if (v(i) > 0.0f) bits |= (1L << i); i += 1 }
    bits
  }

  /** L1 mass of a float vector, folded from 0.0 — the fold order of
    * `aggregate(emb, 0.0D, (a, x) -> a + abs(x))` (e02's per-row term). */
  def absSum(a: ArrayData): Double = {
    val av = a.toFloatArray()
    var acc = 0.0
    var i = 0
    while (i < av.length) { acc += math.abs(av(i).toDouble); i += 1 }
    acc
  }

  /** Sum of a long array (exact integer fold — order-independent). */
  def longSum(a: ArrayData): Long = {
    val av = a.toLongArray()
    var acc = 0L
    var i = 0
    while (i < av.length) { acc += av(i); i += 1 }
    acc
  }

  /** max |v| over a long array, folded from 0. */
  def longAbsMax(a: ArrayData): Long = {
    val av = a.toLongArray()
    var acc = 0L
    var i = 0
    while (i < av.length) {
      val v = math.abs(av(i))
      if (v > acc) acc = v
      i += 1
    }
    acc
  }

  /** Per-element-truncated reconstruction error in ppm of the scale:
    * Σ trunc(|x − q·scale| / scale × 1e6) — the exact per-element math
    * of the HOF `zip_with` formulation, summed as exact longs. */
  def quantErrPpmSum(emb: ArrayData, qv: ArrayData, scale: Double): Long = {
    val av = emb.toFloatArray()
    val q = qv.toLongArray()
    val n = math.min(av.length, q.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += (math.abs(av(i).toDouble - q(i) * scale) / scale * 1000000.0).toLong
      i += 1
    }
    acc
  }

  private def requireFloatArray(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name needs ARRAY<FLOAT>, got $other")
    }

  private def requireLongArray(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name needs ARRAY<BIGINT>, got $other")
    }

  /** Register all vector expressions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSim(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("l2norm",
      exprs => L2Norm(exprs.head), "built-in")
  }

  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(left.dataType, prettyName) match {
        case TypeCheckResult.TypeCheckSuccess =>
          requireFloatArray(right.dataType, prettyName)
        case fail => fail
      }
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (hasNullElement(aa) || hasNullElement(bb)) null else cosine(aa, bb)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""if (graft.functions.VectorOps.hasNullElement($a) ||
           |    graft.functions.VectorOps.hasNullElement($b)) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = graft.functions.VectorOps.cosine($a, $b);
           |}""".stripMargin)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "cosine_sim"
  }

  case class L2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(child.dataType, prettyName)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any = {
      val aa = a.asInstanceOf[ArrayData]
      if (hasNullElement(aa)) null else l2norm(aa)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""if (graft.functions.VectorOps.hasNullElement($a)) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.VectorOps.l2norm($a); }""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "l2norm"
  }

  /** SRP-LSH bucket ids; the plane matrix is a deterministic function of
    * (numTables, planesPerTable, dims), regenerated per executor — no
    * broadcast state, identical everywhere. */
  case class SrpBucketIds(child: Expression, numTables: Int,
      planesPerTable: Int, dims: Int) extends UnaryExpression {
    @transient private lazy val planes: Array[Array[Double]] =
      Array.tabulate(numTables * planesPerTable)(hyperplane(_, dims))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(child.dataType, prettyName)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any = {
      val aa = a.asInstanceOf[ArrayData]
      if (hasNullElement(aa)) null else srpBuckets(aa, planes, planesPerTable)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("srpPlanes", planes,
        "double[][]")
      nullSafeCodeGen(ctx, ev, a =>
        s"""if (graft.functions.VectorOps.hasNullElement($a)) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.VectorOps.srpBuckets(
           |  $a, $planesRef, $planesPerTable); }""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "srp_bucket_ids"
  }

  /** Index of the nearest centroid by squared L2 distance (ties -> lowest
    * index). Centroids ride along as a reference object — k × dims
    * doubles, re-materialized per executor from the driver's literal. */
  def nearestCentroid(emb: ArrayData, centroids: Array[Array[Double]]): Int = {
    val v = emb.toFloatArray()
    var best = 0
    var bestD = Double.MaxValue
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      val n = math.min(v.length, c.length)
      var d = 0.0
      var i = 0
      while (i < n) { val t = v(i).toDouble - c(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = j }
      j += 1
    }
    best
  }

  /** The `nprobe` nearest centroid indices by squared L2, ascending
    * distance (ties -> lowest index): selection sort over k cells —
    * k is small (coarse quantizer), rows are many. */
  def nearestCentroids(emb: ArrayData, centroids: Array[Array[Double]],
      nprobe: Int): ArrayData = {
    val v = emb.toFloatArray()
    val k = centroids.length
    val d = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = centroids(j)
      val n = math.min(v.length, c.length)
      var acc = 0.0
      var i = 0
      while (i < n) { val t = v(i).toDouble - c(i); acc += t * t; i += 1 }
      d(j) = acc
      j += 1
    }
    val take = math.min(nprobe, k)
    val out = new Array[Int](take)
    val used = new Array[Boolean](k)
    var p = 0
    while (p < take) {
      var best = -1
      var bestD = Double.MaxValue
      j = 0
      while (j < k) {
        if (!used(j) && d(j) < bestD) { bestD = d(j); best = j }
        j += 1
      }
      if (best == -1) {
        // all remaining distances NaN/untaken (NaN embedding component):
        // fall back to the first unused slot instead of crashing
        j = 0
        while (best == -1 && j < k) { if (!used(j)) best = j; j += 1 }
      }
      used(best) = true
      out(p) = best
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Broadcast the k × dims centroid matrix once; the expressions below
    * hold only the broadcast HANDLE. Holding the matrix itself as an
    * expression literal is a scale bug: a real IVF coarse quantizer has
    * thousands of cells, and thousands × dims doubles inlined into the
    * expression tree blow up plan serialization, plan-string rendering,
    * and codegen reference tables on every task. The handle serializes as
    * a small stub; executors fetch the blocks once per JVM. */
  def broadcastCentroids(spark: SparkSession,
      centroids: Seq[Seq[Double]]): Broadcast[Array[Array[Double]]] =
    spark.sparkContext.broadcast(centroids.map(_.toArray).toArray)

  /** Argmin-centroid assignment for IVF coarse quantization: per-row
    * codegen'd loop over a broadcast k × dims centroid table. */
  case class NearestCentroid(child: Expression,
      bcast: Broadcast[Array[Array[Double]]]) extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(child.dataType, prettyName)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any = {
      val aa = a.asInstanceOf[ArrayData]
      if (hasNullElement(aa)) null else nearestCentroid(aa, bcast.value)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ivfCentroidsBc", bcast,
        "org.apache.spark.broadcast.Broadcast")
      // unwrap the broadcast ONCE per operator instance, not per row
      val cents = ctx.addMutableState("double[][]", "ivfCents",
        v => s"$v = (double[][]) $ref.value();")
      nullSafeCodeGen(ctx, ev, a =>
        s"""if (graft.functions.VectorOps.hasNullElement($a)) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.VectorOps.nearestCentroid($a, $cents); }""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "nearest_centroid"
  }

  /** Multi-probe variant: the nprobe nearest cell ids, for the query side
    * of an IVF search. */
  case class NearestCentroids(child: Expression,
      bcast: Broadcast[Array[Array[Double]]], nprobe: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(child.dataType, prettyName)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any = {
      val aa = a.asInstanceOf[ArrayData]
      if (hasNullElement(aa)) null else nearestCentroids(aa, bcast.value, nprobe)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ivfCentroidsBc", bcast,
        "org.apache.spark.broadcast.Broadcast")
      val cents = ctx.addMutableState("double[][]", "ivfCents",
        v => s"$v = (double[][]) $ref.value();")
      nullSafeCodeGen(ctx, ev, a =>
        s"""if (graft.functions.VectorOps.hasNullElement($a)) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.VectorOps.nearestCentroids($a, $cents, $nprobe); }""".stripMargin)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "nearest_centroids"
  }

  /** max |x| of a float vector — the per-vector scale numerator for
    * symmetric int8 quantization (e09). */
  case class MaxAbs(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(child.dataType, prettyName)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any = {
      val aa = a.asInstanceOf[ArrayData]
      if (hasNullElement(aa)) null else maxAbs(aa)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""if (graft.functions.VectorOps.hasNullElement($a)) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.VectorOps.maxAbs($a); }""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "vec_max_abs"
  }

  /** L1 mass of a float vector (e02's per-row term — the one remaining
    * interpreted HOF in the vector family before round 9). */
  case class AbsSum(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(child.dataType, prettyName)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any = {
      val aa = a.asInstanceOf[ArrayData]
      if (hasNullElement(aa)) null else absSum(aa)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""if (graft.functions.VectorOps.hasNullElement($a)) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.VectorOps.absSum($a); }""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "vec_abs_sum"
  }

  /** Symmetric round-half-away int8 encode of a float vector against an
    * explicit per-vector scale column (e09 emits the scale as data, so
    * the code column must be derived from exactly that scale). */
  case class Int8Encode(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(left.dataType, prettyName) match {
        case TypeCheckResult.TypeCheckSuccess => right.dataType match {
          case DoubleType => TypeCheckResult.TypeCheckSuccess
          case other => TypeCheckResult.TypeCheckFailure(
            s"$prettyName scale needs DOUBLE, got $other")
        }
        case fail => fail
      }
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, s: Any): Any = {
      val aa = a.asInstanceOf[ArrayData]
      if (hasNullElement(aa)) null
      else int8Encode(aa, s.asInstanceOf[Double])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, s) =>
        s"""if (graft.functions.VectorOps.hasNullElement($a)) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.VectorOps.int8Encode($a, $s); }""".stripMargin)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "int8_encode"
  }

  /** One-pass encode with the scale derived in-kernel — the scan shape
    * for retrieval (e10), where the scales cancel in cosine and never
    * need to leave the row. */
  case class Int8EncodeAuto(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(child.dataType, prettyName)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any = {
      val aa = a.asInstanceOf[ArrayData]
      if (hasNullElement(aa)) null else int8EncodeAuto(aa)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""if (graft.functions.VectorOps.hasNullElement($a)) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.VectorOps.int8EncodeAuto($a); }""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "int8_encode_auto"
  }

  /** Cosine over int8 code arrays: pure integer dot products in one JIT
    * loop. The HOF formulation (`aggregate(zip_with(qq, qc, ...))` per
    * norm and dot) runs three interpreted boxed folds per pair — this is
    * the e10 scoring hot path, the part of quantized retrieval that
    * actually touches every candidate at 100 TB. */
  case class IntCosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongArray(left.dataType, prettyName) match {
        case TypeCheckResult.TypeCheckSuccess =>
          requireLongArray(right.dataType, prettyName)
        case fail => fail
      }
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (hasNullElement(aa) || hasNullElement(bb)) null else intCosine(aa, bb)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""if (graft.functions.VectorOps.hasNullElement($a) ||
           |    graft.functions.VectorOps.hasNullElement($b)) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = graft.functions.VectorOps.intCosine($a, $b);
           |}""".stripMargin)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "int_cosine_sim"
  }

  /** Sign-bit packing (1-bit quantization, e13's encode step): one long
    * of sign bits per vector, computed in a single JIT loop per row —
    * the scan-side kernel for hamming-shortlist retrieval. */
  case class SignBits64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(child.dataType, prettyName)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any = {
      val aa = a.asInstanceOf[ArrayData]
      if (hasNullElement(aa)) null else signBits64(aa)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""if (graft.functions.VectorOps.hasNullElement($a)) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.VectorOps.signBits64($a); }""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "sign_bits64"
  }

  /** Exact sum of a long array (e09 sum_q). */
  case class LongArraySum(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongArray(child.dataType, prettyName)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any = {
      val aa = a.asInstanceOf[ArrayData]
      if (hasNullElement(aa)) null else longSum(aa)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""if (graft.functions.VectorOps.hasNullElement($a)) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.VectorOps.longSum($a); }""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "long_array_sum"
  }

  /** max |v| of a long array (e09 max_q — 127 by construction). */
  case class LongArrayAbsMax(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      requireLongArray(child.dataType, prettyName)
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any): Any = {
      val aa = a.asInstanceOf[ArrayData]
      if (hasNullElement(aa)) null else longAbsMax(aa)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""if (graft.functions.VectorOps.hasNullElement($a)) { ${ev.isNull} = true; }
           |else { ${ev.value} = graft.functions.VectorOps.longAbsMax($a); }""".stripMargin)
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "long_array_abs_max"
  }

  /** Quantization reconstruction error (ppm of scale, truncated per
    * element, summed as exact longs — order-independent, no
    * double-rounding boundary). */
  case class QuantErrPpm(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      requireFloatArray(first.dataType, prettyName) match {
        case TypeCheckResult.TypeCheckSuccess =>
          requireLongArray(second.dataType, prettyName) match {
            case TypeCheckResult.TypeCheckSuccess => third.dataType match {
              case DoubleType => TypeCheckResult.TypeCheckSuccess
              case other => TypeCheckResult.TypeCheckFailure(
                s"$prettyName scale needs DOUBLE, got $other")
            }
            case fail => fail
          }
        case fail => fail
      }
    override def nullable: Boolean = true
    override def nullSafeEval(e: Any, q: Any, s: Any): Any = {
      val (ea, qa) = (e.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData])
      if (hasNullElement(ea) || hasNullElement(qa)) null
      else quantErrPpmSum(ea, qa, s.asInstanceOf[Double])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (e, q, s) =>
        s"""if (graft.functions.VectorOps.hasNullElement($e) ||
           |    graft.functions.VectorOps.hasNullElement($q)) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = graft.functions.VectorOps.quantErrPpmSum($e, $q, $s);
           |}""".stripMargin)
    override protected def withNewChildrenInternal(newFirst: Expression,
        newSecond: Expression, newThird: Expression): Expression =
      copy(first = newFirst, second = newSecond, third = newThird)
    override def prettyName: String = "quant_err_ppm"
  }

  def maxAbsCol(a: Column): Column = exprCol(MaxAbs(exprOf(a)))
  def absSumCol(a: Column): Column = exprCol(AbsSum(exprOf(a)))
  def int8EncodeCol(a: Column, scale: Column): Column =
    exprCol(Int8Encode(exprOf(a), exprOf(scale)))
  def int8EncodeAutoCol(a: Column): Column = exprCol(Int8EncodeAuto(exprOf(a)))
  def intCosineSimCol(a: Column, b: Column): Column =
    exprCol(IntCosineSim(exprOf(a), exprOf(b)))
  def signBits64Col(a: Column): Column = exprCol(SignBits64(exprOf(a)))
  def longSumCol(a: Column): Column = exprCol(LongArraySum(exprOf(a)))
  def longAbsMaxCol(a: Column): Column = exprCol(LongArrayAbsMax(exprOf(a)))
  def quantErrPpmCol(emb: Column, qv: Column, scale: Column): Column =
    exprCol(QuantErrPpm(exprOf(emb), exprOf(qv), exprOf(scale)))

  def nearestCentroidCol(a: Column,
      bcast: Broadcast[Array[Array[Double]]]): Column =
    exprCol(NearestCentroid(exprOf(a), bcast))
  def nearestCentroidsCol(a: Column, bcast: Broadcast[Array[Array[Double]]],
      nprobe: Int): Column =
    exprCol(NearestCentroids(exprOf(a), bcast, nprobe))

  /** Column API: construct via the registry-free SQL parser path. */
  def cosineSim(a: Column, b: Column): Column = exprCol(CosineSim(exprOf(a), exprOf(b)))
  def l2normCol(a: Column): Column = exprCol(L2Norm(exprOf(a)))
  def srpBucketIds(a: Column, numTables: Int, planesPerTable: Int,
      dims: Int): Column =
    exprCol(SrpBucketIds(exprOf(a), numTables, planesPerTable, dims))

  private def exprOf(c: Column): Expression =
    org.apache.spark.sql.graft.ColumnBridge.expression(c)
  private def exprCol(e: Expression): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(e)
}
