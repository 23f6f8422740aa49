package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

  private def requireFloatArray(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name needs ARRAY<FLOAT>, got $other")
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
