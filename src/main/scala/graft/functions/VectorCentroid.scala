package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise running fixed-point sum + count for a vector centroid. */
final case class CentroidBuf(sum: Array[Long], n: Long)

/** Per-group vector centroid as a typed `Aggregator` — the UDAF tier of
  * the extension ladder (compose built-ins > custom Expression > typed
  * Aggregator > opaque UDF). Partial aggregation comes for free: Spark
  * runs `reduce` map-side and `merge` after the shuffle, so the exchange
  * carries one (sum[dims], n) buffer per group per partition instead of
  * raw vectors — exactly the shape a 100 TB centroid/k-means (IVF
  * training) step needs.
  *
  * Accumulation is FIXED-POINT: each float element is widened to double
  * (exact), scaled by 1e6 and truncated toward zero into a long. Integer
  * addition is associative and commutative, so the per-group sums are
  * bit-identical regardless of partitioning, task order, or engine —
  * unlike a double sum, whose low bits depend on reduction order. The
  * finished centroid `sum/n/1e6` is then an integer-derived double
  * (two IEEE divisions of exact integers), reproducible anywhere:
  * DuckDB's `CAST(sum(CAST(trunc(CAST(x AS DOUBLE)*1000000) AS BIGINT))
  * AS DOUBLE)/count(*)/1000000` lands on the same bits. Quantization
  * error is <= 1e-6 per element — noise for an embedding centroid, and
  * a price worth paying for a deterministic distributed aggregate.
  */
object VectorCentroid
    extends Aggregator[Array[Float], CentroidBuf, Array[Double]] {

  /** Fixed-point scale: 1e-6 resolution. |sum| stays under 2^53 (exact
    * as a double) up to ~9e9 rows/group at |x|~1; beyond that the final
    * long->double conversion ROUNDS, but identically on any IEEE-754
    * engine, so the output stays bit-stable (just no longer exact to the
    * last ulp). The hard bound is long overflow at ~9e12 rows/group —
    * beyond centroid use; shard the group key first if you get there. */
  val Scale = 1e6

  /** Non-finite elements map to 0 — explicitly, not via d2l saturation:
    * the JVM folds NaN to 0 but ±Inf to ±Long.MaxValue (an instant sum
    * poison), and the DuckDB oracle's CAST(trunc(x*1e6) AS BIGINT) would
    * ERROR on any non-finite instead. Zero on both sides keeps the
    * engines aligned; the oracle mirrors this with
    * CASE WHEN isfinite(x) THEN ... ELSE 0 END. */
  @inline def toFixed(v: Float): Long = {
    val d = v.toDouble * Scale
    if (java.lang.Double.isFinite(d)) d.toLong else 0L
  }

  override def zero: CentroidBuf = CentroidBuf(Array.emptyLongArray, 0L)

  override def reduce(b: CentroidBuf, v: Array[Float]): CentroidBuf = {
    if (v == null) return b
    val s = if (b.sum.length == 0) new Array[Long](v.length) else b.sum
    var i = 0
    val n = math.min(s.length, v.length)
    while (i < n) { s(i) += toFixed(v(i)); i += 1 }
    CentroidBuf(s, b.n + 1)
  }

  override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
    if (x.n == 0) return y
    if (y.n == 0) return x
    // a side whose rows were all zero-length vectors carries an empty
    // sum but n > 0: keep the other side's sums, add the counts
    if (x.sum.length == 0) return CentroidBuf(y.sum, x.n + y.n)
    if (y.sum.length == 0) return CentroidBuf(x.sum, x.n + y.n)
    val s = x.sum
    var i = 0
    val n = math.min(s.length, y.sum.length)
    while (i < n) { s(i) += y.sum(i); i += 1 }
    CentroidBuf(s, x.n + y.n)
  }

  override def finish(b: CentroidBuf): Array[Double] =
    if (b.n == 0) Array.emptyDoubleArray
    else b.sum.map(s => s.toDouble / b.n / Scale)

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  /** Untyped Column form for DataFrame .agg(...). */
  def asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(this,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
}
