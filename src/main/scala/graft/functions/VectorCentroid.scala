package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise running sum + count for a vector centroid. */
final case class CentroidBuf(sum: Array[Double], n: Long)

/** Per-group vector centroid as a typed `Aggregator` — the UDAF tier of
  * the extension ladder (compose built-ins > custom Expression > typed
  * Aggregator > opaque UDF). Partial aggregation comes for free: Spark
  * runs `reduce` map-side and `merge` after the shuffle, so the exchange
  * carries one (sum[dims], n) buffer per group per partition instead of
  * raw vectors — exactly the shape a 100 TB centroid/k-means (IVF
  * training) step needs.
  */
object VectorCentroid
    extends Aggregator[Array[Float], CentroidBuf, Array[Double]] {

  override def zero: CentroidBuf = CentroidBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: CentroidBuf, v: Array[Float]): CentroidBuf = {
    if (v == null) return b
    val s = if (b.sum.length == 0) new Array[Double](v.length) else b.sum
    var i = 0
    val n = math.min(s.length, v.length)
    while (i < n) { s(i) += v(i); i += 1 }
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
    if (b.n == 0) Array.emptyDoubleArray else b.sum.map(_ / b.n)

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()

  /** Untyped Column form for DataFrame .agg(...). */
  def asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(this,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
}
