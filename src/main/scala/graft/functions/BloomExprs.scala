package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership as a native codegen expression over a
  * broadcast sketch — the engine side of Dolma-style Bloom dedup
  * (see d37): an already-ingested corpus is summarized into a few
  * bits/key, broadcast, and every incoming document tests membership
  * with ZERO shuffle. Guarantees: no false negatives ever (a true
  * duplicate always hits), false positives bounded by the configured
  * fpp — so "miss" proves novelty and only hits need exact
  * verification.
  *
  * The sketch is built with `DataFrame.stat.bloomFilter` (distributed
  * treeAggregate over the reference scan, driver-side merge) and is
  * deterministic for a given (items, expectedNumItems, fpp). At 100 TB
  * the filter for ~10^9 keys at 1% fpp is ~1.2 GB — broadcastable to
  * executors once per job; beyond that, shard the filter by key range
  * and route each row to its shard's test (same expression, one
  * broadcast per shard).
  *
  * Reference behavior: qubole/rubix has no document pipeline; the shape
  * follows the published Dolma/CCNet dedup tooling (Bloom filter over
  * seen keys, membership prefilter before exact check).
  */
object BloomExprs {

  /** Sentinel unioned into every [[broadcastBloom]] input so the
    * aggregate never sees zero rows (its null-buffer path NPEs). A fixed
    * improbable 64-bit value; the only observable effect is
    * `mightContain(EmptyGuardKey) == true`, which Bloom's
    * false-positive-only contract already permits for ANY key. */
  private[graft] val EmptyGuardKey: Long = 0x6772616674426c6dL // "graftBlm"

  /** Build + broadcast a Bloom filter over a LongType key column.
    * One distributed pass over `keys`; nothing else is collected.
    *
    * Lifecycle: the handle is referenced by the returned expression's
    * plan, so it cannot be destroyed eagerly (unlike kmeansCentroids'
    * per-iteration broadcasts); once the caller drops the plan, Spark's
    * ContextCleaner reclaims the broadcast on driver GC. Long-lived
    * sessions re-building sketches should reuse one handle per
    * reference corpus rather than re-calling this per query. */
  def broadcastBloom(spark: SparkSession, keys: DataFrame, keyCol: String,
      expectedNumItems: Long, fpp: Double): Broadcast[BloomFilter] = {
    // Spark's bloomFilter aggregate yields a NULL buffer over zero rows
    // (BloomFilter.readFrom(null) NPEs). An empty reference set is a
    // legal state for every caller — a micro-batch can admit zero docs
    // (found r15: a curation batch whose docs all failed quality crashed
    // the stream). Make the zero-row path UNREACHABLE by unioning one
    // sentinel key into the aggregate's input: the filter then always
    // builds, at the cost of a single extra bit-set entry whose only
    // effect is that mightContain(EmptyGuardKey) reads true — Bloom
    // semantics are false-positive-only, so one impossible key changes
    // nothing for real probes. Rejected alternatives (both r15-advice
    // violations or measured regressions): catching the NPE keys
    // recovery on a Spark-internal failure mode; a keys.isEmpty
    // pre-probe is a limit-1 JOB that re-executes the key plan's
    // upstream shuffles — measured this round at seconds per call on
    // the d47/d57 chain Blooms (shared-lane creep).
    val guarded = keys.select(keys.col(keyCol))
      .union(spark.range(1).select(
        org.apache.spark.sql.functions.lit(EmptyGuardKey).as(keyCol)))
    val bf = guarded.stat.bloomFilter(keyCol, expectedNumItems, fpp)
    spark.sparkContext.broadcast(bf)
  }

  /** `bf.mightContainLong(key)` as a codegen-friendly predicate. The
    * broadcast handle rides as a reference object and is unwrapped once
    * per operator instance, not per row. */
  case class BloomMightContain(child: Expression,
      bcast: Broadcast[BloomFilter]) extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT key, got ${child.dataType.sql}")
    override def nullable: Boolean = child.nullable
    override def nullSafeEval(a: Any): Any =
      bcast.value.mightContainLong(a.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomBc", bcast,
        "org.apache.spark.broadcast.Broadcast")
      val bf = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
        "bloomBf",
        v => s"$v = (org.apache.spark.util.sketch.BloomFilter) $ref.value();")
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $bf.mightContainLong($a);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
    override def prettyName: String = "bloom_might_contain"
  }

  def mightContainCol(key: Column, bcast: Broadcast[BloomFilter]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BloomMightContain(
        org.apache.spark.sql.graft.ColumnBridge.expression(key), bcast))
}
