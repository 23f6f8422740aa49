package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent execution of the SQL surface — the reference's stress
  * protocol (rubix_stressor.py: 8 threads over a query list against one
  * warm cluster) applied to graft's own gate queries: 8 threads, shuffled
  * rounds, one shared SparkSession, and every concurrent execution must
  * reproduce the result fingerprint of its sequential run. Covers every
  * eligible family: relational joins/aggs/windows, dedup (including the
  * d10 connected-components fixpoint, whose persist/localCheckpoint loop
  * is the most interleaving-sensitive shape in the repo), vector
  * retrieval with persisted exact arms, multimodal, fingerprints.
  * StressGateSpec covers the cache layer's 8-thread story; this spec is
  * the missing SQL-surface half. */
class ConcurrentGateSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    // c* pool members touch the shared in-process cache singleton: start
    // and end from a clean slate (the FS-suite convention)
    org.apache.hadoop.fs.FileSystem.closeAll()
    graft.cache.CacheManager.resetForTest()
    spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    org.apache.hadoop.fs.FileSystem.closeAll()
    graft.cache.CacheManager.resetForTest()
  }

  // one query per family + the stateful shapes most likely to misbehave
  // under interleaving (fixpoint loops, persisted arms, UDAFs, cache
  // metric contracts, streaming state). Since r10 only s* rides the
  // serial lane: the c* pool members — including all three tagged-metric
  // contracts c08/c11/c12 — race each other and every cache-heavy
  // neighbor on the shared workers.
  private val pool = Seq(
    "q01_pricing_summary", "q05_region_revenue", "q14_window_rank",
    "q31_approx_distinct", "q34_salted_agg", "q46_lateral_join",
    "d04_dedup_exact", "d06_dedup_minhash_lsh", "d10_dedup_components",
    "d21_window_dedup", "d22_token_bpe",
    "e01_knn_brute", "e05_centroid_udaf", "e09_vector_quantize",
    "e10_quantized_knn", "m03_decoded_stats", "d08_fingerprint64",
    "c01_cached_scan_agg", "c06_compaction", "c08_warm_hitrate",
    "c11_admission_gate", "c12_vectored_scan", "s03_stream_dedup")

  test("s* is the only serial-lane family; c* races on the shared lane") {
    val lane = graft.SparkEntry.allDefs.map(_.name)
      .filter(graft.ConcurrentHarness.serialLane)
    // every classified name must carry a numbered stream prefix
    // (s01...) — a hypothetical future family starting with a bare s
    // would silently serialize, so pin the digit too
    assert(lane.nonEmpty && lane.forall(n =>
      n.matches("s\\d\\d_.*")),
      s"unexpected names classified serial-lane: $lane")
    assert(pool.count(graft.ConcurrentHarness.serialLane) == 1,
      "spec pool must exercise the serial lane (s03)")
    assert(pool.count(_.startsWith("c")) == 5,
      "spec pool must race the cache family on the shared lane")
  }

  test("8 threads x 2 rounds: every result fingerprint equals its sequential run") {
    val queries = graft.SparkEntry.queries
    val expected = pool.map { n =>
      n -> graft.PinScope.run(spark)(
        graft.ConcurrentHarness.resultHash(queries(n)(spark, dir)))
    }.toMap
    // sanity: fingerprints are real (no empty-result aliasing)
    assert(expected.values.forall(_._1 > 0), s"empty sequential result: $expected")
    val out = graft.ConcurrentHarness.run(threads = 8, rounds = 2,
      pool.map(n => n -> (() => queries(n)(spark, dir))), expected)
    graft.PinScope.run(spark)(())
    assert(out.errors.isEmpty, s"concurrent errors:\n${out.errors.mkString("\n")}")
    assert(out.mismatches.isEmpty,
      s"concurrent results diverged from sequential:\n${out.mismatches.mkString("\n")}")
    assert(out.executed == pool.size * 2)
    assert(graft.PinScope.pinnedCount(spark) == 0,
      "concurrent phase must leave no pinned storage after the sweep")
  }
}
