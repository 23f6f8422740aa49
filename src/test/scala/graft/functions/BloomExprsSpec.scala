package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the Bloom dedup building blocks (d37): the native
  * expression agrees with driver-side `mightContainLong`, no false
  * negatives ever, false positives under a generous multiple of the
  * configured fpp, and the sketch is deterministic across rebuilds
  * (gate-hash prerequisite). Runs on real gate data (sf0.001). */
class BloomExprsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def keyed = graft.operators.Tables.load(spark, dir, "documents")
    .select(col("doc_id"), xxhash64(col("text")).as("k"))

  test("native expression == driver-side mightContainLong on every key") {
    val ref = keyed.filter(col("doc_id") % 2 === 0)
    val bc = BloomExprs.broadcastBloom(spark, ref, "k", 1000L, 0.01)
    val rows = keyed
      .select(col("k"), BloomExprs.mightContainCol(col("k"), bc).as("hit"))
      .collect()
    val bf = bc.value
    rows.foreach { r =>
      assert(r.getBoolean(1) === bf.mightContainLong(r.getLong(0)),
        s"native/driver disagreement for key ${r.getLong(0)}")
    }
  }

  test("no false negatives: every inserted key hits") {
    val ref = keyed.filter(col("doc_id") % 2 === 0)
    val bc = BloomExprs.broadcastBloom(spark, ref, "k", 1000L, 0.01)
    val misses = ref
      .filter(!BloomExprs.mightContainCol(col("k"), bc))
      .count()
    assert(misses === 0L)
  }

  test("false positives bounded: non-members hit at well under 5x fpp") {
    val ref = keyed.filter(col("doc_id") % 2 === 0)
    val bc = BloomExprs.broadcastBloom(spark, ref, "k", 1000L, 0.01)
    // texts are unique in this corpus, so every odd key is a non-member
    val inc = keyed.filter(col("doc_id") % 2 === 1)
    val n = inc.count()
    val fp = inc.filter(BloomExprs.mightContainCol(col("k"), bc)).count()
    assert(fp <= math.max(5L, n / 20),
      s"$fp false positives out of $n non-members")
  }

  test("1M-key sketch: no false negatives, FP rate in band, size as modeled") {
    // the 100 TB sizing argument made concrete: 10^6 keys at 1% fpp is
    // ~1.2 MB (so 10^9 is ~1.2 GB — one broadcast); membership behavior
    // must hold at this density, not just at the 250-doc gate corpus
    val keys = spark.range(0, 1000000L)
      .selectExpr("xxhash64(id) AS k")
    val bc = BloomExprs.broadcastBloom(spark, keys, "k", 1000000L, 0.01)
    val sizeBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bc.value.writeTo(bos)
      bos.size()
    }
    assert(sizeBytes > 800000 && sizeBytes < 2500000,
      s"sketch size $sizeBytes bytes outside the ~1.2 MB model")
    val misses = keys.filter(!BloomExprs.mightContainCol(col("k"), bc)).count()
    assert(misses === 0L, s"$misses false negatives at 1M keys")
    val outside = spark.range(1000000L, 1100000L)
      .selectExpr("xxhash64(id) AS k")
    val fp = outside.filter(BloomExprs.mightContainCol(col("k"), bc)).count()
    assert(fp <= 3000L, s"$fp false positives per 100k non-members (fpp=0.01)")
  }

  test("sketch is deterministic across rebuilds (gate-hash prerequisite)") {
    val ref = keyed.filter(col("doc_id") % 2 === 0)
    val a = ref.stat.bloomFilter("k", 1000L, 0.01)
    val b = ref.repartition(7).stat.bloomFilter("k", 1000L, 0.01)
    val probe = keyed.select("k").collect().map(_.getLong(0))
    probe.foreach { k =>
      assert(a.mightContainLong(k) === b.mightContainLong(k),
        s"rebuild changed membership for $k")
    }
  }
}
