package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.cache.CacheManager

class GraftSourceSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var cacheDir: String = _
  private val table = "/root/testdata/sf0.001/lineitem.parquet"

  override def beforeAll(): Unit = {
    cacheDir = java.nio.file.Files.createTempDirectory("graft-dsv2").toString
    // drop graft:// FS instances cached (JVM-wide) by earlier suites —
    // they pin the previous suite's CacheManager
    org.apache.hadoop.fs.FileSystem.closeAll()
    CacheManager.resetForTest()
    spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4,
      cacheDir = Some(cacheDir)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    CacheManager.resetForTest()
  }

  test("format(graft) equals plain parquet and reads through the cache") {
    val direct = spark.read.parquet(table)
      .groupBy("l_returnflag").sum("l_quantity").collect().map(_.toString).sorted
    val viaGraft = spark.read.format("graft").load(table)
      .groupBy("l_returnflag").sum("l_quantity").collect().map(_.toString).sorted
    assert(viaGraft.sameElements(direct))
    val m = CacheManager.current.get.metrics
    assert(m.warmupBytes.get > 0, "DSv2 scan must warm the block cache")
    val remoteAfter = m.bytesFromRemote.get
    val warm = spark.read.format("graft").load(table)
      .groupBy("l_returnflag").sum("l_quantity").collect().map(_.toString).sorted
    assert(warm.sameElements(direct))
    assert(m.bytesFromRemote.get == remoteAfter, "second scan must be warm")
  }

  test("filter pushdown survives the wrapper") {
    val p = spark.read.format("graft").load(table)
      .filter(org.apache.spark.sql.functions.col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity)") ||
      p.contains("GreaterThan(l_quantity"), p)
  }

  test("narrow projections are refused cache admission (minColumns rule)") {
    val m = CacheManager.current.get.metrics
    val warmupBefore = m.warmupBytes.get
    val remoteBefore = m.bytesFromRemote.get
    // 2-column projection below the 5-column admission floor
    val narrow = spark.read.format("graft")
      .option("graft.cache.min.projected.columns", "5")
      .load(table)
      .select("l_orderkey", "l_quantity")
    narrow.write.format("noop").mode("overwrite").save()
    // (schema-inference footer reads still go through the warm cache via
    // the session-level FS — that is desirable; only the data scan must
    // bypass, so no bytes may be warmed and none fetched from the source)
    assert(m.warmupBytes.get == warmupBefore,
      "narrow scan must not warm the cache")
    assert(m.bytesFromRemote.get == remoteBefore,
      "narrow scan data path must bypass cache bookkeeping")
    // wide projection passes admission and hits the (already warm) cache
    val before = m.bytesFromCache.get
    spark.read.format("graft")
      .option("graft.cache.min.projected.columns", "5")
      .load(table)
      .write.format("noop").mode("overwrite").save()
    assert(m.bytesFromCache.get > before, "wide scan must use the cache")
  }
}
