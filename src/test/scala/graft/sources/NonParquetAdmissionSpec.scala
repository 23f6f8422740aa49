package graft.sources

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.cache.CacheManager

/** Per-scan cache admission for the NON-parquet DSv2 formats (SURVEY §4's
  * last optional item, closed r15 at ScanBuilder time — see the
  * GraftDataSource scaladoc for why a plan-time Catalyst rule cannot
  * carry a conf-only scan rewrite): ORC, CSV and JSON reads through
  * format("graft") must be refused cache admission when their pushed
  * projection is narrower than the configured floor, while wide
  * projections on the same session still warm and then hit the cache. */
class NonParquetAdmissionSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var cacheDir: String = _
  private var data: String = _

  override def beforeAll(): Unit = {
    cacheDir = java.nio.file.Files.createTempDirectory("graft-admhint").toString
    org.apache.hadoop.fs.FileSystem.closeAll()
    CacheManager.resetForTest()
    spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4,
        cacheDir = Some(cacheDir))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.hadoopConfiguration
      .setInt(graft.cache.CacheConfig.MinColumnsKey, 3)
    data = java.nio.file.Files.createTempDirectory("graft-admdata").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    src.write.mode("overwrite").orc(s"$data/nation.orc")
    src.write.mode("overwrite").option("header", "true").csv(s"$data/nation.csv")
    src.write.mode("overwrite").json(s"$data/nation.json")
  }
  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    CacheManager.resetForTest()
  }

  private def cacheFiles(): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(cacheDir)).map(_.getPath).toSet
  }

  private def sessionMetrics = org.apache.hadoop.fs.FileSystem.get(
    java.net.URI.create("graft:///"), spark.sessionState.newHadoopConf())
    .asInstanceOf[graft.cache.GraftFileSystem].cacheManager.metrics

  private val schema = org.apache.spark.sql.types.StructType.fromDDL(
    "n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT, n_comment STRING")

  private def roundTrip(fmt: String, path: String): Unit = {
    val m = sessionMetrics
    // narrow: 1 projected column, below the 3-column floor -> admission
    // must disable the cache for THIS scan only (no warmup, no files)
    val warmupBefore = m.warmupBytes.get
    val filesBefore = cacheFiles()
    spark.read.format("graft").option("format", fmt)
      .option("header", "true").schema(schema).load(path)
      .select("n_name")
      .write.format("noop").mode("overwrite").save()
    assert(m.warmupBytes.get == warmupBefore,
      s"narrow $fmt scan must not warm the cache")
    assert(cacheFiles() == filesBefore,
      s"narrow $fmt scan must not create cache files")
    // wide: full schema passes the floor -> warms, then a re-read hits
    spark.read.format("graft").option("format", fmt)
      .option("header", "true").schema(schema).load(path)
      .write.format("noop").mode("overwrite").save()
    assert(m.warmupBytes.get > warmupBefore,
      s"wide $fmt scan must warm the cache")
    val cachedBefore = m.bytesFromCache.get
    spark.read.format("graft").option("format", fmt)
      .option("header", "true").schema(schema).load(path)
      .write.format("noop").mode("overwrite").save()
    assert(m.bytesFromCache.get > cachedBefore,
      s"warm $fmt re-scan must hit the cache")
  }

  test("orc: narrow projection bypasses the cache per-scan, wide admits") {
    roundTrip("orc", s"$data/nation.orc")
  }

  test("csv: narrow projection bypasses the cache per-scan, wide admits") {
    roundTrip("csv", s"$data/nation.csv")
  }

  test("json: narrow projection bypasses the cache per-scan, wide admits") {
    roundTrip("json", s"$data/nation.json")
  }

  test("no floor configured: narrow scans still admit (default behavior)") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.unset(graft.cache.CacheConfig.MinColumnsKey)
    try {
      val m = sessionMetrics
      val warmupBefore = m.warmupBytes.get
      // a fresh file so the narrow scan has something to warm
      val src = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
      src.write.mode("overwrite").orc(s"$data/region.orc")
      spark.read.format("graft").option("format", "orc")
        .schema(src.schema).load(s"$data/region.orc")
        .select("r_name")
        .write.format("noop").mode("overwrite").save()
      assert(m.warmupBytes.get > warmupBefore,
        "with no floor configured the narrow scan must still admit")
    } finally hc.setInt(graft.cache.CacheConfig.MinColumnsKey, 3)
  }
}
