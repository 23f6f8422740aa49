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

  /** Recursive listing of the cache data directory — the ground truth for
    * "did this scan create cache state". */
  private def cacheFiles(): Set[String] = {
    val root = new java.io.File(cacheDir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(root).map(_.getPath).toSet
  }

  test("narrow projections are refused cache admission (minColumns rule)") {
    val m = CacheManager.current.get.metrics
    val warmupBefore = m.warmupBytes.get
    val remoteBefore = m.bytesFromRemote.get
    val filesBefore = cacheFiles()
    // 2-column projection below the 5-column admission floor
    val narrow = spark.read.format("graft")
      .option("graft.cache.min.projected.columns", "5")
      .load(table)
      .select("l_orderkey", "l_quantity")
    narrow.write.format("noop").mode("overwrite").save()
    // (schema-inference footer reads still go through the warm cache via
    // the session-level FS — that is desirable; only the data scan must
    // bypass, so no bytes may be warmed, none fetched from the source,
    // and no cache files may appear)
    assert(m.warmupBytes.get == warmupBefore,
      "narrow scan must not warm the cache")
    assert(m.bytesFromRemote.get == remoteBefore,
      "narrow scan data path must bypass cache bookkeeping")
    assert(cacheFiles() == filesBefore,
      "narrow scan must not create cache files")
    // wide projection passes admission and hits the (already warm) cache
    val before = m.bytesFromCache.get
    spark.read.format("graft")
      .option("graft.cache.min.projected.columns", "5")
      .load(table)
      .write.format("noop").mode("overwrite").save()
    assert(m.bytesFromCache.get > before, "wide scan must use the cache")
  }

  test("minColumns floor is honored from the session conf, not just options") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.setInt(graft.cache.CacheConfig.MinColumnsKey, 5)
    try {
      // metrics must come from the manager bound to the JVM-cached session
      // FS — per-scan confs (the narrow path) swap CacheManager.current to
      // a different instance, but wide scans ride the session FS
      val m = org.apache.hadoop.fs.FileSystem.get(
        java.net.URI.create("graft:///"), spark.sessionState.newHadoopConf())
        .asInstanceOf[graft.cache.GraftFileSystem].cacheManager.metrics
      val warmupBefore = m.warmupBytes.get
      val filesBefore = cacheFiles()
      spark.read.format("graft").load(table)
        .select("l_orderkey", "l_quantity")
        .write.format("noop").mode("overwrite").save()
      assert(m.warmupBytes.get == warmupBefore,
        "session-keyed narrow scan must not warm the cache")
      assert(cacheFiles() == filesBefore,
        "session-keyed narrow scan must not create cache files")
      val cachedBefore = m.bytesFromCache.get
      spark.read.format("graft").load(table)
        .write.format("noop").mode("overwrite").save()
      assert(m.bytesFromCache.get > cachedBefore,
        "session-keyed wide scan must use the cache")
    } finally hc.unset(graft.cache.CacheConfig.MinColumnsKey)
  }

  test("format option routes to orc/csv/json delegates through the cache") {
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val expected = src.orderBy("n_nationkey").collect().map(_.toString)

    src.write.mode("overwrite").orc(s"$tmp/nation.orc")
    src.write.mode("overwrite").option("header", "true").csv(s"$tmp/nation.csv")
    src.write.mode("overwrite").json(s"$tmp/nation.json")

    // metrics on CacheManager.current can belong to a manager swapped in
    // by a per-scan conf (minColumns test above), while the JVM-cached
    // graft:// FS keeps its original manager — so prove cache traffic by
    // watching the cache DIRECTORY the FS-bound manager writes into.
    val before = cacheFiles()

    val orc = spark.read.format("graft").option("format", "orc")
      .load(s"$tmp/nation.orc").orderBy("n_nationkey").collect().map(_.toString)
    assert(orc.sameElements(expected))

    val csv = spark.read.format("graft").option("format", "csv")
      .option("header", "true").option("inferSchema", "true")
      .load(s"$tmp/nation.csv")
      .select(col("n_nationkey").cast("int"), col("n_name"),
        col("n_regionkey").cast("int"))
      .orderBy("n_nationkey").collect().map(_.toString)
    assert(csv.sameElements(expected))

    val json = spark.read.format("graft").option("format", "json")
      .schema(src.schema).load(s"$tmp/nation.json")
      .orderBy("n_nationkey").collect().map(_.toString)
    assert(json.sameElements(expected))

    // the non-parquet reads really went through the block cache: new
    // cache data files appeared for each materialized format
    val grown = cacheFiles() -- before
    Seq("nation.orc", "nation.csv", "nation.json").foreach { n =>
      assert(grown.exists(_.contains(n)),
        s"expected cache files for $n, new files: $grown")
    }

    intercept[IllegalArgumentException] {
      spark.read.format("graft").option("format", "avro")
        .load(s"$tmp/nation.orc").collect()
    }
  }
}
