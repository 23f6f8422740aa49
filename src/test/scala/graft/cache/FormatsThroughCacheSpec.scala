package graft.cache

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** The graft:// wrapper is format-agnostic (it caches bytes below the
  * reader, like the reference's CachingS3AFileSystem under any engine):
  * CSV, JSON, and ORC scans must return exactly what a direct read
  * returns AND warm the block cache. Parquet is covered everywhere else;
  * this pins the other formats the SURVEY scans row names. */
class FormatsThroughCacheSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var cacheDir: String = _
  private var dataDir: String = _

  override def beforeAll(): Unit = {
    cacheDir = java.nio.file.Files.createTempDirectory("graft-fmt-cache").toString
    dataDir = java.nio.file.Files.createTempDirectory("graft-fmt-data").toString
    org.apache.hadoop.fs.FileSystem.closeAll()
    CacheManager.resetForTest()
    spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4,
      cacheDir = Some(cacheDir)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    nation.coalesce(1).write.option("header", "true").csv(s"$dataDir/nation_csv")
    nation.coalesce(1).write.json(s"$dataDir/nation_json")
    nation.coalesce(1).write.orc(s"$dataDir/nation_orc")
  }
  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    CacheManager.resetForTest()
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.selectExpr("n_nationkey", "n_name", "n_regionkey")
      .collect().map(_.toString).toSeq.sorted

  for ((fmt, path, opts) <- Seq(
      ("csv", "nation_csv", Map("header" -> "true", "inferSchema" -> "true")),
      ("json", "nation_json", Map.empty[String, String]),
      ("orc", "nation_orc", Map.empty[String, String]))) {
    test(s"$fmt scans through graft:// byte-transparently and warm the cache") {
      val direct = rows(spark.read.format(fmt).options(opts)
        .load(s"$dataDir/$path"))
      val warmupBefore = CacheManager.current
        .map(_.metrics.warmupBytes.get).getOrElse(0L)
      val cached = rows(spark.read.format(fmt).options(opts)
        .load(s"graft://$dataDir/$path"))
      assert(cached == direct, s"$fmt through the cache must be byte-transparent")
      assert(direct.size == 25)
      val m = CacheManager.current.get.metrics
      assert(m.warmupBytes.get > warmupBefore,
        s"$fmt scan must warm the block cache")
    }
  }
}
