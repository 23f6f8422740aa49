package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession
import graft.cache.CacheManager

/** The c08 gate query's in-band contract, pinned from a clean cache: the
  * warm scan's measured hit rate must clear the >= 95% bar BASELINE.md
  * records for repeat scans, and every output row must carry it. */
class CacheGateSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    val cacheDir = java.nio.file.Files.createTempDirectory("graft-c08-spec").toString
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

  test("c08: warm scan hit rate >= 95% lands true in every row") {
    val rows = graft.SparkEntry.queries("c08_warm_hitrate")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("warm_hits_ok"),
      s"warm hit rate below bar: $r"))
  }
}
