package graft.cache

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Structured Streaming sources read through graft:// like any other
  * scan: the first streaming pass warms the block cache, a second
  * streaming query over the same path moves zero source bytes — the
  * cache's payoff for recurring micro-batch scans of cold storage. */
class StreamingThroughCacheSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var cacheDir: String = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    cacheDir = java.nio.file.Files.createTempDirectory("graft-stream-cache").toString
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

  private def runStream(name: String): Long = {
    val schema = spark.read.parquet(s"$dir/lineitem.parquet").schema
    val agg = spark.readStream.schema(schema)
      .option("pathGlobFilter", "lineitem.parquet")
      .parquet(s"graft://$dir")
      .groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
    val q = agg.writeStream.outputMode("complete").format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination(60000) finally if (q.isActive) q.stop()
    spark.table(name).agg(sum("q")).first().getDouble(0).round
  }

  test("streaming scans warm the cache; second stream moves 0 source bytes") {
    val expected = spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(sum("l_quantity")).first().getDouble(0).round

    val cold = runStream("stream_cold")
    assert(cold == expected, "streamed aggregate must equal the batch result")
    val m = CacheManager.current.get.metrics
    assert(m.warmupBytes.get > 0, "first streaming pass must warm the cache")
    val remoteAfterCold = m.bytesFromRemote.get

    val warm = runStream("stream_warm")
    assert(warm == expected)
    assert(m.bytesFromRemote.get == remoteAfterCold,
      "second streaming query must be served entirely from the cache")
    assert(m.bytesFromCache.get > 0)
  }
}
