package graft

import org.apache.spark.sql.functions._
import graft.cache.{CacheManager, ClusterState}

/** Diagnostic CLI: drives a Spark aggregation through graft:// twice
  * (cold then warm) and prints cache metrics as JSON. Args:
  *   [sfDir] [parallelWarmup true|false]
  * Demonstrates SURVEY §7 phase 4's acceptance: warm run reads ~0 bytes
  * from the source.
  */
object CacheDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val parallelWarmup = args.lift(1).exists(_.toBoolean)
    val cacheDir = java.nio.file.Files.createTempDirectory("graft-demo").toString
    val spark = GraftSession.builder(master = "local[8]",
        shufflePartitions = 8, cacheDir = Some(cacheDir))
      .config("spark.hadoop.graft.cache.parallel.warmup", parallelWarmup.toString)
      .config("spark.hadoop.graft.cache.warmup.delay.ms", "0")
      .config("spark.hadoop.graft.cache.warmup.drain.ms", "50")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new ClusterState.Listener)

    def scan(): Long = spark.read.parquet(s"graft://$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 10).groupBy("l_returnflag")
      .agg(sum("l_extendedprice")).count()

    def j(tag: String, extra: Map[String, Any] = Map.empty): String = {
      val m: Map[String, Long] =
        CacheManager.current.map(_.metrics.snapshot.toMap).getOrElse(Map.empty)
      val kv = (m.map { case (k, v) => s""""$k":$v""" } ++
        extra.map { case (k, v) => s""""$k":$v""" }).mkString(",")
      s"""{"tag":"$tag",$kv}"""
    }

    val t0 = System.nanoTime(); scan()
    println(j("cold", Map("sec" -> (System.nanoTime() - t0) / 1e9)))
    if (parallelWarmup) { // let the async warmup queue drain
      Thread.sleep(2000)
      println(j("after_warmup_drain"))
    }
    val m = CacheManager.current.get.metrics
    val remoteBefore = m.bytesFromRemote.get
    val t1 = System.nanoTime(); scan()
    println(j("warm", Map(
      "sec" -> (System.nanoTime() - t1) / 1e9,
      "warm_remote_delta" -> (m.bytesFromRemote.get - remoteBefore),
      "hit_rate" -> m.hitRate)))

    // self-validation + heartbeat to the (driver-side) coordinator —
    // the production health loop (CachingValidator/FileValidator analog)
    val mgr = CacheManager.current.get
    val cachingOk = cache.CacheValidator.validateCaching(mgr.conf)
    val filesOk = cache.CacheValidator.filesConsistent(mgr.conf)
    val coord = new cache.CacheCoordinator()
    coord.heartbeat("localhost", cachingOk, filesOk, mgr.metrics.snapshot.toMap)
    println(j("validation", Map(
      "caching_validated" -> cachingOk,
      "files_consistent" -> filesOk,
      "live_workers" -> coord.liveWorkers.size,
      "cluster_bytes_from_cache" ->
        coord.clusterMetrics.getOrElse("bytes_from_cache", 0L))))
    spark.stop()
  }
}
