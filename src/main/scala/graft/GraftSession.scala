package graft

import org.apache.spark.sql.SparkSession

/** Session factory wiring the caching filesystem + scale-appropriate SQL
  * defaults. `graft://` paths then read through the executor-local block
  * cache on any Spark scan (see graft.cache.GraftFileSystem).
  */
object GraftSession {

  def builder(master: String = "local[*]",
      shufflePartitions: Int = 32,
      cacheDir: Option[String] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.graft.impl", "graft.cache.GraftFileSystem")
      .config("spark.hadoop.graft.underlying.scheme", "file")
    cacheDir.foreach(d => b.config("spark.hadoop.graft.cache.dir", d))
    b
  }
}
