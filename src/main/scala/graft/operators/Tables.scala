package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-data table loader. Tables are driver-generated parquet under
  * `/root/testdata/sf*` (see TESTDATA.md). All queries load through here so
  * a caching scheme (graft://) can be swapped in via [[Tables.pathPrefix]].
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Optional scheme prefix, e.g. "graft://" to route reads through the
    * caching filesystem (see graft.cache.GraftFileSystem). Empty = direct. */
  @volatile var pathPrefix: String = ""

  def path(dir: String, name: String): String = {
    val base = s"$dir/${name}.parquet"
    if (pathPrefix.isEmpty) base
    else pathPrefix + (if (base.startsWith("/")) base else "/" + base)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    // rejects; read it as raw nanos and truncate to micros — exactly what
    // DuckDB does when it loads the same file (so oracles agree).
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path(dir, name))
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else df
    } else spark.read.parquet(path(dir, name))
  }
}
