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
    // events.ts has been generated as parquet TIMESTAMP(NANOS) (which
    // Spark's vectorized reader rejects → read as raw nanos, truncate to
    // micros) and, since the 2026-08-13 regeneration, as naive
    // timestamp[us] (isAdjustedToUTC=false → Spark infers TIMESTAMP_NTZ).
    // Normalize both to plain TIMESTAMP: the session timezone is pinned to
    // UTC (GraftSession/Verify/Bench), so NTZ→TZ keeps the micros value
    // bit-identical to DuckDB's naive read of the same file, and every
    // downstream consumer (unix_micros, watermarks, java.sql.Timestamp
    // encoders) sees the same type it was built against.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path(dir, name))
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        normalizeNtz(df.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)")))
      else normalizeNtz(df)
    } else normalizeNtz(spark.read.parquet(path(dir, name)))
  }

  /** Loud guard for planted-twin id arithmetic (d47/d49/s13 device): any
    * corpus row with doc_id >= `bound` would collide with the twin id
    * space (or drift an engine-side old/new classification), so raise at
    * scan time instead of silently degrading. The guard is embedded IN
    * the doc_id projection — NOT a filter — because a filter predicate
    * enters the relation's constraint set and InferFiltersFromConstraints
    * will copy it across equi-joins onto subtrees that contain the
    * post-offset twins (measured: d07's cands side re-raised on
    * doc_id=1000000). A projection travels with the column and is never
    * re-inferred elsewhere; the CASE WHEN is codegen'd per row. Caveat:
    * the guard fires only where doc_id is consumed — a plan that prunes
    * the column skips it (every twin-planting query consumes doc_id). */
  def guardIdsBelow(df: DataFrame, bound: Long): DataFrame = {
    import org.apache.spark.sql.functions._
    df.withColumn("doc_id",
      when(col("doc_id") < lit(bound), col("doc_id"))
        .otherwise(raise_error(concat(
          lit(s"twin-offset assumption violated (bound $bound): doc_id="),
          col("doc_id").cast("string"))).cast("long")))
  }

  /** Cast every TIMESTAMP_NTZ column to TIMESTAMP. Value-preserving only
    * because the session timezone is pinned to UTC. */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.TimestampNTZType
    df.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(df) {
      (d, f) => d.withColumn(f.name, d(f.name).cast("timestamp"))
    }
  }
}
