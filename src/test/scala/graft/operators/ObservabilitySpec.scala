package graft.operators

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability via Dataset.observe(): per-action data-quality
  * metrics (row counts, null counts, fixed-point sums) collected on the
  * executors during the SAME pass as the real work — the zero-extra-scan
  * way to monitor a 100 TB ingest job (a separate validation query would
  * double the read). Complements the cache-layer MetricsSystem gauges. */
class ObservabilitySpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("observe() collects quality metrics in the same pass as the query") {
    val obs = Observation("d01-quality")
    val out = Tables.load(spark, dir, "documents")
      .observe(obs,
        count(lit(1)).as("rows"),
        count_if(col("text").isNull || length(col("text")) === 0)
          .as("empty_docs"),
        sum(length(col("text")).cast("long")).as("total_chars"))
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    val collected = out.collect()
    val m = obs.get
    assert(m("rows") == collected.length.toLong)
    assert(m("empty_docs") == 0L)
    assert(m("total_chars") == collected.map(_.getAs[Long]("len")).sum)
  }

  test("observed metrics match on a filtered write path (no extra scan)") {
    val obs = Observation("filtered")
    val filtered = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 10 === 0)
      .observe(obs, count(lit(1)).as("kept"),
        sum((col("o_totalprice") * 100).cast("long")).as("cents"))
    filtered.write.format("noop").mode("overwrite").save()
    val m = obs.get
    val expectKept = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 10 === 0).count()
    assert(m("kept") == expectKept)
    assert(m("cents").asInstanceOf[Long] > 0L)
  }
}
