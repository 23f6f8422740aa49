package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** q44's scale claim, pinned: with the size thresholds out of the way
  * (they gate on >10 GB application-side scans, i.e. the real cluster
  * case), Spark's runtime bloom filter injects a might_contain probe on
  * the fact side of the selective dim join and the results are
  * unchanged. GraftSession enables the rule; this spec proves the
  * injection actually happens on the q44 shape rather than trusting the
  * conf flag. */
class RuntimeFilterSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def q44(s: SparkSession): DataFrame = {
    val urgent = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    Tables.load(s, dir, "lineitem")
      .join(urgent.hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"))
  }

  test("bloom filter injects on the q44 shape once size thresholds allow") {
    val tuned = spark.newSession()
    tuned.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    tuned.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    // the injection rule bails when either side is broadcastable by size
    // (a broadcast join already semi-join-reduces); disabling broadcast
    // models the cluster case where neither side fits
    tuned.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan = q44(tuned).queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"),
      s"no runtime bloom filter in the optimized plan:\n$plan")
    // and with the filter active the results still match the plain run
    val filtered = q44(tuned).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = q44(spark).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(filtered == plain)
  }
}
