package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing: pre-bucketing both sides of a hot join
  * key eliminates the per-query shuffle — the standard answer to "this
  * join's shuffle becomes the bottleneck at 100 TB". The spec proves the
  * bucketed join plans with ZERO Exchange operators while the unbucketed
  * one shuffles both sides, and that results are identical.
  */
class BucketingSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var wh: String = _
  private val dir = "/root/testdata/sf0.01"

  override def beforeAll(): Unit = {
    wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("bucketed join eliminates both exchanges and matches results") {
    val l = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    l.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("b_lineitem")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("b_orders")

    val plain = spark.sql(
      """SELECT o_orderstatus, round(sum(l_extendedprice),3) AS rev
        |FROM (SELECT * FROM parquet.`/root/testdata/sf0.01/orders.parquet`) o
        |JOIN (SELECT * FROM parquet.`/root/testdata/sf0.01/lineitem.parquet`) l
        |  ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus""".stripMargin)
    val bucketed = spark.sql(
      """SELECT o_orderstatus, round(sum(l_extendedprice),3) AS rev
        |FROM b_orders JOIN b_lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus""".stripMargin)

    assert(bucketed.collect().map(_.toString).sorted
      .sameElements(plain.collect().map(_.toString).sorted))

    val plainPlan = plain.queryExecution.executedPlan.toString
    val bucketedPlan = bucketed.queryExecution.executedPlan.toString
    def joinShuffles(p: String): Int = {
      // exchanges feeding the join (before the aggregation's own exchange)
      val joinIdx = p.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, p)
      p.substring(joinIdx).split("\n").count(_.contains("Exchange hashpartitioning"))
    }
    assert(joinShuffles(plainPlan) == 2,
      s"unbucketed join must shuffle both sides:\n$plainPlan")
    assert(joinShuffles(bucketedPlan) == 0,
      s"bucketed join must be shuffle-free:\n$bucketedPlan")
  }
}
