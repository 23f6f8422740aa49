package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Tables.guardIdsBelow — the planted-twin offset guard (d07/d47/d49).
  * Two contracts: it raises loudly when a real id breaches the twin id
  * space, and it does NOT fire on post-offset twin rows even when the
  * guarded frame is equi-joined against a subtree containing the twins
  * (the InferFiltersFromConstraints hazard: a filter-based guard gets
  * copied across the join onto the twin-bearing side — measured on d07
  * before the guard moved into the doc_id projection). */
class TwinGuardSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("raises when a doc_id breaches the bound") {
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    // consume doc_id: a bare count() would column-prune the guarded
    // projection away (the guard rides the column, not the row)
    val e = intercept[Exception] {
      Tables.guardIdsBelow(docs, 100L).agg(sum("doc_id")).collect()
    }
    assert(e.getMessage.contains("twin-offset assumption violated"))
  }

  test("does not fire across an equi-join onto the twin-bearing side") {
    val offset = 1000000L
    val docs = Tables.guardIdsBelow(
      Tables.load(spark, dir, "documents").select("doc_id", "lang", "text"),
      offset)
    val twins = docs.withColumn("doc_id", col("doc_id") + offset)
    val union = docs.unionByName(twins).select("doc_id", "lang")
    // join guarded side to the union on a key equal to the guarded column:
    // constraint inference across this join is exactly the measured hazard
    val joined = docs.select(col("doc_id").as("k"))
      .join(union.withColumnRenamed("doc_id", "k"), Seq("k"))
    // write (the Verify path) — the count() path can eliminate the join
    val out = java.nio.file.Files
      .createTempDirectory("graft-twinguard-").toString
    try {
      joined.write.mode("overwrite").parquet(s"$out/j")
      assert(spark.read.parquet(s"$out/j").count() > 0)
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }
}
