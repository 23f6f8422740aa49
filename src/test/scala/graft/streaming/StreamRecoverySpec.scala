package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint recovery: a stopped streaming query resumed against the
  * same checkpoint must process ONLY the data that arrived while it was
  * down, and the file sink's commit manifest must keep the output
  * exactly-once — the property every production restart leans on. The
  * test runs one pipeline in two separate query incarnations over a
  * shared checkpoint, delivering half the input to each, and compares
  * the final sink against the batch answer over everything. */
class StreamRecoverySpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("restart from checkpoint processes only new files; sink stays exactly-once") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-recovery").toString
    val inDir = s"$base/in"
    val outDir = s"$base/out"
    val ckpt = s"$base/ckpt"
    val events = graft.operators.Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"))
    val n = events.count()
    val firstHalf = events.filter(col("event_id") % 2 === 0)
    val secondHalf = events.filter(col("event_id") % 2 === 1)
    val schema = events.schema

    def deliver(df: org.apache.spark.sql.DataFrame, name: String): Unit =
      df.coalesce(1).write.parquet(s"$inDir/$name")

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(s"$inDir/*")
        .withColumn("flagged", col("event_type") === "click")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      require(q.awaitTermination(120000), "stream timed out")
      if (q.isActive) q.stop()
    }

    deliver(firstHalf, "a")
    runOnce() // incarnation 1: sees only the first half
    val afterFirst = spark.read.parquet(outDir).count()
    assert(afterFirst === firstHalf.count(),
      s"first incarnation wrote $afterFirst rows")

    deliver(secondHalf, "b")
    runOnce() // incarnation 2: same checkpoint, must pick up ONLY b/
    val out = spark.read.parquet(outDir)
    assert(out.count() === n,
      s"expected exactly-once total $n, got ${out.count()} — " +
        "a replay of already-committed input would double rows")
    // content equality, not just counts
    assert(out.select("event_id").except(events.select("event_id")).count() === 0)
    assert(events.select("event_id").except(out.select("event_id")).count() === 0)
  }
}
