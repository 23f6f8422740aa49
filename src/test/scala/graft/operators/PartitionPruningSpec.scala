package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** c05's scale claim, pinned: a partition predicate over the hive-style
  * layout written through graft:// must prune at the FileIndex — the
  * scan may touch ONLY the matching yr= directories, so at 100 TB the
  * cache never even sees the other years' blocks. */
class PartitionPruningSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"
  private val out = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
    "/graft-part-spec/lineitem_by_yr"

  override def beforeAll(): Unit = {
    spark = graft.GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graft.impl", "graft.cache.GraftFileSystem")
    if (hc.get("graft.cache.dir") == null)
      hc.set("graft.cache.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-cache")
    Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice"),
        year(col("l_shipdate")).as("yr"))
      .write.mode("overwrite").partitionBy("yr").parquet(s"graft://$out")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("partition filter reaches the FileIndex and scans one yr= dir") {
    val pruned = spark.read.parquet(s"graft://$out").filter(col("yr") === 1997)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec leaf in the pruned plan"))
    val pf = scan.metadata.getOrElse("PartitionFilters", "")
    assert(pf.contains("yr") && pf.contains("1997"),
      s"partition filter not pushed to the FileIndex: $pf")
    // the pruned listing must cover exactly the yr=1997 directory
    assert(scan.selectedPartitions.partitionCount == 1,
      s"expected 1 selected partition, got ${scan.selectedPartitions.partitionCount}")
    assert(scan.selectedPartitions.toPartitionArray.forall(
      _.filePath.toString.contains("yr=1997")))
  }

  test("pruned read returns the same rows as the predicate on the fact table") {
    val viaPartitions = spark.read.parquet(s"graft://$out")
      .filter(col("yr") === 1997)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = Tables.load(spark, dir, "lineitem")
      .filter(year(col("l_shipdate")) === 1997)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaPartitions == direct)
  }
}
