package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** c06's non-SQL half: compaction must actually reduce the file count
  * (the oracle only proves content preservation). */
class CompactionSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("compaction collapses the shattered layout to a few files") {
    graft.SparkEntry.queries("c06_compaction")(spark, dir).collect()
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
      "/graft-compact/" + new java.io.File(dir).getName
    def parquetFiles(p: String): Int =
      Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    val before = parquetFiles(s"$base/shattered")
    val after = parquetFiles(s"$base/compacted")
    assert(before == 64, s"expected 64 shattered files, got $before")
    assert(after == 2, s"expected 2 compacted files, got $after")
  }
}
