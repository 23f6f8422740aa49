package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e16's composed IVF→ADC→rerank pipeline: the in-band gate asserts
  * recall@5 >= 0.6; this pins the measured value with margin at the
  * committed config (coarseK=16 cells, nprobe=8, m=16 × k=32 PQ,
  * shortlist 64) and the dial that distinguishes the composition from
  * plain PQ: starving the IVF stage (nprobe=1) must visibly cost
  * recall, proving candidates really are cell-restricted. */
class IvfPqRecallSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("committed IVFADC config clears the in-band threshold with margin") {
    val r = graft.PinScope.run(spark) { VectorQueries.ivfPqRecall(spark, dir) }
    assert(r >= 0.8, s"recall@5 $r under the 0.8 spec floor (gate floor 0.6)")
  }

  test("starved probing (nprobe=1) is measurably worse — candidates are cell-restricted") {
    val starved = graft.PinScope.run(spark) {
      VectorQueries.ivfPqRecall(spark, dir, nprobe = 1)
    }
    assert(starved < 0.8, s"nprobe=1 at $starved — the IVF stage is not " +
      "restricting candidates (or cells are degenerate)")
  }
}
