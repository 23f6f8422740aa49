package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e12's truncated-prefix arm: the in-band gate asserts recall@5 >= 0.6;
  * this pins the committed config (prefix 32 of 64 dims, shortlist 100,
  * exact re-rank — measured 0.94 at sf0.001 when written) with margin,
  * and that narrow prefixes are measurably worse, so the threshold
  * discriminates truncation quality rather than passing vacuously.
  * PqRecallSpec's sibling for the slice-compressed representation. */
class MrlRecallSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("committed MRL config clears the in-band threshold with margin") {
    val r = graft.PinScope.run(spark) { VectorQueries.mrlRecall(spark, dir) }
    assert(r >= 0.8, s"recall@5 $r under the 0.8 spec floor (gate floor 0.6)")
  }

  test("an 8-dim prefix is measurably worse (the contract is not vacuous)") {
    val narrow = graft.PinScope.run(spark) {
      VectorQueries.mrlRecall(spark, dir, prefixDims = 8, shortlistN = 20)
    }
    assert(narrow < 0.8, s"8-dim/top-20 config at $narrow — " +
      "threshold would no longer discriminate prefix quality")
  }
}
