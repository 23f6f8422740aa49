package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e13's hamming-shortlist arm: the in-band gate asserts recall@5 >= 0.6;
  * this pins the committed config (64 sign bits, shortlist 128, exact
  * re-rank — measured 0.96 at sf0.001 when written) with margin, and
  * that a much smaller shortlist is measurably worse, so the threshold
  * discriminates the binary code's ranking quality rather than passing
  * vacuously. MrlRecallSpec/PqRecallSpec's sibling for the 1-bit tier. */
class HammingRecallSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("committed hamming config clears the in-band threshold with margin") {
    val r = graft.PinScope.run(spark) { VectorQueries.hammingRecall(spark, dir) }
    assert(r >= 0.8, s"recall@5 $r under the 0.8 spec floor (gate floor 0.6)")
  }

  test("a top-5 shortlist (no rerank headroom) is measurably worse") {
    val narrow = graft.PinScope.run(spark) {
      VectorQueries.hammingRecall(spark, dir, shortlistN = 5)
    }
    assert(narrow < 0.8, s"top-5 shortlist at $narrow — " +
      "threshold would no longer discriminate binary-code ranking quality")
  }
}
