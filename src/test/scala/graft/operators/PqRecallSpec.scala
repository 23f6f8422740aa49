package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e11's product-quantization arm: the in-band gate asserts recall@5 >=
  * 0.6; this pins the measured value with margin (1.0 at sf0.001 when
  * written — m=16 subspaces x k=32 codewords, ADC shortlist 64, exact
  * re-rank) and the monotone dial: a finer quantizer or longer shortlist
  * must never do worse than the committed config by more than noise.
  * SemDedupRecallSpec's sibling for retrieval. */
class PqRecallSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("committed PQ config clears the in-band threshold with margin") {
    val r = graft.PinScope.run(spark) { VectorQueries.pqRecall(spark, dir) }
    assert(r >= 0.8, s"recall@5 $r under the 0.8 spec floor (gate floor 0.6)")
  }

  test("coarse codebooks are measurably worse (the contract is not vacuous)") {
    val coarse = graft.PinScope.run(spark) {
      VectorQueries.pqRecall(spark, dir, m = 8, k = 16, shortlistN = 16)
    }
    assert(coarse < 0.8, s"coarse 8x16/top-16 config at $coarse — " +
      "threshold would no longer discriminate quantizer quality")
  }
}
