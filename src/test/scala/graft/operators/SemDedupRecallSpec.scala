package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Measures d26's approximate arm against its truth arm: the IVF-blocked
  * quantized-cosine candidate pairs must recover nearly all exact
  * label-blocked pairs at the same threshold. The gate rides a >= 0.6
  * in-band boolean; this spec records the actual values and pins a
  * tighter floor so a blocking/quantization regression shows up here
  * before it erodes the gate margin. Quantization alone loses ~1% of
  * pairs at tau = 0.35 (borderline cosines dip under the threshold);
  * the remainder is cell-boundary splits the asymmetric 8-probe
  * blocking misses. */
class SemDedupRecallSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("IVF-blocked quantized pairs recover >= 0.8 of exact pairs (all SFs)") {
    // sf0.1 included deliberately: it has the densest pair set (391 at
    // tau 0.35) and is where cell-boundary recall loss would bite first
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { dir =>
      graft.PinScope.run(spark) {
        val e = Tables.load(spark, dir, "embeddings")
        val exact = DedupQueries.exactSemanticPairs(e, 0.35).persist()
        val quant = DedupQueries.quantSemanticPairs(spark, e, 0.35,
          k = 16, nprobe = 8)
        val total = exact.count()
        val hits = exact.join(quant, Seq("id_a", "id_b"), "left_semi").count()
        val recall = hits.toDouble / math.max(total, 1L)
        info(f"$dir: $hits/$total exact pairs recovered (recall $recall%.3f)")
        assert(total > 0, s"no exact pairs at $dir — threshold drifted?")
        assert(recall >= 0.8,
          f"$dir: semantic-dedup recall $recall%.3f under the 0.8 spec floor " +
            "(gate floor is 0.6)")
      }
    }
  }
}
