package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** e24's maintenance contracts beyond the hash gate: the merged-index
  * recall band is measured at every SF (the gate only pins >= 0.5), and
  * the drift statistic is proven LIVE — a direction-scrambled new batch
  * must flip drift_ok to false (the retrain signal), otherwise the
  * statistic is a vacuous always-true flag. */
class IncIvfSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("unshifted batch: recall holds the e08 band and drift stays in-band (all SFs)") {
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val dir = s"/root/testdata/$sf"
      graft.PinScope.run(spark) {
        val (exact, ivf, recall, drift) = VectorQueries.incIvfArms(spark, dir)
        val hits = exact.join(ivf, Seq("qid", "cid"), "left_semi").count()
        val total = exact.count()
        info(f"$dir: merged-index recall@5 = ${hits.toDouble / total}%.3f ($hits/$total)")
        assert(recall.collect()(0).getBoolean(0), s"$dir: recall flag false")
        assert(drift.collect()(0).getBoolean(0), s"$dir: drift flag false on an unshifted batch")
      }
    }
  }

  test("e25: the persisted drift baseline is load-bearing, and store schema drift fails loudly") {
    val dir = "/root/testdata/sf0.001"
    val base = CacheQueries.tmpBase("graft-ivfstorespec", dir)
    graft.PinScope.run(spark) {
      VectorQueries.bootstrapIvfStore(spark, dir, base)
      val (_, _, recall, drift) = VectorQueries.ivfStoreArms(spark, dir, base)
      assert(recall.collect()(0).getBoolean(0))
      assert(drift.collect()(0).getBoolean(0))
    }
    // perturb the PERSISTED baseline: a tiny train_p90 must flip
    // drift_ok — proving the comparison reads the artifact, not an
    // in-run recomputation
    spark.range(1).select(lit(0.0001).as("train_p90"))
      .write.mode("overwrite").parquet(s"graft://$base/stats")
    graft.PinScope.run(spark) {
      val (_, _, _, drift) = VectorQueries.ivfStoreArms(spark, dir, base)
      assert(!drift.collect()(0).getBoolean(0),
        "drift_ok ignored the persisted baseline")
    }
    // schema drift: a renamed centroid column must raise, not silently
    // read the wrong field
    val cks = spark.read.parquet(s"graft://$base/centroids")
      .withColumnRenamed("cvec", "centroid_vec").localCheckpoint(true)
    cks.write.mode("overwrite").parquet(s"graft://$base/centroids")
    intercept[org.apache.spark.sql.AnalysisException] {
      VectorQueries.ivfStoreArms(spark, dir, base)
    }
  }

  test("a mean-shifted new batch flips drift_ok false — the retrain signal is live") {
    val dir = "/root/testdata/sf0.001"
    graft.PinScope.run(spark) {
      // +0.3 per dim: a direction-preserving distribution shift — the
      // occupancy L1 jumps 0.34 -> 1.39 (measured; max 2) while the
      // distance quantile barely moves, which is exactly why the flag
      // gates on both statistics
      val (_, _, _, drift) = VectorQueries.incIvfArms(spark, dir, _ => expr(
        "transform(embedding, x -> CAST(CAST(x AS DOUBLE) + 0.3D AS FLOAT))"))
      assert(!drift.collect()(0).getBoolean(0),
        "drift_ok stayed true on a mean-shifted batch — the statistic is vacuous")
    }
  }
}
