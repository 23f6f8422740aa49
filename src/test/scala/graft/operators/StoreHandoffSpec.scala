package graft.operators

import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Drift canaries for d59's persisted store contract: the gate itself
  * proves the happy path (bootstrap write → cold read → hash match);
  * these tests prove the reads are LOAD-BEARING — a perturbed store
  * artifact changes or loudly breaks the incremental output, so a
  * bootstrap/incremental contract drift can never pass silently. This is
  * the failure class the r12 in-run handoff could not exercise (VERDICT
  * r12 "What's missing #1"); the reference analog is the persisted
  * mdfile (len, mtime) header that rejects stale bitmaps
  * (`rubix-bookkeeper` FileMetadata restore discipline). */
class StoreHandoffSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  // bootstrapStore/incChain persist frames WITHOUT unpersisting (the r13
  // soak fix: shared-plan cache entries must never vanish mid-flight);
  // production callers run under PinScope, so this spec does too — bare
  // calls would accumulate pinned RDDs across tests in the local[4] JVM
  private def pinned[T](body: => T): T = graft.PinScope.run(spark)(body)

  private def tokenStarts(base: String): Map[Long, Long] = pinned {
    PipelineQueries.packInc(
      PipelineQueries.incChain(spark, dir,
        PipelineQueries.readStore(spark, base)))
      .select("doc_id", "token_start").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("perturbing the manifest offset shifts every token_start by " +
      "exactly the delta — the packed output rides the ARTIFACT, not an " +
      "in-run recomputation") {
    val base = CacheQueries.tmpBase("graft-storespec", dir)
    pinned(PipelineQueries.bootstrapStore(spark, dir, base))
    val before = tokenStarts(base)
    assert(before.nonEmpty, "incremental chain produced no packed docs")

    val v = spark.read.parquet(s"graft://$base/manifest")
      .collect()(0).getLong(0)
    spark.range(1).select(lit(v + 997L).as("next_token_offset"))
      .write.mode("overwrite").parquet(s"graft://$base/manifest")
    val after = tokenStarts(base)
    assert(after.keySet == before.keySet)
    assert(after.forall { case (id, ts) => ts == before(id) + 997L },
      "token_start did not uniformly shift with the manifest offset")
  }

  test("a renamed store schema field fails LOUDLY, not silently") {
    val base = CacheQueries.tmpBase("graft-storespec", dir)
    pinned(PipelineQueries.bootstrapStore(spark, dir, base))

    // manifest column drift: readStore's projection breaks immediately
    val m = spark.read.parquet(s"graft://$base/manifest")
      .withColumnRenamed("next_token_offset", "next_tok_off")
      .localCheckpoint(true) // sever before overwriting the source path
    m.write.mode("overwrite").parquet(s"graft://$base/manifest")
    intercept[AnalysisException] {
      PipelineQueries.readStore(spark, base).baseOff.collect()
    }

    // restore, then drift the gram index: the near-dup probe join's
    // gh_o reference becomes unresolvable at plan construction
    spark.range(1).select(lit(0L).as("next_token_offset"))
      .write.mode("overwrite").parquet(s"graft://$base/manifest")
    val gi = spark.read.parquet(s"graft://$base/gram_index")
      .withColumnRenamed("gh", "gram_hash")
      .localCheckpoint(true)
    gi.write.mode("overwrite").parquet(s"graft://$base/gram_index")
    intercept[AnalysisException] {
      pinned(PipelineQueries.incChain(spark, dir,
        PipelineQueries.readStore(spark, base)))
    }
  }
}
