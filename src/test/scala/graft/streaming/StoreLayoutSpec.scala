package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r14 external-store layout contracts that the s15 oracle gate
  * cannot see (it only checks outcomes):
  *   - fold RETENTION: line/quota fold snapshots <= N-2 are retired, so
  *     the store footprint is bounded at ~2 snapshots no matter how many
  *     batches stream through (the r13 layout kept one partition per
  *     batch forever and re-aggregated them all every batch);
  *   - gram-store BUCKETING: every batch's delta lands under
  *     gbkt=pmod(gh,32) partition dirs (the probe's pruning key), rows
  *     pre-exploded with np embedded.
  * Functional correctness of the folds is carried by the s15/s13 oracle
  * gates (the hot-line rule and quota admission ride the fold counts);
  * idempotency under re-delivery by StreamRetrySpec. */
class StoreLayoutSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def dirs(path: String): Set[String] = {
    val f = new java.io.File(path)
    Option(f.listFiles()).toSeq.flatten.filter(_.isDirectory)
      .map(_.getName).toSet
  }

  test("fold snapshots retire to the last two; gram deltas accumulate " +
      "bucketed") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-storelayout-").toString
    try {
      // four batches of docs built to pass EVERY stage: 14 tokens
      // (>= 10 for quality, 13 bigrams < 20 waives the repetition
      // ceilings), >= 2 stopwords, all trigrams distinct, and the
      // content tokens id-unique at every 3rd position so no two docs
      // share a single trigram (dup stage sees Jaccard 0)
      def mkBatch(b: Int) = (0 until 3).map { i =>
        val id = b * 10L + i
        (id, "en", "web",
          s"the a${id}b0 of the a${id}b1 and some a${id}b2 " +
            s"near which a${id}b3 holds the a${id}b4")
      }.toDF("doc_id", "lang", "source", "text")
      (0 until 4).foreach { b =>
        EventStreams.curationBatch(base, budget = 1L << 40, mkBatch(b),
          b.toLong)
      }
      // retention: only snapshots 2 and 3 survive for both folds
      assert(dirs(s"$base/linefold") == Set("batch_id=2", "batch_id=3"),
        s"linefold retention broke: ${dirs(s"$base/linefold")}")
      assert(dirs(s"$base/quotafold") == Set("batch_id=2", "batch_id=3"),
        s"quotafold retention broke: ${dirs(s"$base/quotafold")}")
      // gram deltas: all four batches present, every non-empty delta
      // carries gbkt= partition dirs
      val gb = dirs(s"$base/gramstore")
      assert(gb == (0 until 4).map(b => s"batch_id=$b").toSet,
        s"gram deltas must accumulate: $gb")
      gb.foreach { d =>
        val buckets = dirs(s"$base/gramstore/$d")
        assert(buckets.nonEmpty && buckets.forall(_.startsWith("gbkt=")),
          s"gram delta $d is not bucket-partitioned: $buckets")
      }
      // the gram rows are exploded with np embedded: per doc, row count
      // equals its embedded gram count
      val bad = spark.read.parquet(s"$base/gramstore")
        .groupBy("doc_id")
        .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("rows"),
          org.apache.spark.sql.functions.max("np").as("np"),
          org.apache.spark.sql.functions.countDistinct("np").as("nps"))
        .where("rows != np OR nps != 1")
        .count()
      assert(bad == 0, "gram rows out of step with embedded np")
      // the latest line fold IS the running aggregate: total cnt ==
      // distinct (doc, line) pairs ever admitted (3 docs x 4 batches,
      // every line unique per doc here)
      val foldSum = spark.read.parquet(s"$base/linefold/batch_id=3")
        .agg(org.apache.spark.sql.functions.sum("cnt")).head.getLong(0)
      val outAdmitted = spark.read.parquet(s"$base/out")
        .where("outcome = 'admitted'").count()
      assert(outAdmitted == 12L, s"layout-spec docs must all admit: $outAdmitted")
      assert(foldSum == 12L,
        s"line fold must hold one count per admitted doc-line: $foldSum")
    } finally {
      org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true)
    }
  }
}
