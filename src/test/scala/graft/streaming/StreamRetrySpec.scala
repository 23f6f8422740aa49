package graft.streaming

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once under TASK RETRY, not just clean restart: a planted
  * exception fails partition 0 of every stage on its FIRST attempt
  * mid-microbatch (TaskContext.attemptNumber == 0), the session allows
  * one retry (master local[4,2]), and the bombed run's sink must equal a
  * clean run's sink byte-for-byte — state-store commits and file-sink
  * manifests must absorb the partial first attempt. Covers the two
  * stateful stream-stream shapes: the s04 inner join and the s11 left
  * outer join. StreamRecoverySpec covers restart-across-incarnations;
  * this covers failure WITHIN a microbatch. */
object StreamRetrySpec {
  val armed = new java.util.concurrent.atomic.AtomicBoolean(false)
  val detonations = new java.util.concurrent.atomic.AtomicInteger(0)
}

class StreamRetrySpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    // local[4, 2]: 4 threads, maxFailures=2 — first attempts may die
    spark = SparkSession.builder().master("local[4, 2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = {
    StreamRetrySpec.armed.set(false)
    if (spark != null) spark.stop()
  }

  /** Pass-through that throws on the first attempt of partition 0 of
    * every stage while armed. */
  private def bombed(df: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(df.schema)
    df.mapPartitions { it: Iterator[Row] =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() == 0 && tc.attemptNumber() == 0 &&
        StreamRetrySpec.armed.get()) {
        StreamRetrySpec.detonations.incrementAndGet()
        throw new RuntimeException("planted first-attempt task failure")
      }
      it
    }(enc)
  }

  /** Builds the join pipeline over a file stream and runs it to a
    * parquet sink; returns the sink rows as sorted strings. */
  private def runShape(joinType: String, arm: Boolean): Seq[String] = {
    val base = java.nio.file.Files
      .createTempDirectory(s"graft-retry-$joinType-$arm").toString
    val events = graft.operators.Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    events.coalesce(2).write.parquet(s"$base/in")
    val schema = spark.read.parquet(s"$base/in").schema

    def sideStream = {
      val raw = spark.readStream.schema(schema).parquet(s"$base/in")
      if (arm) bombed(raw) else raw
    }
    val purchases = sideStream
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "30 minutes")
    val clicks = sideStream
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "30 minutes")
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      joinType)
      .select(col("p_user"), col("p_id"), col("c_id"))

    StreamRetrySpec.armed.set(arm)
    try {
      val q = joined.writeStream.outputMode("append").format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      require(q.awaitTermination(180000), s"$joinType stream timed out")
      if (q.isActive) q.stop()
    } finally StreamRetrySpec.armed.set(false)
    spark.read.parquet(s"$base/out").collect().map(_.toString).sorted.toSeq
  }

  for (joinType <- Seq("inner", "left_outer")) {
    test(s"$joinType stream-stream join: planted mid-batch task failure leaves the sink exactly-once") {
      val clean = runShape(joinType, arm = false)
      val before = StreamRetrySpec.detonations.get()
      val retried = runShape(joinType, arm = true)
      assert(StreamRetrySpec.detonations.get() > before,
        "the bomb never fired — the run proved nothing")
      assert(clean.nonEmpty, "shape produced no rows; vacuous comparison")
      assert(retried == clean,
        s"retry changed the sink: clean=${clean.size} rows, " +
          s"retried=${retried.size} rows")
    }
  }

  test("s13 ingest batch is idempotent under foreachBatch re-delivery") {
    // foreachBatch is at-least-once: a batch can be RE-DELIVERED after a
    // mid-write failure. Re-running a batch (same id) must replace its
    // own outputs, not append duplicates, and must not count its own
    // earlier partial store write as prior data.
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-s13-retry-").toString
    try {
      val b0 = Seq(
        (1L, "en", "web", "alpha beta gamma delta epsilon zeta"),
        (2L, "en", "web", "one two three four five six"))
        .toDF("doc_id", "lang", "source", "text")
      val b1 = Seq(
        // near-dup of doc 1 (same text + tail): must count it as prior
        (10L, "en", "web", "alpha beta gamma delta epsilon zeta is 7"),
        (11L, "en", "web", "totally unrelated words here now"))
        .toDF("doc_id", "lang", "source", "text")
      EventStreams.ingestDedupBatch(base, b0, 0L)
      EventStreams.ingestDedupBatch(base, b1, 1L)
      val first = spark.read.parquet(s"$base/out")
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_dups_prior"))).sorted.toSeq
      assert(first.contains((10L, 1L)),
        s"doc 10 must see its batch-0 near-dup as prior: $first")
      // gram store is exploded (one row per gram INSTANCE, multiplicity
      // is load-bearing for inter counts): snapshot it before the retry
      def storeSnap() = spark.read.parquet(s"$base/store")
        .groupBy("doc_id").agg(count(lit(1)).as("rows"), max("np").as("np"))
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("rows"), r.getAs[Int]("np"))).sorted.toSeq
      val storeFirst = storeSnap()
      storeFirst.foreach { case (id, rows, np) =>
        assert(rows == np, s"doc $id holds $rows gram rows but np=$np")
      }
      // re-deliver batch 1 (the retry): outputs must be UNCHANGED
      EventStreams.ingestDedupBatch(base, b1, 1L)
      val retried = spark.read.parquet(s"$base/out")
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_dups_prior"))).sorted.toSeq
      assert(retried == first,
        s"re-delivered batch changed the sink: $first -> $retried")
      assert(storeSnap() == storeFirst,
        "retry changed the signature store's rows")
    } finally {
      org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true)
    }
  }

  test("s14 quota batch is idempotent under foreachBatch re-delivery") {
    // same at-least-once contract as s13: a re-delivered batch must
    // replace its own output partition and must not double-count its own
    // earlier store write as prior consumed tokens.
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-s14-retry-").toString
    try {
      val b0 = Seq((1L, "en", 6L), (2L, "en", 5L), (3L, "fr", 4L))
        .toDF("doc_id", "lang", "n_tok")
      val b1 = Seq((10L, "en", 3L), (11L, "fr", 2L))
        .toDF("doc_id", "lang", "n_tok")
      EventStreams.quotaBatch(base, budget = 12L, b0, 0L)
      EventStreams.quotaBatch(base, budget = 12L, b1, 1L)
      def snap() = spark.read.parquet(s"$base/out")
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Long]("arrived_before"),
          r.getAs[Boolean]("admitted"))).sorted.toSeq
      val first = snap()
      // doc 10's prior en tokens = 6 + 5 = 11 < 12 -> admitted; a
      // double-counted store would read 22 and reject it
      assert(first.contains((10L, 11L, true)),
        s"doc 10 must see exactly batch-0 en tokens as prior: $first")
      assert(first.contains((11L, 4L, true)), s"fr base wrong: $first")
      EventStreams.quotaBatch(base, budget = 12L, b1, 1L) // the retry
      val retried = snap()
      assert(retried == first,
        s"re-delivered batch changed the sink: $first -> $retried")
      val storeRows = spark.read.parquet(s"$base/store")
        .groupBy("lang", "batch_id").count()
        .filter(col("count") > 1).count()
      assert(storeRows == 0, "retry duplicated quota-store rows")
    } finally {
      org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true)
    }
  }

  test("s15 curation batch is idempotent under foreachBatch re-delivery") {
    // the composed pipeline carries THREE stores (lines, grams, quota);
    // a re-delivered batch must replace its own partitions in all of
    // them and must not count its own earlier partial writes as prior
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-s15-retry-").toString
    try {
      val b0 = Seq(
        (1L, "en", "web", "the quick brown fox jumps over a lazy dog near the river bank"),
        (2L, "en", "web", "a stream of tokens flows to the sink and back again quickly"),
        (3L, "en", "web", "the cache of a block and the scan of a file works well"))
        .toDF("doc_id", "lang", "source", "text")
      val b1 = Seq(
        // near-dup of doc 1 (same text + tail): dup vs the GRAM store
        (10L, "en", "web", "the quick brown fox jumps over a lazy dog near the river bank is 7"),
        (11L, "en", "web", "fresh unrelated words in a calm of the morning light today here"))
        .toDF("doc_id", "lang", "source", "text")
      // kept b0 en tokens = 13 + 12 + 13 = 38 < 45: doc 11 admits; a
      // double-counted quota store (76) would flip it to 'quota'
      EventStreams.curationBatch(base, budget = 45L, b0, 0L)
      EventStreams.curationBatch(base, budget = 45L, b1, 1L)
      def snap() = spark.read.parquet(s"$base/out")
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[String]("outcome"))).sorted.toSeq
      val first = snap()
      assert(first.contains((10L, "dup")),
        s"doc 10 must be flagged vs the gram store: $first")
      assert(first.contains((11L, "admitted")),
        s"doc 11 must admit against batch-0's 38 prior tokens: $first")
      // fold snapshots aggregate per key; the gram store is exploded
      // per instance — snapshot all three before the retry
      def stores() = Seq("gramstore", "linefold", "quotafold").map { st =>
        st -> spark.read.parquet(s"$base/$st")
          .collect().map(_.toString).sorted.toSeq
      }
      val storesFirst = stores()
      EventStreams.curationBatch(base, budget = 45L, b1, 1L) // the retry
      val retried = snap()
      assert(retried == first,
        s"re-delivered batch changed the sink: $first -> $retried")
      assert(stores() == storesFirst,
        "retry changed a store's rows")
      Seq("linefold" -> Seq("line", "batch_id"),
        "quotafold" -> Seq("lang", "batch_id")).foreach { case (st, keys) =>
        val dups = spark.read.parquet(s"$base/$st")
          .groupBy(keys.map(col): _*).count()
          .filter(col("count") > 1).count()
        assert(dups == 0, s"$st fold snapshot holds duplicate keys")
      }
    } finally {
      org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true)
    }
  }
}
