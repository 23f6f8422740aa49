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
/** A local FileSystem whose `exists()` can be made to FAIL TRANSIENTLY
  * for paths containing a given substring — the injection seam for the
  * three-valued completeness contract (a transient object-store error
  * during a `_SUCCESS` probe must never turn into a deletion). State
  * lives in the companion so the FileSystem cache's instance reuse is
  * irrelevant. */
class FlakyExistsFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("flaky:///")
  override def exists(f: org.apache.hadoop.fs.Path): Boolean = {
    val it = FlakyExistsFs.failures.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (f.toString.contains(e.getKey) && e.getValue.getAndDecrement() > 0)
        throw new java.io.IOException(
          s"injected transient exists() failure for ${e.getKey}")
    }
    super.exists(f)
  }
}

object FlakyExistsFs {
  private[streaming] val failures = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicInteger]()
  def inject(substr: String, n: Int): Unit =
    failures.put(substr, new java.util.concurrent.atomic.AtomicInteger(n))
  def clear(): Unit = failures.clear()
}

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

  // docs built to pass EVERY stage: 14 tokens (>= 10 for quality, 13
  // bigrams < 20 waives the repetition ceilings), >= 2 stopwords, all
  // trigrams distinct, content tokens id-unique at every 3rd position so
  // no two docs share a single trigram (dup stage sees Jaccard 0)
  private def docText(id: Long): String =
    s"the a${id}b0 of the a${id}b1 and some a${id}b2 " +
      s"near which a${id}b3 holds the a${id}b4"

  private def mkBatch(b: Int) = {
    val s = spark
    import s.implicits._
    (0 until 3).map { i =>
      val id = b * 10L + i
      (id, "en", "web", docText(id))
    }.toDF("doc_id", "lang", "source", "text")
  }

  private def copyTree(src: String, dst: String): Unit = {
    val sp = java.nio.file.Paths.get(src)
    val dp = java.nio.file.Paths.get(dst)
    val st = java.nio.file.Files.walk(sp)
    try st.forEach { p =>
      val t = dp.resolve(sp.relativize(p))
      if (java.nio.file.Files.isDirectory(p))
        java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    } finally st.close()
  }

  test("fold snapshots retire to the last two; gram deltas accumulate " +
      "bucketed") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-storelayout-").toString
    try {
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

  test("maybeCompactGramStore honors the delta-count trigger, counts " +
      "LIVE deltas only, and the lag-one GC retires a generation per " +
      "compaction") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-storetrigger-").toString
    val gram = s"$base/gramstore"
    try {
      (0 until 4).foreach { b =>
        EventStreams.curationBatch(base, budget = 1L << 40, mkBatch(b),
          b.toLong)
      }
      // 4 deltas < trigger 5: a no-op, store untouched
      assert(!EventStreams.maybeCompactGramStore(spark,
        gram, triggerDeltas = 5))
      assert(dirs(gram) == (0 until 4).map(b => s"batch_id=$b").toSet)
      // 4 deltas >= trigger 4: fires, folds committed ids 0..2. With no
      // PRIOR generation the lag-one GC retires nothing: every delta
      // stays for readers that resolved the pre-manifest view
      assert(EventStreams.maybeCompactGramStore(spark,
        gram, triggerDeltas = 4))
      assert(dirs(gram) ==
        Set("base-2", "batch_id=0", "batch_id=1", "batch_id=2", "batch_id=3"),
        dirs(gram).toString)
      // live deltas = {3} only — the lagged 0..2 must NOT re-fire the
      // trigger (or lag-one GC would compact every batch until the next
      // fold)
      assert(!EventStreams.maybeCompactGramStore(spark,
        gram, triggerDeltas = 2))
      // two more batches: live = {3,4,5} fires trigger 3; fold -> base-4
      // (newest delta 5 stays); GC retires the PRE-base generation's
      // deltas (<= prev upto 2) and keeps base-2 + deltas 3.. for
      // readers one generation behind
      (4 until 6).foreach { b =>
        EventStreams.curationBatch(base, budget = 1L << 40, mkBatch(b),
          b.toLong)
      }
      assert(EventStreams.maybeCompactGramStore(spark,
        gram, triggerDeltas = 3))
      assert(dirs(gram) == Set("base-2", "base-4",
        "batch_id=3", "batch_id=4", "batch_id=5"), dirs(gram).toString)
      // third compaction: live = {5,6,7}; fold -> base-6; generation
      // base-2 (and the deltas only its view needed) is retired, base-4
      // becomes the lagged generation
      (6 until 8).foreach { b =>
        EventStreams.curationBatch(base, budget = 1L << 40, mkBatch(b),
          b.toLong)
      }
      assert(EventStreams.maybeCompactGramStore(spark,
        gram, triggerDeltas = 3))
      assert(dirs(gram) == Set("base-4", "base-6",
        "batch_id=5", "batch_id=6", "batch_id=7"), dirs(gram).toString)
      // a stray unparseable batch_id= entry neither bricks the probe nor
      // gets deleted by GC (it is not ours) — r15 advice: one malformed
      // name previously threw NumberFormatException on every read
      val stray = new java.io.File(s"$gram/batch_id=__HIVE_DEFAULT__")
      stray.mkdirs()
      assert(EventStreams.readGramStore(spark, gram).get.count() > 0)
      EventStreams.curationBatch(base, budget = 1L << 40, mkBatch(8), 8L)
      EventStreams.compactGramStore(spark, gram)
      assert(stray.exists(), "GC must skip unparseable batch_id entries")
    } finally {
      org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true)
    }
  }

  test("a batch admitting zero docs neither crashes nor corrupts the " +
      "stores (empty-reference Bloom, found r15)") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-storeempty-").toString
    try {
      EventStreams.curationBatch(base, budget = 1L << 40, mkBatch(0), 0L)
      // every doc fails the quality stage (too short): the batch's line
      // and gram frames are EMPTY while prior folds exist — the Bloom
      // prefilters must build over zero rows without throwing
      val dead = Seq((90L, "en", "web", "tiny"), (91L, "en", "web", "nope"))
        .toDF("doc_id", "lang", "source", "text")
      EventStreams.curationBatch(base, budget = 1L << 40, dead, 1L)
      val out1 = spark.read.parquet(s"$base/out").where("batch_id = 1")
        .select("outcome").collect().map(_.getString(0)).toSeq
      assert(out1.size == 2 && out1.forall(_ == "quality"), out1.toString)
      // and the store still probes correctly afterwards: a near-dup of
      // batch-0's doc 0 planted in batch 2 must be flagged
      val b2 = Seq((20L, "en", "web", docText(0L) + " is 7"))
        .toDF("doc_id", "lang", "source", "text")
      EventStreams.curationBatch(base, budget = 1L << 40, b2, 2L)
      val got = spark.read.parquet(s"$base/out")
        .where("batch_id = 2").select("outcome").head.getString(0)
      assert(got == "dup", s"store probe broken after an empty batch: $got")
    } finally {
      org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true)
    }
  }

  test("the full store lifecycle (ingest, probe, compaction, manifest " +
      "publish) runs through an explicit file: URI — the FileSystem seam " +
      "the object-store claim rests on (r16)") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-storeuri-").toString
    val base = "file:" + tmp
    try {
      (0 until 4).foreach { b =>
        EventStreams.curationBatch(base, budget = 1L << 40, mkBatch(b),
          b.toLong)
      }
      assert(EventStreams.readGramStore(spark, s"$base/gramstore")
        .get.count() > 0, "URI-addressed store must read back")
      assert(EventStreams.maybeCompactGramStore(spark, s"$base/gramstore",
        triggerDeltas = 4), "trigger must fire through the URI path")
      assert(dirs(s"$tmp/gramstore").contains("base-2"),
        s"URI compaction must land the fold: ${dirs(s"$tmp/gramstore")}")
      assert(new java.io.File(s"$tmp/gramstore/_graft_manifest").exists(),
        "URI publish must land the manifest")
      // and the probe still flags a planted near-dup THROUGH the
      // compacted URI store
      val b4 = Seq((40L, "en", "web", docText(0L) + " is 7"))
        .toDF("doc_id", "lang", "source", "text")
      EventStreams.curationBatch(base, budget = 1L << 40, b4, 4L)
      val got = spark.read.parquet(s"$base/out")
        .where("batch_id = 4").select("outcome").head.getString(0)
      assert(got == "dup", s"URI store probe must flag the near-dup: $got")
    } finally {
      org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(tmp), true)
    }
  }

  test("the segment-sharded store probe (r16 third lever) is " +
      "outcome-identical to the full probe") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-storeseg-").toString
    val base2 = java.nio.file.Files
      .createTempDirectory("graft-storeseg2-").toString + "/copy"
    try {
      (0 until 4).foreach { b =>
        EventStreams.curationBatch(base, budget = 1L << 40, mkBatch(b),
          b.toLong)
      }
      copyTree(base, base2)
      // batch 4: a near-dup of batch-0's doc 0 (store-probe dup), a
      // fresh doc, and an in-batch near-dup pair — outcomes through the
      // segment-sharded probe (S=4, each segment 8 of the 32 buckets)
      // must equal the unsegmented run bit-for-bit
      val b4 = Seq(
        (40L, "en", "web", docText(0L) + " is 7"),
        (41L, "en", "web", docText(41L)),
        (42L, "en", "web", docText(77L)),
        (43L, "en", "web", docText(77L) + " is 9"))
        .toDF("doc_id", "lang", "source", "text")
      EventStreams.curationBatch(base, budget = 1L << 40, b4, 4L)
      EventStreams.curationBatch(base2, budget = 1L << 40, b4, 4L,
        storeSegments = 4)
      def outN(p: String) = spark.read.parquet(s"$p/out")
        .where("batch_id = 4").select("doc_id", "outcome")
        .collect().map(_.toString).sorted.toSeq
      val got = outN(base)
      assert(got == outN(base2),
        s"segmented vs full probe outcomes diverged: $got vs ${outN(base2)}")
      assert(got.exists(r => r.contains("40") && r.contains("dup")),
        s"the planted store near-dup must still be flagged: $got")
    } finally {
      val fs = org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      fs.delete(new org.apache.hadoop.fs.Path(
        new java.io.File(base2).getParent), true)
    }
  }

  test("the adaptive probe prefilter (r18) is outcome-invariant: the " +
      "forced prune+Bloom arm equals the small-store plain arm") {
    // Below the size threshold the probes skip bucket pruning and the
    // Bloom build (3 fewer Spark jobs per micro-batch); both arms must
    // produce bit-identical outcomes — the prefilters are I/O reducers,
    // never semantics. Forcing threshold=0 keeps the 100 TB arm covered
    // now that small-store runs (every gate SF) default to the plain arm.
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-storepf-").toString
    val base2 = java.nio.file.Files
      .createTempDirectory("graft-storepf2-").toString + "/copy"
    try {
      (0 until 4).foreach { b =>
        EventStreams.curationBatch(base, budget = 1L << 40, mkBatch(b),
          b.toLong)
      }
      copyTree(base, base2)
      val b4 = Seq(
        (40L, "en", "web", docText(0L) + " is 7"),
        (41L, "en", "web", docText(41L)),
        (42L, "en", "web", docText(77L)),
        (43L, "en", "web", docText(77L) + " is 9"))
        .toDF("doc_id", "lang", "source", "text")
      EventStreams.curationBatch(base, budget = 1L << 40, b4, 4L)
      val key = "graft.streaming.probe.prune.threshold.bytes"
      spark.conf.set(key, "0") // every probe takes the prune+Bloom arm
      try EventStreams.curationBatch(base2, budget = 1L << 40, b4, 4L)
      finally spark.conf.unset(key)
      def outN(p: String) = spark.read.parquet(s"$p/out")
        .where("batch_id = 4").select("doc_id", "outcome")
        .collect().map(_.toString).sorted.toSeq
      val got = outN(base)
      assert(got == outN(base2),
        s"plain vs prefiltered probe outcomes diverged: $got vs ${outN(base2)}")
      assert(got.exists(r => r.contains("40") && r.contains("dup")),
        s"the planted store near-dup must still be flagged: $got")
    } finally {
      val fs = org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      fs.delete(new org.apache.hadoop.fs.Path(
        new java.io.File(base2).getParent), true)
    }
  }

  test("a TRANSIENT _SUCCESS-check failure never lets GC delete the " +
      "lagged generation, and a base newer than the published one is " +
      "never retired (r16 advice — unknown never deletes, in the GC " +
      "path too)") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-storeflaky-").toString
    val gram = s"$tmp/gramstore"
    val tmp2 = java.nio.file.Files
      .createTempDirectory("graft-storeflaky2-").toString + "/copy"
    spark.sparkContext.hadoopConfiguration
      .set("fs.flaky.impl", classOf[FlakyExistsFs].getName)
    def rows(p: String) = EventStreams.readGramStore(spark, p).get
      .drop("batch_id").collect().map(_.toString).sorted.toSeq
    try {
      // reach the steady two-generation state {base-2, base-3, deltas
      // 3,4} exactly as the lifecycle test does
      (0 until 4).foreach { b =>
        EventStreams.curationBatch(tmp, budget = 1L << 40, mkBatch(b),
          b.toLong)
      }
      EventStreams.compactGramStore(spark, gram)
      EventStreams.curationBatch(tmp, budget = 1L << 40, mkBatch(4), 4L)
      EventStreams.compactGramStore(spark, gram)
      assert(dirs(gram) == Set("base-2", "base-3", "batch_id=3",
        "batch_id=4"), dirs(gram).toString)
      copyTree(tmp, tmp2)
      val preRows = rows(gram)

      // (a) base-2's _SUCCESS check fails TRANSIENTLY throughout one
      // compactor pass (repair sweep + resolve + GC all see unknown):
      // the old keep-set came from listBases, which dropped base-2, so
      // GC retired the live lagged generation. Unknown must never
      // delete — base-2, its _SUCCESS, and the delta keep-set survive.
      FlakyExistsFs.inject("base-2/_SUCCESS", 100)
      EventStreams.compactGramStore(spark, s"flaky:$gram")
      FlakyExistsFs.clear()
      assert(dirs(gram) == Set("base-2", "base-3", "batch_id=3",
        "batch_id=4"),
        s"transient-unknown GC must delete nothing: ${dirs(gram)}")
      assert(rows(gram) == preRows, "store rows changed under a flaky pass")
      // and the next QUIET pass is a plain idempotent no-op
      EventStreams.compactGramStore(spark, gram)
      assert(dirs(gram) == Set("base-2", "base-3", "batch_id=3",
        "batch_id=4"), dirs(gram).toString)

      // (c) reader availability: transient probe failures on BOTH
      // resident generations previously resolved NO base at all, and the
      // reader silently served a deltas-only view with the folded
      // history missing. The manifest is published strictly after the
      // fold's _SUCCESS landed, so its named base is refused only on an
      // AFFIRMATIVE absence — a transient probe error keeps the reader
      // on the published view, row-identical to the quiet read.
      FlakyExistsFs.inject("base-2/_SUCCESS", 100)
      FlakyExistsFs.inject("base-3/_SUCCESS", 100)
      val flakyRows = EventStreams.readGramStore(spark, s"flaky:$gram").get
        .drop("batch_id").collect().map(_.toString).sorted.toSeq
      FlakyExistsFs.clear()
      assert(flakyRows == preRows,
        "a reader under transient probe failures must still serve the " +
          s"published view (got ${flakyRows.size} rows vs ${preRows.size})")

      // (b) a COMPLETE base NEWER than the one GC runs around (reachable
      // when resolve's own completeness probe transiently failed on it)
      // must never be retired — it is the repair sweep's to handle, and
      // only on an affirmative _SUCCESS absence. Inject exactly two
      // failures: the repair sweep's probe and resolve's listBases probe
      // see unknown (so GC runs around base-3), the GC probe then
      // succeeds (no unknowns left) — the old name-based retire clause
      // deleted base-9 here.
      val g2 = s"$tmp2/gramstore"
      val b9 = new java.io.File(s"$g2/base-9")
      b9.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(b9.getPath, "_SUCCESS"),
        Array.emptyByteArray)
      FlakyExistsFs.inject("base-9/_SUCCESS", 2)
      EventStreams.compactGramStore(spark, s"flaky:$g2")
      FlakyExistsFs.clear()
      assert(b9.exists(),
        s"GC must never retire a base newer than its keep base: ${dirs(g2)}")
      assert(dirs(g2).contains("base-2"),
        s"lagged generation must also survive: ${dirs(g2)}")
    } finally {
      FlakyExistsFs.clear()
      val fs = org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      fs.delete(new org.apache.hadoop.fs.Path(
        new java.io.File(tmp2).getParent), true)
    }
  }

  test("gram-store compaction is probe-equivalent, never folds the " +
      "newest delta, and rolls forward through crash + torn manifest") {
    val s = spark
    import s.implicits._
    val base = java.nio.file.Files
      .createTempDirectory("graft-storecompact-").toString
    val base2 = java.nio.file.Files
      .createTempDirectory("graft-storecompact2-").toString + "/copy"
    val gram = s"$base/gramstore"
    def store = EventStreams.readGramStore(spark, gram)
      .getOrElse(fail("gram store must resolve"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .drop("batch_id").collect().map(_.toString).sorted.toSeq
    try {
      (0 until 4).foreach { b =>
        EventStreams.curationBatch(base, budget = 1L << 40, mkBatch(b),
          b.toLong)
      }
      copyTree(base, base2) // the uncompacted control replica

      EventStreams.compactGramStore(spark, gram)
      // the NEWEST delta is never folded (r14 advice: a re-delivered last
      // batch must still see all prior history below its own id) — the
      // committed ids 0..2 fold into base-2, delta 3 stays a delta; with
      // no PRIOR generation the lag-one GC retires nothing yet
      assert(dirs(gram) == Set("base-2", "batch_id=0", "batch_id=1",
        "batch_id=2", "batch_id=3"),
        s"compaction must fold committed ids only: ${dirs(gram)}")
      assert(new java.io.File(s"$gram/_graft_manifest").exists(),
        "publish must land the manifest")
      assert(dirs(s"$gram/base-2").forall(_.startsWith("gbkt=")),
        "the folded base must keep the bucket partitioning")
      // row multiset preserved (batch_id re-stamped, everything else
      // bit-identical between folded and unfolded stores)
      assert(rows(store) ==
          rows(EventStreams.readGramStore(spark, s"$base2/gramstore").get),
        "compaction changed the gram row multiset")

      // batch 4 carries a near-dup of batch-0's doc 0 (shared grams) plus
      // a fresh doc: outcomes must be IDENTICAL against the compacted
      // store and the uncompacted replica
      val b4 = Seq(
        (40L, "en", "web", docText(0L) + " is 7"),
        (41L, "en", "web", docText(41L)))
        .toDF("doc_id", "lang", "source", "text")
      EventStreams.curationBatch(base, budget = 1L << 40, b4, 4L)
      EventStreams.curationBatch(base2, budget = 1L << 40, b4, 4L)
      def outN(p: String, n: Int) = spark.read.parquet(s"$p/out")
        .where(s"batch_id = $n").select("doc_id", "outcome")
        .collect().map(_.toString).sorted.toSeq
      val got = outN(base, 4)
      assert(got == outN(base2, 4),
        s"compacted vs uncompacted outcomes diverged: $got")
      assert(got.exists(r => r.contains("40") && r.contains("dup")),
        s"the planted near-dup must be flagged via the folded store: $got")

      // an IN-FLIGHT READER'S view, resolved from the current manifest
      // (base-2 generation), captured BEFORE the next compaction swaps
      // the manifest — lag-one GC's whole point (r15 advice) is that
      // this view stays readable across one concurrent compaction
      val inFlight = EventStreams.readGramStore(spark, gram).get

      // second fold: base-2 + committed delta 3 -> base-3; delta 4 stays;
      // lag-one GC keeps generation base-2 (and deltas > its upto) for
      // the in-flight reader and retires only the pre-base-2 deltas
      EventStreams.compactGramStore(spark, gram)
      assert(dirs(gram) == Set("base-2", "base-3", "batch_id=3",
        "batch_id=4"),
        s"re-compaction must advance the base with lag-one GC: ${dirs(gram)}")
      assert(rows(inFlight) ==
          rows(EventStreams.readGramStore(spark, s"$base2/gramstore").get),
        "a pre-swap reader view must survive one compaction (lag-one GC)")

      // crash between fold and publish, simulated by deleting the
      // manifest: the reader recovers via the newest complete base and a
      // compactor rerun re-publishes without recomputation
      val preCrash = rows(store)
      assert(new java.io.File(s"$gram/_graft_manifest").delete())
      assert(rows(store) == preCrash,
        "reader must recover from a missing manifest")
      EventStreams.compactGramStore(spark, gram)
      assert(new java.io.File(s"$gram/_graft_manifest").exists(),
        "rerun must re-publish the manifest")
      assert(dirs(gram) == Set("base-2", "base-3", "batch_id=3",
        "batch_id=4"))

      // a TORN manifest (garbage bytes) must never brick the reader or
      // the compactor — both fall back to base resolution and repair it
      java.nio.file.Files.write(
        java.nio.file.Paths.get(gram, "_graft_manifest"),
        "upto=".getBytes("UTF-8"))
      assert(rows(store) == preCrash,
        "reader must recover from a torn manifest")
      // ...same for a manifest that parses but names a MISSING base dir
      // (a crash after publish but before the fold landed could never
      // produce this — publish follows the fold — but an operator
      // restoring a partial backup could)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(gram, "_graft_manifest"),
        "upto=99\nbase=base-99\n".getBytes("UTF-8"))
      assert(rows(store) == preCrash,
        "reader must ignore a manifest naming a missing base")
      // a stale complete base from an interrupted older run is GC'd, a
      // TORN fold (no _SUCCESS) is discarded, and the torn manifest is
      // repaired — all by one compactor pass
      val stale = new java.io.File(s"$gram/base-1")
      stale.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(stale.getPath, "_SUCCESS"),
        Array.emptyByteArray)
      val torn = new java.io.File(s"$gram/base-99")
      torn.mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(torn.getPath, "junk"), "torn")
      EventStreams.compactGramStore(spark, gram)
      assert(!stale.exists(),
        "a base older than the lagged generation must be GC'd")
      assert(!torn.exists(), "a torn fold must be discarded")
      assert(dirs(gram) == Set("base-2", "base-3", "batch_id=3",
        "batch_id=4"))
      assert(rows(store) == preCrash, "repair must preserve the store")

      // and the repaired store still probes correctly: one more batch
      // with a near-dup of doc 0 sees identical outcomes on both replicas
      val b5 = Seq(
        (50L, "en", "web", docText(0L) + " is 9"),
        (51L, "en", "web", docText(51L)))
        .toDF("doc_id", "lang", "source", "text")
      EventStreams.curationBatch(base, budget = 1L << 40, b5, 5L)
      EventStreams.curationBatch(base2, budget = 1L << 40, b5, 5L)
      val got5 = outN(base, 5)
      assert(got5 == outN(base2, 5) &&
          got5.exists(r => r.contains("50") && r.contains("dup")),
        s"post-repair probe diverged: $got5")
    } finally {
      val fs = org.apache.hadoop.fs.FileSystem
        .getLocal(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      fs.delete(new org.apache.hadoop.fs.Path(
        new java.io.File(base2).getParent), true)
    }
  }
}
