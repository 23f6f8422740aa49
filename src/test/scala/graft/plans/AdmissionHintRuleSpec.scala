package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftExtensions, GraftSession}
import graft.cache.{AdmissionHints, CacheManager}

/** The plan-time admission-hint Rule (SURVEY §4's optional Catalyst-rule
  * form, r16): a post-planner OBSERVER records every graft:// scan's
  * pruned column count, and GraftFileSystem.open consults the hint — so
  * STOCK-format scans (spark.read.parquet("graft://…")), which never
  * pass through GraftScanBuilder, get projection-width admission too.
  * Two contracts pinned here: (1) the hint lands and changes the cache
  * decision without changing any query RESULT; (2) the rule is inert
  * when `graft.cache.min.projected.columns` is unset — installing the
  * extension changes no gate behavior. */
class AdmissionHintRuleSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var cacheDir: String = _
  private var data: String = _

  override def beforeAll(): Unit = {
    cacheDir = java.nio.file.Files.createTempDirectory("graft-hintcache").toString
    org.apache.hadoop.fs.FileSystem.closeAll()
    CacheManager.resetForTest()
    spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4,
        cacheDir = Some(cacheDir))
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.hadoopConfiguration
      .setInt(graft.cache.CacheConfig.MinColumnsKey, 3)
    // hint CONSUMPTION at open() is opt-in (r16 review: a narrow stock
    // scan's hint would also veto a concurrent wide DSv2 scan's opens on
    // the same table, so mixed workloads leave it off) — this suite is
    // the consumer contract, so turn it on
    spark.sparkContext.hadoopConfiguration
      .setBoolean(graft.cache.CacheConfig.AdmissionHintsKey, true)
    data = java.nio.file.Files.createTempDirectory("graft-hintdata").toString +
      "/nation"
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
      .write.mode("overwrite").parquet(data)
    AdmissionHints.clear()
  }

  override def afterAll(): Unit = {
    AdmissionHints.clear()
    if (spark != null) spark.stop()
    CacheManager.resetForTest()
  }

  private def cacheFiles(): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(cacheDir)).map(_.getPath).toSet
  }

  test("the rule records pruned widths for stock graft:// scans; the FS " +
      "denies narrow ones, admits wide ones, and results never change") {
    val uri = s"graft://$data"
    // explicit schema throughout: schema INFERENCE opens the parquet
    // footers through the cache before any plan exists (so before the
    // rule can hint), which would warm footer blocks and muddy the
    // narrow-scan assertion below
    val sch = spark.read.parquet(data).schema
    // narrow: 1 projected column < floor 3. The rule must record width 1
    // against the table root, and the open-time hint must keep the scan
    // out of the cache — previously this stock path had NO width
    // admission at all under the JVM-cached FS.
    val before = cacheFiles()
    val narrowRows = spark.read.schema(sch).parquet(uri).select("n_name")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(AdmissionHints.widthFor(s"$data/part-00000.parquet")
        .contains(1),
      s"rule must record the pruned width: ${AdmissionHints.snapshot}")
    assert(cacheFiles() == before,
      "a narrow stock scan must not create cache files under the hint")
    // result parity: the hint only changes the cache decision
    val plainRows = spark.read.parquet(data).select("n_name")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(narrowRows == plainRows, "hint admission must never change rows")

    // wide: the full table schema passes the floor — hint updates to
    // the latest plan's width and the scan warms the cache
    spark.read.schema(sch).parquet(uri)
      .write.format("noop").mode("overwrite").save()
    assert(AdmissionHints.widthFor(s"$data/part-00000.parquet")
        .contains(sch.fields.length),
      s"latest scan's width must win: ${AdmissionHints.snapshot}")
    assert(cacheFiles() != before,
      "a wide stock scan must warm the cache")
  }

  test("a floor set only at SESSION level (spark.conf.set) reaches the " +
      "rule — no silent fail-open (r16 advice)") {
    val hc = spark.sparkContext.hadoopConfiguration
    AdmissionHints.clear()
    hc.unset(graft.cache.CacheConfig.MinColumnsKey)
    spark.conf.set(
      "spark.hadoop." + graft.cache.CacheConfig.MinColumnsKey, "3")
    try {
      val sch = spark.read.parquet(data).schema
      spark.read.schema(sch).parquet(s"graft://$data").select("n_name")
        .write.format("noop").mode("overwrite").save()
      assert(AdmissionHints.widthFor(s"$data/part-00000.parquet")
          .contains(1),
        s"session-level floor must enable recording: ${AdmissionHints.snapshot}")
    } finally {
      spark.conf.unset(
        "spark.hadoop." + graft.cache.CacheConfig.MinColumnsKey)
      hc.setInt(graft.cache.CacheConfig.MinColumnsKey, 3)
      AdmissionHints.clear()
    }
  }

  test("mixed-width interleaving on one table: the registry is " +
      "latest-wins by DESIGN, so a narrow scan recorded last vetoes a " +
      "following wide scan's caching — the documented remedy for such " +
      "workloads is leaving consumption off (per-scan DSv2 conf channel)") {
    // This pins the one risky shape the r16 scaladoc only described
    // (verdict r16 #5): under graft.cache.admission.hints=true, scans of
    // DIFFERENT widths interleaved on one table race the path-keyed
    // latest-wins registry. Sequential scans are SAFE (each scan
    // re-records its own width at plan time before executing); the race
    // needs a narrow scan to PLAN between the wide scan's planning and
    // its execution — reproduced here deterministically by forcing the
    // wide plan, planning (not executing) a narrow scan, then executing
    // the wide plan. The loss is bounded to CACHING (the wide scan reads
    // through, uncached — rows never change); both the veto and row
    // parity are asserted, so the contract is tested, not just
    // documented.
    val data2 = java.nio.file.Files
      .createTempDirectory("graft-hintmix").toString + "/nation"
    spark.read.parquet(data).write.mode("overwrite").parquet(data2)
    val uri = s"graft://$data2"
    val sch = spark.read.parquet(data2).schema
    AdmissionHints.clear()
    val wide = spark.read.schema(sch).parquet(uri)
    wide.queryExecution.executedPlan // wide PLANS: records full width
    assert(AdmissionHints.widthFor(s"$data2/part-00000.parquet")
      .contains(sch.fields.length))
    // the concurrent narrow scan PLANS now: latest-wins flips the hint
    // under the floor before the wide scan has opened a single file
    spark.read.schema(sch).parquet(uri).select("n_name")
      .queryExecution.executedPlan
    assert(AdmissionHints.widthFor(s"$data2/part-00000.parquet").contains(1))
    // wide EXECUTES against the stale narrow hint: caching vetoed (the
    // shape mixed-width workloads accept when opting in, and why the
    // documented remedy is hints=off + the per-scan DSv2 conf channel)
    val before = cacheFiles()
    val wideRows = wide.collect().map(_.toString).sorted.toSeq
    assert(cacheFiles() == before,
      "the interleaved narrow hint must veto the wide scan's caching " +
        "(latest-wins contract)")
    assert(wideRows == spark.read.parquet(data2).collect()
        .map(_.toString).sorted.toSeq,
      "a mis-admitted wide scan must still return identical rows")
  }

  test("the rule is inert without the conf floor — installing the " +
      "extension alone changes nothing") {
    val hc = spark.sparkContext.hadoopConfiguration
    AdmissionHints.clear()
    hc.unset(graft.cache.CacheConfig.MinColumnsKey)
    try {
      val sch = spark.read.parquet(data).schema
      spark.read.schema(sch).parquet(s"graft://$data").select("n_name")
        .write.format("noop").mode("overwrite").save()
      assert(AdmissionHints.snapshot.isEmpty,
        "no floor configured -> the rule must record nothing")
    } finally hc.setInt(graft.cache.CacheConfig.MinColumnsKey, 3)
  }
}
