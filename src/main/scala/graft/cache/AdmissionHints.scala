package graft.cache

/** Plan-time projection-width admission hints (SURVEY §4's optional
  * Catalyst-rule form, r16 — the last unbuilt SURVEY line).
  *
  * The DSv2 `format("graft")` path decides projection-width admission at
  * ScanBuilder.build() time and ships it cluster-correct inside the
  * scan's broadcast Hadoop conf (GraftDataSource). STOCK-format scans
  * over `graft://` paths (`spark.read.parquet("graft://…")`) never pass
  * through those builders, and the FS-side width gate
  * (GraftFileSystem.projectionAdmitted) only sees a projection when a
  * per-scan FS instance is initialized with the scan's own conf — with
  * the default JVM-cached FS the width is unknown and the gate stays
  * open. This registry closes that gap from the PLAN side:
  * [[graft.plans.AdmissionHintRule]] records each graft:// scan's pruned
  * width against its root dirs after planning, and
  * GraftFileSystem.open consults the hint per file.
  *
  * Why a side registry and not a plan rewrite: a post-pushdown rule that
  * copies a scan with only its hadoopConf/options changed is silently
  * DISCARDED by Catalyst — `transform` keeps the original node when old
  * and new compare equal, and FileScan.equals excludes hadoopConf
  * (measured in r15; scaladoc in GraftDataSource). Observing and
  * publishing out-of-band is the form that actually lands.
  *
  * Scope and semantics:
  *  - PROCESS-LOCAL: authoritative in local[*] and for driver-side opens
  *    (warmup, FileDownloader); on a multi-JVM cluster, executor-side
  *    stock-format opens fall back to width-unknown (admitted), exactly
  *    the pre-hint behavior — the cluster-correct channel remains the
  *    DSv2 conf.
  *  - ADVISORY, never correctness: a hint only decides whether a read is
  *    worth caching. Latest scan wins per root dir (hints describe the
  *    current plan's need); unknown width never refuses (reference
  *    parity — CacheUtil admits when the engine passes no column hint).
  *  - OPT-IN consumption (`graft.cache.admission.hints`, default off):
  *    because the registry is path-keyed and latest-wins, a narrow stock
  *    scan's hint also vetoes a CONCURRENT wide scan's opens on the same
  *    table — workloads that interleave both shapes on one table should
  *    leave it off and rely on the per-scan DSv2 conf channel, which is
  *    per-scan by construction. This is a TESTED contract, not just a
  *    caveat (r17: AdmissionHintRuleSpec reproduces the plan/execute
  *    interleaving deterministically — the loss is bounded to caching,
  *    rows never change; sequential mixed-width scans are safe because
  *    each scan re-records its own width at plan time). Recording is
  *    always on (cheap, and the registry doubles as plan-width
  *    observability).
  *  - Bounded: an access-ordered LRU of [[MaxEntries]] root dirs.
  */
object AdmissionHints {
  private val MaxEntries = 1024
  private val hints =
    new java.util.LinkedHashMap[String, Integer](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Integer]): Boolean =
        size() > MaxEntries
    }

  private def norm(p: String): String =
    if (p.length > 1 && p.endsWith("/")) p.dropRight(1) else p

  /** Registry key for a URI: AUTHORITY + path, scheme-stripped. The
    * authority matters (review r16): graft://bucketA/warehouse/t and
    * graft://bucketB/warehouse/t are different tables, and the graft->
    * inner mapping preserves the authority on both the record side
    * (plan root paths) and the lookup side (inner file paths), so the
    * key is symmetric across the scheme translation. */
  def keyOf(u: java.net.URI): String =
    Option(u.getAuthority).getOrElse("") + norm(
      Option(u.getPath).getOrElse(""))

  /** Record a scan's pruned top-level column count against one of its
    * root paths' [[keyOf]] keys. */
  def record(key: String, width: Int): Unit = synchronized {
    hints.put(norm(key), Integer.valueOf(width))
  }

  /** The hinted width for a FILE key: the key ITSELF first (a
    * single-file read records the file as its own root — review r16:
    * ancestor-only walking made the gate a no-op for direct-file
    * scans), then the nearest recorded ancestor (a partitioned table
    * records its root; files sit levels below). */
  def widthFor(fileKey: String): Option[Int] = synchronized {
    var p = norm(fileKey)
    var out = Option(hints.get(p)).map(_.intValue())
    while (out.isEmpty && p.nonEmpty && p != "/") {
      val i = p.lastIndexOf('/')
      if (i < 0) p = ""
      else {
        p = if (i == 0) "/" else p.substring(0, i)
        val v = hints.get(p)
        if (v != null) out = Some(v.intValue())
      }
    }
    out
  }

  /** The admission decision: refuse ONLY when a hint exists and sits
    * below the configured minimum; unknown width admits. */
  def admittedWidth(fileKey: String, minCols: Int): Boolean =
    minCols <= 0 || widthFor(fileKey).forall(_ >= minCols)

  def clear(): Unit = synchronized(hints.clear())

  def snapshot: Map[String, Int] = synchronized {
    import scala.jdk.CollectionConverters._
    hints.asScala.map { case (k, v) => k -> v.intValue() }.toMap
  }
}
