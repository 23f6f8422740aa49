package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.datasources.v2.{BatchScanExec, FileScan}

/** Plan-time admission hints (SURVEY §4's optional Catalyst-rule form;
  * design rationale + scope in [[graft.cache.AdmissionHints]]): after the
  * planner runs — projection pruning final, rewrite-equality traps
  * irrelevant because this rule only OBSERVES — record every graft://
  * scan's pruned top-level column count against its root dirs, for the
  * FS layer to consult at open() time. Injected as the
  * pre-columnar-transition rule (GraftExtensions): that hook runs on
  * every execution path — non-AQE plan preparation AND each AQE stage —
  * whereas post-planner strategy rules only fire inside
  * AdaptiveSparkPlanExec, which never wraps an exchange-free scan-only
  * query. Covers BOTH scan paths:
  *
  *  - v1 `FileSourceScanExec` (stock `spark.read.parquet("graft://…")` —
  *    the path that previously had no width admission at all under the
  *    JVM-cached FS): width = `requiredSchema`;
  *  - DSv2 `BatchScanExec(FileScan)` (the `format("graft")` path and any
  *    stock v2 file scan): width = `readDataSchema`. Redundant with the
  *    ScanBuilder conf channel for graft-format scans, recorded anyway
  *    for one consistent registry.
  *
  * Inert unless `graft.cache.min.projected.columns` > 0 in the session's
  * Hadoop conf (the default is 0), so installing the extension changes
  * no gate result — AdmissionHintRuleSpec pins both halves. Repeated
  * application (AQE re-planning) is an idempotent registry put. */
case class AdmissionHintRule(session: SparkSession) extends Rule[SparkPlan] {

  override def apply(plan: SparkPlan): SparkPlan = {
    // Floor resolution, cheap on every application (per query, per AQE
    // stage): a session-level `spark.conf.set("spark.hadoop.<key>")`
    // override wins when present — ONE RuntimeConfig map lookup, unlike
    // newHadoopConf(), which clones the full Configuration + merges every
    // SQL conf per call (review r16) — else the context's live Hadoop
    // conf. This closes the r16 advice's silent no-op: a floor set only
    // at session level previously enabled the FS gate while the rule
    // recorded nothing (fail-open). Mirrors Hadoop-conf merge order
    // (spark.hadoop.* overlays the context conf), and stays DYNAMIC in
    // both sources — the inert-by-default contract must react to a
    // mid-session unset (AdmissionHintRuleSpec pins both).
    val minCols = session.conf
      .getOption("spark.hadoop." + graft.cache.CacheConfig.MinColumnsKey)
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption)
      .getOrElse(session.sparkContext.hadoopConfiguration
        .getInt(graft.cache.CacheConfig.MinColumnsKey, 0))
    if (minCols > 0) plan.foreach {
      case s: FileSourceScanExec =>
        recordRoots(s.relation.location.rootPaths,
          s.requiredSchema.fields.length)
      case b: BatchScanExec => b.scan match {
        case fs: FileScan =>
          recordRoots(fs.fileIndex.rootPaths,
            fs.readDataSchema.fields.length)
        case _ => ()
      }
      case _ => ()
    }
    plan
  }

  private def recordRoots(roots: Seq[org.apache.hadoop.fs.Path],
      width: Int): Unit =
    roots.filter(p => Option(p.toUri.getScheme).contains("graft"))
      .foreach(p => graft.cache.AdmissionHints.record(
        graft.cache.AdmissionHints.keyOf(p.toUri), width))
}
