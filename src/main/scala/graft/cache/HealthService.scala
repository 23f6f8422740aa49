package graft.cache

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

/** Cache health surface — the reference's client health checker plus its
  * scheduled self-validation, collapsed onto the in-process design:
  *
  *  - `BookKeeperHealth.isBookKeeperAlive` (rubix-client
  *    BookKeeperHealth.java) probes the daemon over thrift; here
  *    [[HealthService.checkOnce]] probes the embedded [[CacheManager]]
  *    with a real `getCacheStatus` round-trip on a synthetic key — the
  *    same "does the cache answer queries" semantic without the RPC hop.
  *  - The reference schedules `CachingValidator`/`FileValidator` every
  *    30 min on each worker (validation/CachingValidator.java:39-186);
  *    [[HealthService.start]] runs the same pair on a daemon scheduler
  *    and feeds the result + a metrics snapshot into
  *    [[CacheCoordinator.heartbeat]], which is what the reference's
  *    worker→coordinator validation heartbeat carries.
  *
  * Metric REPORTING stays on Spark's MetricsSystem ([[CacheMetricsSource]]):
  * JMX/StatsD/Graphite packaging is a Spark sink configuration, not code —
  * the reference needed its own codahale reporter zoo only because it had
  * no host metrics bus.
  */
final class HealthService(mgr: CacheManager, coordinator: CacheCoordinator,
    host: String, conf: CacheConfig) {

  final case class HealthReport(alive: Boolean, cachingOk: Boolean,
      filesOk: Boolean, metrics: Map[String, Long])

  /** On-demand health probe (the BookKeeperHealth semantic): cheap enough
    * for an engine-side readiness check. `deep=true` adds the synthetic
    * end-to-end cache-path validation (the 30-min validator, ~ms here). */
  def checkOnce(deep: Boolean = true): HealthReport = {
    val alive =
      try {
        // status round-trip on a synthetic key; NOT_CACHED is a healthy
        // answer — what matters is that the manager answers at all
        // constant mtime: a changing one would bump the probe entry's
        // generation every beat (staleness invalidation)
        mgr.getCacheStatus(s"graft-health://$host/probe", 1L, 0L, 0, 0)
        true
      } catch { case _: Exception => false }
    val cachingOk = !deep || CacheValidator.validateCaching(conf)
    val filesOk = CacheValidator.filesConsistent(conf)
    HealthReport(alive, cachingOk, filesOk, mgr.metrics.snapshot)
  }

  @volatile private var exec: ScheduledExecutorService = _

  /** Schedule validation + heartbeat every `periodMs` (reference default
    * is 30 min; tests pass small values). Idempotent. */
  def start(periodMs: Long): Unit = synchronized {
    if (exec != null) return
    exec = Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-cache-health"); t.setDaemon(true); t
    }
    exec.scheduleAtFixedRate(() => beat(), 0L, periodMs, TimeUnit.MILLISECONDS)
  }

  /** One validation + heartbeat cycle (what each scheduled tick runs). */
  def beat(): Unit = {
    val r = checkOnce()
    coordinator.heartbeat(host, cachingValidated = r.alive && r.cachingOk,
      fileValidated = r.filesOk, metrics = r.metrics)
  }

  def stop(): Unit = synchronized {
    if (exec != null) { exec.shutdownNow(); exec = null }
  }
}
