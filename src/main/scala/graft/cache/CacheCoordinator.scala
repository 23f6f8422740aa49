package graft.cache

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Driver-side cache coordinator — the reference's CoordinatorBookKeeper +
  * WorkerBookKeeper heartbeat pair (rubix-bookkeeper
  * CoordinatorBookKeeper.java:31-145, HeartbeatService.java:39-182)
  * collapsed onto Spark's existing control plane: executors don't need
  * their own liveness protocol (Spark already tracks executor liveness);
  * what remains worth centralizing is per-executor cache health + metric
  * aggregation for operators' dashboards.
  *
  * Executors call [[heartbeat]] (piggybacked on whatever cadence the
  * deployment wires — a scheduled task or task-completion hooks); the
  * driver reads [[liveWorkers]] / [[clusterMetrics]]. Workers expire after
  * `livenessExpiryMs` without a heartbeat, mirroring the reference's
  * expiring-cache liveness map.
  */
final class CacheCoordinator(livenessExpiryMs: Long = 60000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  final case class WorkerReport(
      host: String,
      lastHeartbeatMs: Long,
      cachingValidated: Boolean,
      fileValidated: Boolean,
      metrics: Map[String, Long])

  private val workers = new ConcurrentHashMap[String, WorkerReport]()

  def heartbeat(host: String, cachingValidated: Boolean = true,
      fileValidated: Boolean = true,
      metrics: Map[String, Long] = Map.empty): Unit =
    workers.put(host, WorkerReport(host, clock(), cachingValidated,
      fileValidated, metrics))

  def liveWorkers: Seq[WorkerReport] = {
    val cutoff = clock() - livenessExpiryMs
    workers.values().asScala.filter(_.lastHeartbeatMs >= cutoff).toSeq
      .sortBy(_.host)
  }

  /** Workers that reported validation failure (reference: validated-cache
    * liveness map, CoordinatorBookKeeper.java:96-127). */
  def invalidWorkers: Seq[String] =
    liveWorkers.filterNot(w => w.cachingValidated && w.fileValidated)
      .map(_.host)

  /** Sum of each metric across live workers (cluster-wide hit rate etc). */
  def clusterMetrics: Map[String, Long] =
    liveWorkers.flatMap(_.metrics.toSeq)
      .groupMapReduce(_._1)(_._2)(_ + _)
}
