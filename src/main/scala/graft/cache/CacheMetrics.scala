package graft.cache

import java.util.concurrent.atomic.AtomicLong
import scala.collection.immutable.ListMap

/** Executor-local cache metrics, names following the reference's
  * docs/metrics.rst counters (hit/miss/eviction/invalidation and
  * MB-from-cache vs MB-from-source client stats). */
final class CacheMetrics {
  val cachedRequests = new AtomicLong
  val remoteRequests = new AtomicLong
  val nonlocalRequests = new AtomicLong
  val bytesFromCache = new AtomicLong
  val bytesFromRemote = new AtomicLong
  val extraReadBytes = new AtomicLong
  val evictions = new AtomicLong
  val invalidations = new AtomicLong
  val warmupRequests = new AtomicLong
  val warmupBytes = new AtomicLong
  val corruptionFallbacks = new AtomicLong
  val bytesFromPeers = new AtomicLong
  val bytesToPeers = new AtomicLong
  val peerFallbacks = new AtomicLong
  val peerWarmsSent = new AtomicLong
  val peerWarmsAccepted = new AtomicLong
  val vectoredRanges = new AtomicLong

  /** Server-side hit rate: cached / (cached + remote) block requests
    * (reference BookKeeper.java:213-229). */
  def hitRate: Double = {
    val c = cachedRequests.get + nonlocalRequests.get
    val t = c + remoteRequests.get
    if (t == 0) 0.0 else c.toDouble / t
  }

  def snapshot: ListMap[String, Long] = ListMap(
    "cached_requests" -> cachedRequests.get,
    "remote_requests" -> remoteRequests.get,
    "nonlocal_requests" -> nonlocalRequests.get,
    "bytes_from_cache" -> bytesFromCache.get,
    "bytes_from_remote" -> bytesFromRemote.get,
    "extra_read_bytes" -> extraReadBytes.get,
    "evictions" -> evictions.get,
    "invalidations" -> invalidations.get,
    "warmup_requests" -> warmupRequests.get,
    "warmup_bytes" -> warmupBytes.get,
    "corruption_fallbacks" -> corruptionFallbacks.get,
    "bytes_from_peers" -> bytesFromPeers.get,
    "bytes_to_peers" -> bytesToPeers.get,
    "peer_fallbacks" -> peerFallbacks.get,
    "peer_warms_sent" -> peerWarmsSent.get,
    "peer_warms_accepted" -> peerWarmsAccepted.get,
    "vectored_ranges" -> vectoredRanges.get)

  def reset(): Unit = Seq(cachedRequests, remoteRequests, nonlocalRequests,
    bytesFromCache, bytesFromRemote, extraReadBytes, evictions,
    invalidations, warmupRequests, warmupBytes, corruptionFallbacks,
    bytesFromPeers, bytesToPeers, peerFallbacks, peerWarmsSent,
    peerWarmsAccepted, vectoredRanges)
    .foreach(_.set(0))
}
