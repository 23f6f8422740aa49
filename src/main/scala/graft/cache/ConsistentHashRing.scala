package graft.cache

import java.util.TreeMap
import com.google.common.hash.Hashing
import java.nio.charset.StandardCharsets.UTF_8

/** Consistent-hash ring assigning ownership of 256 MB file splits to
  * cluster nodes (reference: rubix-spi ClusterManager.java:44-130, which
  * rings MetroHash over the worker set; we use murmur3_128 + virtual
  * nodes — same stability contract: adding/removing a node only remaps
  * ~1/n of the keyspace).
  *
  * Key = "path:splitStart:splitEnd" exactly like the reference
  * (CachingFileSystem.java:416-429), so ownership is stable across
  * schedulers and rounds.
  */
final class ConsistentHashRing(nodes: Seq[String], vnodes: Int = 64) {
  private val hf = Hashing.murmur3_128()
  private val ring = new TreeMap[Long, String]()
  nodes.distinct.foreach { n =>
    (0 until vnodes).foreach { v =>
      ring.put(hf.hashString(s"$n#$v", UTF_8).asLong(), n)
    }
  }

  def isEmpty: Boolean = ring.isEmpty
  def nodeCount: Int = nodes.distinct.size

  def locateKey(key: String): Option[String] = {
    if (ring.isEmpty) return None
    val h = hf.hashString(key, UTF_8).asLong()
    val e = ring.ceilingEntry(h)
    Some(if (e != null) e.getValue else ring.firstEntry().getValue)
  }

  /** Owner of the split containing byte `offset` of `path`. */
  def locateSplit(path: String, offset: Long, splitSize: Long): Option[String] = {
    val s = (offset / splitSize) * splitSize
    locateKey(s"$path:$s:${s + splitSize}")
  }
}

/** Executor membership for the ring. On a real cluster this is fed by a
  * SparkListener on the driver (executorAdded/Removed — the analog of the
  * reference's YARN/Presto membership polling, Hadoop2ClusterManager /
  * PrestoClusterManager); in local mode it is a single localhost entry.
  */
object ClusterState {
  @volatile private var hosts: Vector[String] = Vector.empty
  @volatile private var ringCache: ConsistentHashRing = _

  def setHosts(h: Seq[String]): Unit = synchronized {
    hosts = h.toVector.distinct.sorted
    ringCache = new ConsistentHashRing(hosts)
  }

  def addHost(h: String): Unit = synchronized { setHosts(hosts :+ h) }
  def removeHost(h: String): Unit = synchronized { setHosts(hosts.filterNot(_ == h)) }

  def currentHosts: Seq[String] = hosts
  def ring: Option[ConsistentHashRing] =
    Option(ringCache).filter(!_.isEmpty)

  /** Spark listener keeping membership fresh; register on the driver via
    * sparkContext.addSparkListener(new ClusterState.Listener). */
  final class Listener extends org.apache.spark.scheduler.SparkListener {
    override def onExecutorAdded(
        e: org.apache.spark.scheduler.SparkListenerExecutorAdded): Unit =
      addHost(e.executorInfo.executorHost)
    override def onExecutorRemoved(
        e: org.apache.spark.scheduler.SparkListenerExecutorRemoved): Unit = ()
    // removal is deliberately lazy: ownership is a locality HINT; stale
    // hosts only cost a scheduling preference miss, never correctness
    // (SURVEY risk #3: dynamic allocation churn).
  }
}
