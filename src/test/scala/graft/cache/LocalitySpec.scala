package graft.cache

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.{FileStatus, Path}

class ConsistentHashRingSpec extends AnyFunSuite {
  private val nodes = (1 to 10).map(i => s"exec-$i")

  test("keys spread roughly evenly across nodes") {
    val ring = new ConsistentHashRing(nodes)
    val counts = (1 to 10000)
      .map(i => ring.locateKey(s"/data/file-$i:0:268435456").get)
      .groupBy(identity).view.mapValues(_.size)
    assert(counts.size == 10)
    val (mn, mx) = (counts.values.min, counts.values.max)
    assert(mx < mn * 4, s"distribution too skewed: min=$mn max=$mx")
  }

  test("node removal only remaps its own share") {
    val ring1 = new ConsistentHashRing(nodes)
    val ring2 = new ConsistentHashRing(nodes.filterNot(_ == "exec-7"))
    val keys = (1 to 5000).map(i => s"/data/f$i:0:268435456")
    val moved = keys.count { k =>
      val o1 = ring1.locateKey(k).get
      o1 != "exec-7" && ring2.locateKey(k).get != o1
    }
    assert(moved == 0, s"$moved keys moved that were not owned by the removed node")
  }

  test("split ownership is deterministic and split-stable") {
    val ring = new ConsistentHashRing(nodes)
    val a = ring.locateSplit("/d/x.parquet", 100, 256L << 20)
    val b = ring.locateSplit("/d/x.parquet", (256L << 20) - 1, 256L << 20)
    val c = ring.locateSplit("/d/x.parquet", 256L << 20, 256L << 20)
    assert(a == b, "same split -> same owner")
    assert(a.isDefined && c.isDefined)
  }

  test("empty ring locates nothing") {
    assert(new ConsistentHashRing(Nil).locateKey("k").isEmpty)
  }
}

class CacheAffinitySpec extends AnyFunSuite {
  test("blockLocations carve the file into owned splits") {
    ClusterState.setHosts(Seq("host-a", "host-b", "host-c"))
    try {
      val conf = {
        val c = new org.apache.hadoop.conf.Configuration()
        c.setLong(CacheConfig.SplitSizeKey, 1000L)
        CacheConfig.from(c)
      }
      val st = new FileStatus(3500, false, 1, 1000, 0L,
        new Path("graft:///d/f.parquet"))
      val locs = CacheAffinity.blockLocations(st, 0, 3500, conf)
      assert(locs.length == 4)
      assert(locs.map(_.getOffset).toSeq == Seq(0L, 1000L, 2000L, 3000L))
      assert(locs.last.getLength == 500)
      assert(locs.forall(l => Set("host-a", "host-b", "host-c")
        .contains(l.getHosts.head)))
      // deterministic across calls
      val locs2 = CacheAffinity.blockLocations(st, 0, 3500, conf)
      assert(locs.map(_.getHosts.head).sameElements(locs2.map(_.getHosts.head)))
    } finally ClusterState.setHosts(Nil)
  }
}

class WarmupServiceSpec extends AnyFunSuite with CacheFixture {
  private val content = TestFiles.alphabetContent(1, 100)

  private def newService(m: CacheManager): WarmupService = {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      new org.apache.hadoop.conf.Configuration())
    new WarmupService(m, p => fs.open(new Path(p)))
  }

  test("delayed merge: nothing drains inside the delay window") {
    val f = TestFiles.write(tmp, "w/a.bin", content)
    val svc = newService(manager)
    svc.enqueue("file:" + f, 0, 500, content.length.toLong, 1L)
    assert(svc.drainOnce(System.currentTimeMillis()) == 0,
      "inside delay window -> not eligible")
    assert(svc.pendingCount == 1)
  }

  test("adjacent+overlapping requests coalesce to one download; blocks cached") {
    val f = TestFiles.write(tmp, "w/b.bin", content)
    val p = "file:" + f
    val svc = newService(manager)
    svc.enqueue(p, 0, 300, content.length.toLong, 1L)
    svc.enqueue(p, 200, 600, content.length.toLong, 1L)
    svc.enqueue(p, 300, 700, content.length.toLong, 1L)
    val scheduled = svc.drainOnce(System.currentTimeMillis() + 10000)
    assert(scheduled == 1, s"RangeSet must merge to one range, got $scheduled")
    // wait for the worker
    val deadline = System.currentTimeMillis() + 5000
    while (System.currentTimeMillis() < deadline &&
      !manager.metadataFor(p).exists(_.allCached(0, 7))) Thread.sleep(50)
    assert(manager.metadataFor(p).exists(_.allCached(0, 7)),
      "blocks 0-6 must be cached after warmup")
    // warmed bytes are readable through the cached path
    val s = openCaching(f)
    val got = readAll(s, 0, 700)
    s.close()
    assert(got.sameElements(content.slice(0, 700)))
  }

  test("warmup downloads bill the enqueuer's MetricsTag (pool inheritance)") {
    val f = TestFiles.write(tmp, "w/t.bin", content)
    val p = "file:" + f
    val svc = newService(manager)
    // the enqueue happens on a query thread carrying a tag; the download
    // runs later on an untagged pool worker — withInherited must carry
    // the attribution across
    MetricsTag.withInherited(Some("warm-attrib-test")) {
      svc.enqueue(p, 0, 500, content.length.toLong, 1L)
    }
    assert(svc.drainOnce(System.currentTimeMillis() + 10000) == 1)
    val deadline = System.currentTimeMillis() + 5000
    while (System.currentTimeMillis() < deadline &&
      manager.metrics.taggedSnapshot("warm-attrib-test")("warmup_bytes") == 0L)
      Thread.sleep(50)
    val tagged = manager.metrics.taggedSnapshot("warm-attrib-test")
    assert(tagged("warmup_bytes") > 0L,
      s"download must bill the enqueuer's tag, got $tagged")
    manager.metrics.dropTag("warm-attrib-test")
  }

  test("threads spawned inside a withTag window do NOT inherit the tag") {
    // A lazily-created pool thread must not permanently bill a finished
    // query's tag (the InheritableThreadLocal leak the local-property
    // fallback had): only withInherited carries attribution across.
    // reuse an already-active session if one exists; otherwise create a
    // private one AND stop it — leaving a stray session active makes
    // later suites' getOrCreate silently inherit the wrong master conf
    // (e.g. StreamRetrySpec's local[4, 2] task-retry setting)
    import org.apache.spark.sql.SparkSession
    val existing = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .filter(!_.sparkContext.isStopped)
    val spark = existing.getOrElse(SparkSession.builder()
      .master("local[2]").appName("metricstag-leak").getOrCreate())
    try {
      val seen = new java.util.concurrent.atomic.AtomicReference[Option[String]](None)
      MetricsTag.withTag(spark, "leak-test-tag") {
        assert(MetricsTag.current.contains("leak-test-tag"),
          "the tagging thread itself must carry the tag")
        val t = new Thread(() => seen.set(MetricsTag.current))
        t.start(); t.join()
      }
      assert(seen.get().isEmpty,
        s"child thread inherited the tag: ${seen.get()}")
      assert(MetricsTag.current.isEmpty, "tag must clear after the window")
    } finally if (existing.isEmpty) spark.stop()
  }

  test("conflicting mtimes: newest wins, stale request dropped") {
    val f = TestFiles.write(tmp, "w/c.bin", content)
    val p = "file:" + f
    val svc = newService(manager)
    svc.enqueue(p, 0, 300, content.length.toLong, 1000L)
    svc.enqueue(p, 500, 800, content.length.toLong, 2000L) // newer mtime
    val scheduled = svc.drainOnce(System.currentTimeMillis() + 10000)
    assert(scheduled == 1, "only the newest-mtime request survives the merge")
    val deadline = System.currentTimeMillis() + 5000
    while (System.currentTimeMillis() < deadline &&
      !manager.metadataFor(p).exists(_.allCached(5, 8))) Thread.sleep(50)
    assert(manager.metadataFor(p).exists(_.allCached(5, 8)))
    assert(manager.metadataFor(p).exists(m => !m.isBlockCached(0)),
      "stale-mtime range must not be warmed")
  }

  test("parallel-warmup read path: miss served direct, cache filled async") {
    val warmConf = {
      val c = new org.apache.hadoop.conf.Configuration()
      c.setInt(CacheConfig.BlockSizeKey, 100)
      c.set(CacheConfig.CacheDirKey, cacheDir)
      c.setBoolean(CacheConfig.ParallelWarmupKey, true)
      c.setLong(CacheConfig.WarmupDelayKey, 0L)
      CacheConfig.from(c)
    }
    val m2 = new CacheManager(warmConf)
    m2.warmup = Some(newService(m2))
    val f = TestFiles.write(tmp, "w/d.bin", content)
    val s = openCaching(f, m2)
    val got = readAll(s, 100, 400)
    s.close()
    assert(got.sameElements(content.slice(100, 500)), "miss must serve direct")
    m2.warmup.get.drainOnce(System.currentTimeMillis() + 10000)
    val deadline = System.currentTimeMillis() + 5000
    val p = "file:" + f
    while (System.currentTimeMillis() < deadline &&
      !m2.metadataFor(p).exists(_.allCached(1, 5))) Thread.sleep(50)
    assert(m2.metadataFor(p).exists(_.allCached(1, 5)),
      "async warmup must cache the missed blocks")
  }
}

/** Intra-read chain fan-out (readThreads > 0): mixed cached/remote plans
  * executed concurrently must stay byte-exact and fully warm the cache. */
class ParallelChainSpec extends org.scalatest.funsuite.AnyFunSuite with CacheFixture {
  private val content = TestFiles.alphabetContent(1, 200) // 5200 bytes, 52 blocks

  test("parallel chain execution is byte-exact for mixed plans") {
    val c = new org.apache.hadoop.conf.Configuration()
    c.setInt(CacheConfig.BlockSizeKey, 100)
    c.set(CacheConfig.CacheDirKey, cacheDir)
    c.setBoolean(CacheConfig.StrictKey, true)
    c.setInt(CacheConfig.ReadThreadsKey, 4)
    c.setInt(CacheConfig.MaxReadRequestKey, 300) // force many chains
    val mgr = new CacheManager(CacheConfig.from(c))
    val f = TestFiles.write(tmp, "p/par.bin", content)
    // pre-warm a scattered set of blocks so plans interleave cached+remote
    val s0 = openCaching(f, mgr)
    Seq(400, 1200, 2600, 4400).foreach(p => readAll(s0, p, 100))
    s0.close()
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      val pos = rnd.nextInt(content.length - 1500)
      val len = 300 + rnd.nextInt(1200)
      val s = openCaching(f, mgr)
      val got = readAll(s, pos, len)
      s.close()
      assert(got.sameElements(content.slice(pos, pos + len)), s"at $pos+$len")
    }
    // everything read is now cached; a full warm read touches no source
    val s1 = openCaching(f, mgr)
    readAll(s1, 0, content.length); s1.close()
    val before = mgr.metrics.bytesFromRemote.get
    val s2 = openCaching(f, mgr)
    assert(readAll(s2, 0, content.length).sameElements(content))
    s2.close()
    assert(mgr.metrics.bytesFromRemote.get == before)
  }
}
