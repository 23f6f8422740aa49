package graft.cache

import org.scalatest.funsuite.AnyFunSuite

/** The health surface: on-demand probe (BookKeeperHealth semantics),
  * scheduled validation heartbeats into the coordinator, and failure
  * visibility when the disk state is inconsistent. */
class HealthServiceSpec extends AnyFunSuite with CacheFixture {

  test("on-demand probe reports alive + validated on a healthy cache") {
    val coord = new CacheCoordinator()
    val hs = new HealthService(manager, coord, "e1", conf)
    val r = hs.checkOnce()
    assert(r.alive && r.cachingOk && r.filesOk)
    assert(r.metrics.contains("bytes_from_cache"))
  }

  test("beat feeds the coordinator's liveness + cluster metrics") {
    val coord = new CacheCoordinator()
    // exercise the cache so the heartbeat carries non-zero metrics
    val f = TestFiles.write(tmp, "h/a.bin", TestFiles.alphabetContent(1, 100))
    val s = openCaching(f); readAll(s, 0, 500); s.close()
    val hs = new HealthService(manager, coord, "e1", conf)
    hs.beat()
    assert(coord.liveWorkers.map(_.host) == Seq("e1"))
    assert(coord.invalidWorkers.isEmpty)
    assert(coord.clusterMetrics("bytes_from_remote") > 0)
  }

  test("file inconsistency surfaces as a failed validation heartbeat") {
    val coord = new CacheCoordinator()
    // orphan mdfile = inconsistent disk state
    val orphan = CacheFileLayout.mdFile(cacheDir, "file:/nope/x.bin", 1)
    CacheFileLayout.ensureParent(orphan)
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1))
    val hs = new HealthService(manager, coord, "e1", conf)
    val r = hs.checkOnce()
    assert(r.alive && !r.filesOk)
    hs.beat()
    assert(coord.invalidWorkers == Seq("e1"))
  }

  test("scheduled beats arrive without an explicit call") {
    val coord = new CacheCoordinator()
    val hs = new HealthService(manager, coord, "e1", conf)
    hs.start(periodMs = 50L)
    try {
      val deadline = System.currentTimeMillis() + 5000
      while (coord.liveWorkers.isEmpty &&
        System.currentTimeMillis() < deadline) Thread.sleep(10)
      assert(coord.liveWorkers.map(_.host) == Seq("e1"))
    } finally hs.stop()
  }
}
