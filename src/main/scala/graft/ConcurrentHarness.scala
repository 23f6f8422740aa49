package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concurrent-execution harness for the gate queries.
  *
  * The reference's perf and stress drivers are explicitly concurrent —
  * `rubix-stress/rubix_stressor.py:18-60` runs 8 threads over 19 queries
  * against one warm cache, `perf/perf.go:38-75` launches 10 simultaneous
  * runs — while graft's gate ran strictly sequentially through round 8. A
  * cache/analytics layer for a 1000-executor cluster serves many queries
  * at once, so concurrency is part of the contract, not an optimization:
  * this harness runs a pool of gate queries from many threads on ONE
  * SparkSession (Spark's scheduler is designed for multi-threaded job
  * submission) and requires every concurrent execution to reproduce the
  * result fingerprint of its sequential run.
  *
  * Lane discipline (r10): only s* queries remain on the serial lane —
  * they mutate session confs around stream starts and re-create fixed
  * checkpoint dirs, which is inherently process-global. The c* family
  * ran serial through round 9 because c08/c11/c12 asserted DELTAS of
  * session-global cache counters; those contracts now read per-execution
  * TAGGED counters (MetricsTag/CacheMetrics.taggedSnapshot) and every c*
  * scratch dir and catalog name carries a per-execution suffix, so the
  * whole cache family races freely — the multi-tenant shape a real
  * deployment has. The one cross-talk channel left is the s*
  * shuffle-partition override, whose window can change how many
  * partitions a concurrently-planned query shuffles through — a
  * plan-shape change, never a result change (gate queries are
  * partition-count-invariant by construction), and the fingerprint check
  * would catch any violation.
  *
  * Pinned intermediates: several pool queries persist subtrees they
  * cannot unpersist before materialization (e07/e08/e10's exact arm, the
  * d10/d25 component frontier). The harness deliberately runs WITHOUT a
  * per-task [[PinScope]] — a scope clearing the whole SQL cache would
  * sweep other threads' live pins mid-flight (correctness-safe, since
  * unpersist only forces recompute, but a pathological interleaving tax).
  * Callers sweep once with `PinScope.run(spark)(())` after the phase.
  */
object ConcurrentHarness {

  /** Gate names that must not run concurrently with EACH OTHER (fixed
    * stream checkpoint dirs + session-conf windows) and therefore ride
    * the serial lane: s* only since r10 — c*'s metric contracts moved to
    * per-execution tagged counters and per-execution scratch dirs. */
  def serialLane(name: String): Boolean = name.startsWith("s")

  /** Deterministic, order-insensitive result fingerprint: (row count,
    * Σ (xxhash64(canonical-JSON row) & (2^40 − 1))). The mask keeps the
    * ANSI-mode sum exact up to ~8M result rows (gate results are far
    * smaller) while staying sensitive to duplicate rows, which a plain
    * bit_xor would cancel. One aggregate job — the fingerprint IS the
    * materialization, so a task that hashes has also executed the full
    * query. */
  def resultHash(df: DataFrame): (Long, Long) = {
    val rowHash = xxhash64(to_json(struct(df.columns.map(col): _*)))
      .bitwiseAND(lit((1L << 40) - 1))
    val r = df.select(count(lit(1)).as("n"), sum(rowHash).as("h")).collect()(0)
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  final case class Outcome(totalSec: Double, executed: Int,
      mismatches: Seq[String], errors: Seq[String])

  /** Runs `rounds` shuffled repetitions of every (name, build) task from
    * `threads` worker threads; each execution re-fingerprints the result
    * and compares against `expected` (the sequential run). Tasks whose
    * name is in the [[serialLane]] go to one dedicated worker in
    * submission order (mutual exclusion among themselves, full
    * concurrency with everything else); that worker helps drain the
    * shared queue once its lane is dry. Shuffle order is seeded per
    * round so failures replay. */
  def run(threads: Int, rounds: Int,
      tasks: Seq[(String, () => DataFrame)],
      expected: Map[String, (Long, Long)]): Outcome = {
    val shared = new ConcurrentLinkedQueue[(String, () => DataFrame)]()
    val serial = new ConcurrentLinkedQueue[(String, () => DataFrame)]()
    (1 to rounds).foreach { r =>
      new scala.util.Random(41 + r).shuffle(tasks).foreach { t =>
        if (serialLane(t._1)) serial.add(t) else shared.add(t)
      }
    }
    val mismatches = new ConcurrentLinkedQueue[String]()
    val errors = new ConcurrentLinkedQueue[String]()
    val executed = new java.util.concurrent.atomic.AtomicInteger(0)
    def drain(q: ConcurrentLinkedQueue[(String, () => DataFrame)]): Unit = {
      var task = q.poll()
      while (task != null) {
        val (name, build) = task
        try {
          val got = resultHash(build())
          executed.incrementAndGet()
          if (expected(name) != got) mismatches.add(
            s"$name: sequential ${expected(name)} != concurrent $got")
        } catch {
          case e: Throwable =>
            errors.add(s"$name: ${e.getClass.getName}: ${e.getMessage}")
        }
        task = q.poll()
      }
    }
    val t0 = System.nanoTime()
    val workers = (0 until threads).map { i =>
      val t = new Thread(
        () => {
          if (i == 0) drain(serial) // the serial lane, in order
          drain(shared)
        },
        s"graft-concurrent-$i")
      t.setDaemon(true)
      t
    }
    workers.foreach(_.start())
    workers.foreach(_.join())
    Outcome((System.nanoTime() - t0) / 1e9, executed.get(),
      mismatches.iterator().asScala.toSeq, errors.iterator().asScala.toSeq)
  }
}
