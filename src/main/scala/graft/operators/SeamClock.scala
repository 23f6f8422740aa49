package graft.operators

import org.apache.spark.sql.DataFrame

/** Driver-sync barrier instrumentation for the composed pipeline chains
  * (r17, from the r16 verdict's "stall amplification" flag).
  *
  * Each eager `localCheckpoint(true)` in the d47/d57 chains is a
  * driver-synchronized job boundary: the chain's wall-clock is the SUM of
  * its barriers' latencies, so on a contended cluster the chain inherits
  * the sum of the scheduler/stall TAIL at every seam — the r16 driver
  * window (canary 4.4×) amplified to 6–33× on exactly this family while
  * single-plan queries rode at the window tax. To make that amplification
  * MEASURABLE (and its reduction verifiable), every barrier routes
  * through [[ck]]: outside a recording scope it is byte-for-byte
  * `df.localCheckpoint(true)`; inside one (the bench shared lane) the
  * barrier's name and wall seconds land in a thread-local ledger that the
  * artifact carries as `seams` — seam count + per-seam times per chain.
  *
  * Thread-local on purpose: the concurrent arm builds chains from many
  * threads at once, and those executions must neither pay nor pollute the
  * lane's ledger.
  */
object SeamClock {
  private val tl =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[(String, Double)]]()

  /** Run `body` with seam recording on THIS thread; returns the result
    * plus the ordered (seam name, barrier seconds) ledger. Nesting not
    * supported (the inner scope would steal the outer's ledger) — the
    * bench lane never nests. */
  def recording[T](body: => T): (T, Seq[(String, Double)]) = {
    val buf = new scala.collection.mutable.ArrayBuffer[(String, Double)]()
    tl.set(buf)
    try { val r = body; (r, buf.toList) }
    finally tl.remove()
  }

  /** LAZY-SEAM MODE (r17 experiment, `graft.chain.lazy.seams` system
    * property): `localCheckpoint(eager = false)` provides the SAME
    * lineage truncation the seams exist for — the returned frame's plan
    * is a depth-1 LogicalRDD either way, so the measured r12 win
    * (driver-side analysis of stitched trees dominating warm cost) is
    * preserved — but the materialization folds into the FIRST consuming
    * job instead of a dedicated count() job. A chain of k eager seams is
    * k sequential driver-sync stall draws on a contended cluster; lazy,
    * the same chain materializes in as few jobs as the outputs demand.
    * Spark completes any partially-computed lazy checkpoint at
    * first-job end (LocalRDDCheckpointData.doCheckpoint), so truncation
    * safety is unchanged.
    *
    * Default ON since r19: the pending lane A/B ran (QBench seamlane,
    * same window, 3 reps/arm) — lazy ≤ eager on every rep, lane med
    * 17.25 s vs 17.84 s; the residual per-seam ledger cost is plan
    * COMPILATION (paid either way), so eager's extra count() job buys
    * nothing at this SF and costs one stall draw per seam on a
    * contended cluster. Set the property to "false" to force the eager
    * form. */
  private def lazySeams: Boolean =
    !sys.props.get("graft.chain.lazy.seams").contains("false")

  /** A checkpoint barrier (eager by default, see [[lazySeams]]), timed
    * when a recording scope is active on this thread. */
  private[graft] def ck(name: String)(df: DataFrame): DataFrame = {
    val eager = !lazySeams
    val buf = tl.get()
    if (buf == null) df.localCheckpoint(eager)
    else {
      val t0 = System.nanoTime()
      val out = df.localCheckpoint(eager)
      buf += (name -> (System.nanoTime() - t0) / 1e9)
      out
    }
  }

  /** A non-checkpoint driver-sync barrier (e.g. a fixpoint round's
    * convergence aggregate): times `body` into the ledger when
    * recording. */
  private[graft] def barrier[T](name: String)(body: => T): T = {
    val buf = tl.get()
    if (buf == null) body
    else {
      val t0 = System.nanoTime()
      val out = body
      buf += (name -> (System.nanoTime() - t0) / 1e9)
      out
    }
  }
}
