package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** A streaming query exceeded its (drift-scaled) wall-clock budget.
  *
  * This class exists so harness code can tell an ENVIRONMENT-class
  * failure (slow measurement window starved an AvailableNow drain) apart
  * from a correctness-class failure: the r17 round was voided because
  * s15's fixed 300 s `require(awaitTermination(...))` fired on a 4.15x
  * degraded window and `Bench.main` turned it into rc=1 — "window slow"
  * must never read as "engine broken" (VERDICT r17, What's-wrong #1). */
final class StreamTimeoutException(msg: String) extends RuntimeException(msg)

/** Central await-with-budget for every driver-facing streaming query.
  *
  * The base budget per call site is the quiet-window budget (sized with
  * ~10x headroom over the quiet runtime). The EFFECTIVE budget is
  * `base * scale`, where scale comes from, in precedence order:
  *   1. system property `graft.stream.timeout.scale` — set by Bench once
  *      its canary machinery has measured the window's drift (same JVM);
  *   2. env `SPARK_GRAFT_STREAM_TIMEOUT_SCALE` — for driver/CI runs that
  *      know their window is shared;
  *   3. 1.0.
  * The scale is clamped to [1, 16]: stream timeouts exist to bound a
  * genuinely-hung query, and 16x the quiet budget is far beyond any
  * observed window degradation (r16/r17 measured 4.1-4.5x).
  *
  * A timeout throws [[StreamTimeoutException]] (after stopping the
  * query) instead of `require`'s IllegalArgumentException, so callers
  * can classify it; the query result would be partial, so it still must
  * throw — the non-fatality lives in how Bench RECORDS it, not in
  * returning partial data. */
object StreamWait {
  def scale: Double =
    sys.props.get("graft.stream.timeout.scale")
      .orElse(sys.env.get("SPARK_GRAFT_STREAM_TIMEOUT_SCALE"))
      .flatMap(s => scala.util.Try(s.toDouble).toOption)
      .map(v => math.max(1.0, math.min(v, 16.0)))
      .getOrElse(1.0)

  /** Await `q` for at most `baseMs * scale`; stop it on every path.
    * Throws [[StreamTimeoutException]] on timeout. */
  def await(q: StreamingQuery, baseMs: Long): Unit = {
    val budget = (baseMs * scale).toLong
    val done =
      try q.awaitTermination(budget)
      finally if (q.isActive) q.stop()
    if (!done)
      throw new StreamTimeoutException(
        s"streaming query ${q.name} timed out at ${budget / 1000}s " +
          s"(base ${baseMs / 1000}s x window scale ${scale}) - " +
          "table would be partial")
  }
}
