package graft

import org.apache.spark.sql.SparkSession

/** Persist-leak guard for long-lived sessions.
  *
  * Several operators persist intermediates (dedup signature tables, the
  * connected-components label frontier, IVF training sets) that are still
  * referenced by the lazily-returned DataFrame — the operator itself cannot
  * unpersist them before the caller materializes the result. Left alone,
  * a session that runs many such queries accumulates pinned storage until
  * memory pressure degrades every later query (the round-5 bench measured
  * an otherwise code-unchanged per-row projection at 3× its prior time for
  * exactly this reason).
  *
  * `PinScope.run` runs the block (which must MATERIALIZE the query —
  * count, write, collect) and then clears the session's SQL cache via
  * `spark.catalog.clearCache()` plus a sweep of any still-pinned raw RDDs.
  * Clearing the whole SQL cache — not just the delta — is deliberate:
  * DataFrame.persist registers a plan-keyed entry in Spark's CacheManager,
  * and unpersisting only the underlying buffer RDD would leave a live
  * entry whose storage level has been reset to NONE; a later run of the
  * same query body would plan-match that entry and silently degrade every
  * persist-then-reuse pattern (the CC label loop, the IVF training set)
  * into recompute-per-reference. There is no public API to uncache an
  * unnamed entry selectively, so the scope's contract is: caller-cached
  * tables do not survive it either — callers who interleave their own
  * caches should re-cache after the scope.
  *
  * localCheckpoint()ed frames (eager or lazy — d59's in-memory store
  * frames, the s15 batch stages, the bpeIterate rounds) do NOT merely
  * recompute after the sweep: checkpointing SEVERS lineage, so
  * unpersisting a localCheckpointed RDD destroys its only copy and any
  * later reference hard-fails with a missing-checkpoint-block error
  * (r18 advice). Checkpointed frames must therefore never span a scope
  * boundary — every current caller creates and fully consumes them
  * inside one scope (the bench materializes each query before the
  * sweep), which is the contract.
  */
object PinScope {
  def run[A](spark: SparkSession)(body: => A): A =
    try body
    finally {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking = false))
    }

  /** Count of currently pinned RDDs — bench asserts this returns to zero
    * between queries. */
  def pinnedCount(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size
}
