package graft.operators

/** Overlap independent Spark ACTIONS from driver threads (guide §2.6:
  * actions are only sequential because driver code calls them
  * sequentially — submitting independent output writes concurrently
  * lets the next job's tasks back-fill executors freed by the current
  * job's tail). Used for the per-batch store writes of the streaming
  * curation pipelines and d59's bootstrap artifact writes: each write
  * targets its own path, inputs are persisted/checkpointed frames, so
  * ordering is immaterial and idempotence (overwrite-keyed dirs) is
  * unchanged. Failures propagate with their original exception type
  * (first failure wins), so the bench's failure classification and the
  * foreachBatch retry discipline see exactly what serial code threw.
  */
private[graft] object Par {
  def writes(work: (() => Unit)*): Unit = {
    if (work.size <= 1) { work.foreach(_()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(work.size)
    try {
      val futs = work.map(w =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = w()
        }))
      var first: Throwable = null
      futs.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (first == null) first = e.getCause
        }
      }
      if (first != null) throw first
    } finally pool.shutdown()
  }
}
