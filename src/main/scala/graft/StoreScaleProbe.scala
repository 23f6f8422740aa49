package graft

import org.apache.spark.sql.functions._

/** s15 per-batch cost ladder (SCALE.md): drives
  * [[graft.streaming.EventStreams.curationBatch]] directly over K
  * fixed-size id-ordered document batches and prints each batch's wall
  * time — the measurement the r13 verdict asked for after the r14 store
  * refactor (fold snapshots + bucketed/Bloom-probed gram store): with
  * the r13 layout, batch k re-aggregated k-1 line/quota partitions and
  * re-exploded the whole gram store, so per-batch time grew with batch
  * count; the refactor's contract is a flat-ish ladder (residual slope =
  * fold size growing with the corpus, not with partition count).
  *
  * Usage: runMain graft.StoreScaleProbe <sfDir> <nBatches> <batchRows>
  * Prints one JSON line:
  *   {"metric":"s15_batch_ladder","n_batches":K,"batch_rows":B,
  *    "times":[sec,...],"sf":...}
  */
object StoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = args(1).toInt
    val batchRows = args(2).toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic fixed-size batches: dense seq over doc_id order
    // (single-partition window is probe SETUP, outside every timed
    // region; the corpus tables fit — this is not an operator pattern)
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    val seqd = operators.Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "source", "text")
      .withColumn("seq", row_number().over(w).cast("long") - 1L)
      .filter(col("seq") < nBatches * batchRows)
      .persist()
    seqd.count()

    val base = java.nio.file.Files
      .createTempDirectory("graft-s15probe-").toString
    try {
      // budget far above the corpus so quota math runs but never zeroes
      // later batches' downstream work
      val budget = Long.MaxValue / 4
      val times = (0 until nBatches).map { b =>
        val bd = seqd
          .filter(col("seq") >= b * batchRows &&
            col("seq") < (b + 1) * batchRows)
          .drop("seq")
        val t0 = System.nanoTime()
        streaming.EventStreams.curationBatch(base, budget, bd, b.toLong)
        (System.nanoTime() - t0) / 1e9
      }
      val ts = times.map(t => f"$t%.2f").mkString("[", ",", "]")
      val line =
        s"""{"metric":"s15_batch_ladder","n_batches":$nBatches,""" +
          s""""batch_rows":$batchRows,"times":$ts,"sf":"$dir"}"""
      println(line)
      Console.err.println(line)
    } finally {
      seqd.unpersist()
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
      spark.stop()
    }
  }
}
