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
  *   [compactAt] [seg[:S1,S2,...]]
  * Ladders longer than the corpus wrap it with offset doc_ids (+10M per
  * pass) — re-crawl batches that the store must flag dup, the heaviest
  * probe shape.
  * With `compactAt` = k, runs compactGramStore after batch k completes —
  * the maintenance-window shape — and reports the gram-store file count
  * before/after plus the post-compaction batches' times (they must stay
  * on the ladder: compaction is probe-equivalent). With `compactAt` =
  * `auto` or `auto:N`, runs compaction whenever the store holds >= N
  * delta dirs (default 12 — the trigger policy the compactGramStore
  * scaladoc recommends from the r14 24-batch ladder), reporting every
  * firing — the production GC-policy shape rather than a one-shot
  * maintenance window.
  * With `seg[:S1,S2,...]` (default 1,2,4,8) as a 5th arg, runs the
  * SEGMENT-SHARDING ladder after the batches (r16 — the third 100 TB
  * lever from SCALE.md r15): for each segment count S, times every one
  * of the S independent probes of the finished store with the last
  * batch's grams ([[graft.streaming.EventStreams.gramStoreProbeSegment]])
  * and reports per-segment seconds — the claim under measure is that the
  * per-segment scan term drops ∝ 1/S, so max_sec approaches the
  * constant-term floor as S grows. A parity line (total pair
  * intersections, S=1 vs max S) rides along: sharding must never change
  * the probe's answer.
  *
  * Prints one JSON line:
  *   {"metric":"s15_batch_ladder","n_batches":K,"batch_rows":B,
  *    "times":[sec,...],("compactions":[{"after_batch":k,
  *    "files_before":F0,"files_after":F1,"sec":s},...],)
  *    ("seg_ladder":[{"s":S,"max_sec":..,"sum_sec":..,"seg_secs":[..]},
  *    ...],"seg_parity":{...},)"sf":...}
  */
object StoreScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = args(1).toInt
    val batchRows = args(2).toLong
    // one-shot (Int) vs trigger mode ("auto[:N]")
    val (compactAt, triggerN): (Option[Int], Option[Int]) =
      args.drop(3).headOption match {
        case None => (None, None)
        case Some(a) if a.startsWith("auto") =>
          (None, Some(a.split(":", 2).drop(1).headOption
            .map(_.toInt).getOrElse(12)))
        case Some(a) => (Some(a.toInt), None)
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic fixed-size batches: dense seq over doc_id order
    // (single-partition window is probe SETUP, outside every timed
    // region; the corpus tables fit — this is not an operator pattern).
    // When the requested ladder outruns the corpus, WRAP it: each extra
    // pass replays the same docs under offset ids (+10M per pass) — a
    // re-crawl stream, the realistic steady state, and the maximal
    // store-probe stress (every wrapped doc must be flagged dup against
    // the accumulated store).
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    val base0 = operators.Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "source", "text")
      .withColumn("seq", row_number().over(w).cast("long") - 1L)
    val corpusRows = base0.count()
    val target = nBatches * batchRows
    val passes = ((target + corpusRows - 1) / corpusRows).toInt
    val seqd = (0 until passes).map { i =>
      base0.withColumn("seq", col("seq") + lit(i * corpusRows))
        .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
    }.reduce(_ unionByName _)
      .filter(col("seq") < target)
      .persist()
    seqd.count()

    val base = java.nio.file.Files
      .createTempDirectory("graft-s15probe-").toString
    try {
      // budget far above the corpus so quota math runs but never zeroes
      // later batches' downstream work
      val budget = Long.MaxValue / 4
      def gramFiles(): Long = {
        val root = java.nio.file.Paths.get(s"$base/gramstore")
        if (!java.nio.file.Files.exists(root)) 0L
        else {
          val st = java.nio.file.Files.walk(root)
          try st.filter(java.nio.file.Files.isRegularFile(_)).count()
          finally st.close()
        }
      }
      val compactions = scala.collection.mutable.ListBuffer[String]()
      def record(afterBatch: Int)(run: => Boolean): Unit = {
        val f0 = gramFiles()
        val c0 = System.nanoTime()
        val fired = run
        val cs = (System.nanoTime() - c0) / 1e9
        if (fired)
          compactions += f"""{"after_batch":$afterBatch,"files_before":$f0,""" +
            f""""files_after":${gramFiles()},"sec":$cs%.2f}"""
      }
      val times = (0 until nBatches).map { b =>
        val bd = seqd
          .filter(col("seq") >= b * batchRows &&
            col("seq") < (b + 1) * batchRows)
          .drop("seq")
        val t0 = System.nanoTime()
        streaming.EventStreams.curationBatch(base, budget, bd, b.toLong)
        val t = (System.nanoTime() - t0) / 1e9
        if (compactAt.contains(b)) record(b) {
          streaming.EventStreams.compactGramStore(spark, s"$base/gramstore")
          true
        }
        else triggerN.foreach(n => record(b)(
          streaming.EventStreams.maybeCompactGramStore(
            spark, s"$base/gramstore", n)))
        t
      }
      val ts = times.map(t => f"$t%.2f").mkString("[", ",", "]")
      val compactNote =
        if (compactions.isEmpty) ""
        else s""""compactions":${compactions.mkString("[", ",", "]")},"""
      // ---- segment-sharding ladder (r16; scaladoc above) ----
      val segNote = args.drop(4).headOption.filter(_.startsWith("seg"))
        .map { a =>
          val segs = a.split(":", 2).drop(1).headOption
            .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(1, 2, 4, 8))
          // the last batch's grams, the ingest shape (tokenize + 3-gram
          // shingle hashes, exploded) — persisted so every timed probe
          // pays only the STORE side
          val lastDocs = seqd
            .filter(col("seq") >= (nBatches - 1).toLong * batchRows &&
              col("seq") < nBatches.toLong * batchRows)
            .drop("seq")
          val bg = lastDocs
            .withColumn("__tok", operators.Dedup.tokenCol)
            .select(col("doc_id"), col("lang"), col("source"),
              explode(graft.functions.TextHashes.shingleHash64Col(
                col("text"), col("__tok"), 3, emptyIfShort = true))
                .as("gh"))
            .persist()
          bg.count()
          val gram = s"$base/gramstore"
          def mat(df: org.apache.spark.sql.DataFrame): Double = {
            val t0 = System.nanoTime()
            df.write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          val ladder = segs.map { sN =>
            val secs = (0 until sN).map { k =>
              streaming.EventStreams.gramStoreProbeSegment(
                spark, gram, nBatches.toLong, bg, sN, k)
                .map(mat).getOrElse(0.0)
            }
            f"""{"s":$sN,"max_sec":${secs.max}%.2f,""" +
              f""""sum_sec":${secs.sum}%.2f,""" +
              s""""seg_secs":[${secs.map(x => f"$x%.2f").mkString(",")}]}"""
          }
          // parity: sharding must not change the probe's answer.
          // sum() over zero rows is NULL — coalesce before getLong or a
          // no-overlap store crashes the probe after all the ladder work
          def tot(sN: Int): (Long, Long) = streaming.EventStreams
            .gramStoreProbeSegmented(spark, gram, nBatches.toLong, bg, sN)
            .map(_.agg(count(lit(1)),
              coalesce(sum("inter"), lit(0L))).head())
            .map(r => (r.getLong(0), r.getLong(1))).getOrElse((0L, 0L))
          val (p1, i1) = tot(1)
          val (pS, iS) = tot(segs.max)
          require(p1 == pS && i1 == iS,
            s"segment parity broke: S=1 ($p1,$i1) vs S=${segs.max} ($pS,$iS)")
          bg.unpersist()
          s""""seg_ladder":[${ladder.mkString(",")}],""" +
            s""""seg_parity":{"pairs":$p1,"inter":$i1,"s_max":${segs.max}},"""
        }.getOrElse("")
      // outcome totals prove the ladder DID the work it claims (e.g.
      // wrapped re-crawl batches must land as dup, not admitted)
      val outcomes = spark.read.parquet(s"$base/out")
        .groupBy("outcome").count().collect()
        .map(r => s""""${r.getString(0)}":${r.getLong(1)}""")
        .sorted.mkString("{", ",", "}")
      val line =
        s"""{"metric":"s15_batch_ladder","n_batches":$nBatches,""" +
          s""""batch_rows":$batchRows,"times":$ts,$compactNote$segNote""" +
          s""""outcomes":$outcomes,"sf":"$dir"}"""
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
