package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints JSON lines, the LAST of which is the
  * machine-readable artifact:
  *   {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
  *
  * Each query is fully materialized via the noop sink (count() could let
  * Catalyst prune the work).
  *
  * Timing methodology (round 8 revision — measurement integrity):
  *
  * 1. COLD pass: one run per query; dominated by Janino codegen + JIT
  *    warmup (0.5-2 s per novel plan shape at sf0.1). Reported as
  *    `cold_total_sec` only.
  * 2. WARM passes: THREE full passes over the suite, each in a SEEDED
  *    SHUFFLED order (seed = pass index, recorded in the artifact as
  *    `order_seeds`); the per-query number is the MEDIAN of its pass
  *    times. Rationale for the median: the r6-vs-r7 A/A re-run of a
  *    byte-identical tree swung single-shot times 8x down (d09, e01) and
  *    1.6x up (d07). Rationale for the shuffle (r10 verdict "What's
  *    wrong" #2): the driver's r10 run put 5 phantom >2x entries on the
  *    FIRST four queries of the fixed order — a cold-window signature.
  *    Shuffling decorrelates suite position from query identity, so an
  *    environmental noise window taxes three different neighborhoods
  *    instead of the same queries three times. The max over queries of
  *    (max-min)/median across the passes is reported as `rep_spread_max`.
  *    TWO fixed CANARY queries (never suite members) run every 20
  *    queries: a scan shape (lineitem scan + groupBy agg) and, since
  *    r15, a driver-synchronized iterative shape (3-round
  *    localCheckpoint fixpoint) — the r14 window doubled d30 and
  *    stalled a q39 rep while the scan canary read quiet, so the stall
  *    class that only bites at driver-sync boundaries needs its own
  *    sensor. Times ride the artifact (`canary`, `canary_iter`);
  *    tools/regression.py flags runs where either drifts beyond 2x.
  *    SHARED-FAMILY EXCEPTION (r16, from the r15 rc=124 timeout): the
  *    five composed-pipeline gates (d47/d48/d57/d59/d60) run in warm
  *    pass 1 ONLY — one warm rep each, carried as min=med=max. Their
  *    regression signal is the shared-materialization lane below (3
  *    reps, chain priced once); re-pricing each ~25-30 s chain per gate
  *    per pass cost ~220 s/run and double-counted the family by the
  *    repo's own r13 policy analysis. tools/regression.py already
  *    excludes them from the per-query >2x table when the lane covers
  *    them; `warm_reps_shared` in the artifact records the rep count.
  * 3. RAW-OPERATOR timings (`ops` dict): the d06/d07 gate bodies conflate
  *    operator cost with their oracle-verification arm (exact-Jaccard
  *    recomputation / planted-twin doubling). `d06_op` times ONLY
  *    Dedup.lshCandidates over a pre-materialized signature table;
  *    `d07_op` times Dedup.simhashCandidates over the single (undoubled)
  *    corpus. Median of three, same as warm.
  * 4. FAILURE POISONING: a throwing query no longer becomes a silent -1
  *    (which made the round look faster). Failed names are carried in a
  *    `failed` array in the artifact and the run ends by throwing, so the
  *    driver records rc != 0.
  * 5. WINDOW FIT (r16, after BENCH_r15.json landed rc=124/parsed:null —
  *    the suite outgrew the driver's wall-clock budget and a SIGTERM
  *    mid-warm left only stopped-SparkContext spam in the tail):
  *    (a) the artifact is FLUSHED to bench_artifact.json at every phase
  *        boundary (cold / each warm pass / ops / shared / conc) with a
  *        "phase" field, so a killed run still leaves a parseable
  *        same-code artifact on disk;
  *    (b) a JVM shutdown hook quiesces the run (queries short-circuit
  *        to -1 without touching Spark, failure spam is suppressed) and
  *        prints the latest partial artifact LAST, so the driver's tail
  *        capture parses even on rc=124;
  *    (c) a soft DEADLINE (env SPARK_GRAFT_BENCH_DEADLINE, seconds;
  *        default 1700 — the r14 envelope that fit the driver window)
  *        is checked before each remaining arm with a conservative cost
  *        estimate; arms that would overrun are skipped and recorded in
  *        the artifact's "skipped" array. The reference's own perf
  *        protocol is bounded by construction (perf/perf.go:38-75 runs
  *        a fixed small query set); this keeps ours bounded too.
  *
  * Output layout (driver keeps the TAIL of stdout; r3/r5/r6/r7 artifacts
  * all lost the totals because a ~2600-char full-name queries dict pushed
  * them out of the capture window): verbose lines (full names,
  * min/med/max per query) print FIRST for humans and BASELINE.md work;
  * the LAST line is compact — totals plus a short-id queries dict
  * ("q26":0.24 instead of "q26_math_funcs":0.240) that fits the window
  * whole. Short ids are the name prefix before the first underscore,
  * verified unique at startup.
  */
object Bench {

  /** The composed-pipeline family: priced ONCE in the warm phase (their
    * regression signal is the shared lane) and excluded from the
    * concurrent arm's pool (the r15 conc arm grew 214->343 s because the
    * self-selecting top-20 pool carried four 25-30 s chain gates x 3
    * rounds — exactly the growth that overflowed the driver window;
    * their concurrency safety is pinned by the concsoak protocol and
    * earlier rounds' arms, and their components d47_pack/d57_pack/... are
    * exercised through the shared lane every run). */
  private val SharedFamily = Set(
    "d47_pipeline_pack", "d48_pipeline_attrition",
    "d57_incremental_pipeline", "d59_store_handoff",
    "d60_incremental_attrition")

  /** Set by the shutdown hook: every not-yet-started timed region
    * short-circuits to -1 without touching the (stopping) SparkContext,
    * and failure recording is suppressed — the r15 timeout filled the
    * 2000-char tail with 100+ identical stopped-SparkContext failures. */
  @volatile private var shuttingDown = false
  @volatile private var completed = false
  @volatile private var latestArtifact = ""
  @volatile private var latestTotals = ""

  /** Median with the even-count case averaged: a deadline-skipped third
    * pass leaves 2 reps per query, and taking the UPPER middle there
    * would report max(a,b) — a systematic upward bias feeding phantom
    * >2x flags into the next round's regression table (review r16). */
  private def medOf(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }
  private def median3(a: Double, b: Double, c: Double): Double =
    medOf(Seq(a, b, c))

  def main(args: Array[String]): Unit = {
    val benchT0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - benchT0) / 1e9
    val deadline = sys.env.get("SPARK_GRAFT_BENCH_DEADLINE")
      .map(_.toDouble).getOrElse(1700.0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
        shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val failed = scala.collection.mutable.ListBuffer[String]()
    val skipped = scala.collection.mutable.ListBuffer[String]()
    // Per-failure diagnostics (r13 verdict "What's wrong" #1): the c13/c14/c15
    // full-suite failures were undiagnosable post-hoc because the exception
    // text only went to stderr, which the driver's tail capture dropped. The
    // FIRST exception per name is recorded here (class + message + first 3
    // stack frames) and rides the artifact as a `failures` dict.
    val failures = scala.collection.mutable.LinkedHashMap[String, String]()
    def recordFailure(name: String, e: Throwable): Unit = {
      if (!shuttingDown && !failed.contains(name)) {
        failed += name
        val frames = e.getStackTrace.take(3).map(_.toString).mkString(" <- ")
        failures(name) =
          s"${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)} @ $frames"
        Console.err.println(s"BENCH FAILURE in $name: ${failures(name)}")
      }
    }

    // Each materialization runs inside a PinScope: intermediates it
    // persists (dedup signature tables, CC label frontier, IVF training
    // set) are unpersisted as soon as the query materializes, so pinned
    // storage can't accumulate across the ~4xN executions and silently
    // tax later queries' execution memory (the r5 bench measured
    // code-unchanged per-row projections at 3x their prior time from
    // exactly this).
    def timeOnce(name: String)(body: => Unit): Double = {
      if (shuttingDown) return -1.0
      PinScope.run(spark) {
        val t0 = System.nanoTime()
        try body
        catch { case e: Throwable =>
          recordFailure(name, e)
          return -1.0
        }
        (System.nanoTime() - t0) / 1e9
      }
    }

    def materialize(name: String): Double = timeOnce(name) {
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }

    val names = SparkEntry.allDefs.map(_.name)
    val shortIds = names.map(_.takeWhile(_ != '_'))
    require(shortIds.distinct.size == names.size,
      s"short-id collision in ${names.size} query names")

    // Fixed canary (never a suite member): full lineitem scan + groupBy
    // agg — one stable plan whose time depends only on the environment.
    // Interleaved through the warm phase, its sequence exposes noise
    // windows (CPU steal, page-cache eviction) that would otherwise be
    // indistinguishable from query regressions.
    val canaryTimes = scala.collection.mutable.ListBuffer[Double]()
    // SECOND canary (r15, from the r14 verdict): driver-synchronized /
    // iterative shape — a 3-round mini-fixpoint with an eager
    // localCheckpoint barrier per round, mirroring d30/q39's execution
    // pattern. The r14 driver window doubled d30's median and put a
    // 24.9 s rep on q39 while the scan canary read QUIET: the scan shape
    // is blind to stalls that only bite at driver-sync boundaries
    // (scheduler pauses, GC at collect points). Never a suite member.
    val canaryIterTimes = scala.collection.mutable.ListBuffer[Double]()
    def canaryScanOnce(): Double = timeOnce("canary") {
      operators.Tables.load(spark, sfDir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(org.apache.spark.sql.functions.sum("l_quantity").as("qty"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    def canaryIterOnce(): Double = timeOnce("canary_iter") {
      val c = operators.Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey").as("k"), col("c_nationkey").as("v"))
      var cur = c.localCheckpoint(true)
      (0 until 3).foreach { _ =>
        val reps = cur.groupBy("v")
          .agg(org.apache.spark.sql.functions.min("k").as("k"))
        cur = c.join(reps.select("k"), Seq("k"), "left_semi")
          .localCheckpoint(true)
      }
      cur.write.format("noop").mode("overwrite").save()
    }
    def runCanary(record: Boolean): Unit = {
      val t = canaryScanOnce()
      if (record && t >= 0) canaryTimes += t
      val t2 = canaryIterOnce()
      if (record && t2 >= 0) canaryIterTimes += t2
    }
    // Late-phase canary brackets (r15): the ops/shared/concurrent phases
    // run AFTER the last warm-pass canary, so a noise window there was
    // previously only attributable by a separate focused re-run (the r15
    // shared-lane 1.38x drift cost exactly that). One scan+iter pair at
    // each phase boundary rides the artifact as `canary_late`. A FAILED
    // late canary (timeOnce -1) is recorded as {"at":tag,"failed":true}
    // rather than a negative time the drift check would read as quiet
    // (r15 advice); regression.py flags failed entries explicitly.
    val lateCanaries = scala.collection.mutable.ListBuffer[String]()
    def markPhase(tag: String): Unit = {
      val s = canaryScanOnce()
      val i = canaryIterOnce()
      lateCanaries +=
        (if (s >= 0 && i >= 0) f"""{"at":"$tag","scan":$s%.3f,"iter":$i%.3f}"""
         else s"""{"at":"$tag","failed":true}""")
    }

    // ---- partial-artifact machinery (r16 window fit, scaladoc #5) ----
    // All phase results live in mutable state so buildArtifact can emit a
    // consistent partial artifact at ANY boundary; the shutdown hook
    // prints the latest one LAST so a SIGTERM'd run still parses.
    var coldTotal = 0.0
    val warmReps = scala.collection.mutable.Map[String, List[Double]]()
      .withDefaultValue(Nil)
    var opTimes: Seq[(String, Double)] = Nil
    var sharedTimes: Seq[(String, Double)] = Nil
    var concJson = """{"skipped":true}"""
    val orderSeeds = scala.collection.mutable.ListBuffer[Int]()

    def currentWarm: Seq[(String, Double, Double, Double)] = names.map { n =>
      val reps = warmReps(n)
      if (reps.isEmpty || reps.exists(_ < 0)) (n, -1.0, -1.0, -1.0)
      else (n, reps.min, medOf(reps), reps.max)
    }

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case '\t' => "\\t"; case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""

    def buildArtifact(phase: String): (String, String) = {
      val warm = currentWarm
      val ok = warm.filter(_._3 >= 0)
      val total = ok.map(_._3).sum
      // noise floor, ATTRIBUTED (r8 verdict nit: a bare rep_spread_max of
      // 3.41 couldn't say which query breathed): carry the TOP-3 spread
      // queries' name + min/med/max in the compact artifact.
      val spreadTop = ok
        .sortBy { case (_, mn, md, mx) =>
          if (md > 0) -(mx - mn) / md else 0.0 }
        .take(3)
      val (spreadName, spreadMin, spreadMed, spreadMax, repSpreadMax) =
        spreadTop.headOption match {
          case None => ("none", 0.0, 0.0, 0.0, 0.0)
          case Some((n, mn, md, mx)) =>
            (n, mn, md, mx, if (md > 0) (mx - mn) / md else 0.0)
        }
      val spreadTopJson = spreadTop.map { case (n, mn, md, mx) =>
        f"""{"q":"$n","min":$mn%.2f,"med":$md%.2f,"max":$mx%.2f}"""
      }.mkString("[", ",", "]")
      // Cache hit rate over the whole run (c* queries rescan warmed
      // files): server formula = (cached + nonlocal) / all block requests
      // (BASELINE.md "Server hit rate"; reference BookKeeper.java:213-229).
      val m = try operators.CacheQueries.metricsSnapshot(spark)
        catch { case _: Exception => Map.empty[String, Long] }
      val hits = m.getOrElse("cached_requests", 0L) +
        m.getOrElse("nonlocal_requests", 0L)
      val reqs = hits + m.getOrElse("remote_requests", 0L)
      val hitRate = if (reqs == 0) 0.0 else hits.toDouble / reqs
      val failedJson = failed.distinct.map("\"" + _ + "\"")
        .mkString("[", ",", "]")
      val skippedJson = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
      val failuresJson = failures.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
        .mkString("{", ",", "}")
      val opsJson = opTimes.map { case (k, v) => f""""$k":$v%.3f""" }
        .mkString("{", ",", "}")
      val sharedJson = sharedTimes.map { case (k, v) => f""""$k":$v%.3f""" }
        .mkString("{", ",", "}")
      val qs = names.zip(shortIds).zip(warm).map { case ((_, sid), (_, _, md, _)) =>
        f""""$sid":$md%.2f"""
      }.mkString("{", ",", "}")
      def canarySummary(ts: Seq[Double]): (Double, Double) =
        if (ts.isEmpty) (0.0, 0.0) else (ts.sorted.apply(ts.size / 2), ts.max)
      def canaryJsonOf(ts: Seq[Double]): String = {
        val (med, mx) = canarySummary(ts)
        val seq = ts.map(t => f"$t%.2f").mkString("[", ",", "]")
        f"""{"med":$med%.3f,"max":$mx%.3f,"n":${ts.size},"times":$seq}"""
      }
      val (canMed, canMax) = canarySummary(canaryTimes.toSeq)
      val (canIMed, canIMax) = canarySummary(canaryIterTimes.toSeq)
      val canaryJson = canaryJsonOf(canaryTimes.toSeq)
      val canaryIterJson = canaryJsonOf(canaryIterTimes.toSeq)
      val canaryLateJson = lateCanaries.mkString("[", ",", "]")
      val seedsJson = orderSeeds.mkString("[", ",", "]")
      // reps = warm passes actually EXECUTED (a deadline skip leaves 1-
      // or 2-rep medians; hardcoding 3 would misdocument the run's
      // statistical basis — review r16); the shared family is always 1.
      val reps = math.max(orderSeeds.size, 1)
      val meta =
        f""""phase":${jstr(phase)},"elapsed_sec":$elapsed%.1f,"deadline_sec":$deadline%.0f,"skipped":$skippedJson,"warm_reps_shared":1"""
      val artifact =
        f"""{"metric":"total","value":$total%.3f,"unit":"sec","cold_total_sec":$coldTotal%.3f,"reps":$reps,$meta,"rep_spread_max":$repSpreadMax%.2f,"spread_worst":{"q":"$spreadName","min":$spreadMin%.2f,"med":$spreadMed%.2f,"max":$spreadMax%.2f},"spread_top":$spreadTopJson,"cache_hit_rate":$hitRate%.4f,"canary":$canaryJson,"canary_iter":$canaryIterJson,"canary_late":$canaryLateJson,"order_seeds":$seedsJson,"conc":$concJson,"failed":$failedJson,"failures":$failuresJson,"ops":$opsJson,"shared":$sharedJson,"queries":$qs,"sf":"$sfDir"}"""
      // Totals-only compact line, printed AFTER the full artifact: the
      // driver keeps only the last ~2000 chars of output, and the
      // 185-entry queries dict pushes the full line's head (value / cold
      // / hit-rate / conc) out of that window (r9 VERDICT "What's wrong"
      // #1). This short line always fits the tail, so the committed
      // BENCH_r{N}.json is self-sufficient; tools/regression.py recovers
      // per-query values from the big line's surviving "queries"
      // fragment or the committed bench_artifact.json.
      val totalsOnly =
        f"""{"metric":"totals_only","value":$total%.3f,"unit":"sec","cold_total_sec":$coldTotal%.3f,"reps":$reps,$meta,"rep_spread_max":$repSpreadMax%.2f,"spread_worst":{"q":"$spreadName","min":$spreadMin%.2f,"med":$spreadMed%.2f,"max":$spreadMax%.2f},"spread_top":$spreadTopJson,"cache_hit_rate":$hitRate%.4f,"canary":{"med":$canMed%.3f,"max":$canMax%.3f,"n":${canaryTimes.size}},"canary_iter":{"med":$canIMed%.3f,"max":$canIMax%.3f,"n":${canaryIterTimes.size}},"canary_late":$canaryLateJson,"conc":$concJson,"failed":$failedJson,"failures":$failuresJson,"shared":$sharedJson,"n_queries":${names.size},"sf":"$sfDir"}"""
      (artifact, totalsOnly)
    }

    def writeArtifactFile(file: String, a: String, t: String): Unit =
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(file),
        (a + "\n" + t + "\n").getBytes("UTF-8"))
      catch { case e: Exception =>
        Console.err.println(s"[bench] could not write $file: $e")
      }

    def flush(phase: String): Unit = {
      val (a, t) = buildArtifact(phase)
      latestArtifact = a
      latestTotals = t
      // Full artifact lands on disk at every phase boundary (cwd = repo
      // root under sbt runMain): a killed run still leaves a committed
      // bench_artifact.json carrying the complete per-query dict for
      // next round's tools/regression.py.
      writeArtifactFile("bench_artifact.json", a, t)
    }

    // The shutdown hook fires on a timeout SIGTERM: quiesce the main
    // loop, give it a moment to pass its current query, REBUILD the
    // artifact (capturing warm reps accumulated since the last phase
    // boundary), write it to bench_artifact_killed.json — the file
    // channel survives even when the harness's stdout pipe pump (sbt)
    // died with the same signal and the prints go nowhere — and print
    // it LAST so a still-alive tail capture parses. Measured on a
    // kill -TERM drill: stdout through a dead sbt is lost; the file
    // write is not.
    val hook = new Thread(() => {
      if (!completed) {
        shuttingDown = true
        Thread.sleep(800)
        // Racy by construction (main may be mutating warmReps mid-query),
        // so the rebuild lands in a SEPARATE file: a torn-but-non-throwing
        // snapshot must never replace the last good phase-boundary
        // bench_artifact.json that next round's regression.py reads
        // (review r16). Any failure falls back to printing the last
        // boundary flush.
        try {
          val (a, t) = buildArtifact("killed")
          writeArtifactFile("bench_artifact_killed.json", a, t)
          latestArtifact = a
          latestTotals = t
        } catch { case _: Throwable => () }
        val a = latestArtifact; val t = latestTotals
        if (a.nonEmpty) {
          println(a); println(t)
          Console.err.println(a); Console.err.println(t)
          Console.out.flush(); Console.err.flush()
        }
      }
    }, "graft-bench-artifact-hook")
    Runtime.getRuntime.addShutdownHook(hook)

    // Conservative arm-cost estimates (seconds at sf0.1, from the r14/r15
    // artifacts) for the deadline guard: an arm starts only when
    // elapsed + estimate fits the deadline.
    val estWarmPass = 250.0 // non-shared warm pass (r15: 322 incl. shared)
    val estOps = 40.0
    val estShared = 190.0 // 3 reps x ~58 s lane
    def fits(est: Double): Boolean = elapsed + est <= deadline

    // ---- cold pass (1 rep) ----
    names.foreach { n =>
      val t = materialize(n)
      if (!shuttingDown)
        require(PinScope.pinnedCount(spark) == 0,
          s"$n leaked ${PinScope.pinnedCount(spark)} pinned RDDs past its scope")
      if (t >= 0) coldTotal += t
    }
    runCanary(record = false) // pay the canary's codegen outside the data
    flush("cold")

    // ---- warm passes: 3 seeded-shuffled passes over the suite; the
    // shared family runs in pass 1 only (scaladoc #2) ----
    Seq(1, 2, 3).foreach { seed =>
      val passNames =
        if (seed == 1) names else names.filterNot(SharedFamily)
      if (seed == 1 || fits(estWarmPass)) {
        orderSeeds += seed
        val order = new scala.util.Random(seed).shuffle(passNames)
        runCanary(record = true)
        order.zipWithIndex.foreach { case (n, i) =>
          warmReps(n) = warmReps(n) :+ materialize(n)
          if ((i + 1) % 20 == 0) runCanary(record = true)
        }
        flush(s"warm_pass_$seed")
      } else if (!skipped.contains(s"warm_pass_$seed")) {
        skipped += s"warm_pass_$seed"
        Console.err.println(s"[bench] deadline: skipping warm pass $seed " +
          f"(elapsed $elapsed%.0f s + est $estWarmPass%.0f > $deadline%.0f)")
      }
    }

    // Shared lane runs BEFORE the ops arm (r16, from run C: a slow
    // window kept the 40 s ops arm and lost the 190 s lane): when the
    // deadline can only afford one of them, the family's regression
    // signal wins over four stable raw-operator numbers.
    // ---- shared-materialization lane (round 13): the composed-pipeline
    // family priced as a PIPELINE — each chain built ONCE per rep with
    // its outputs attributed separately, the way a production run pays
    // for it. The per-gate numbers above deliberately price each query's
    // full chain (per-query costing policy); by r12 that policy made the
    // family 46% of warm wall-clock and the suite total a
    // measurement-policy artifact (r12 verdict "What's wrong" #2). The
    // artifact carries BOTH: `queries` stays per-gate for the hash-gate
    // cost record; `shared` is the regression signal tools/regression.py
    // reads for this family. Chain time = the eager stage seams
    // (checkpoint materialization); output times = each output's
    // residual work against the shared frames. Median of 3 reps, one
    // PinScope per rep (pins swept between reps, never mid-chain).
    if (fits(estShared)) {
      markPhase("shared")
      sharedTimes = {
        def t(body: => Unit): Double = {
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        def noop(df: org.apache.spark.sql.DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        def rep(): Seq[(String, Double)] =
          if (shuttingDown) Nil
          else try PinScope.run(spark) {
            var bst: operators.PipelineQueries.Stages = null
            var ist: operators.PipelineQueries.IncStages = null
            var base59: String = null
            Seq(
              "d47_chain" -> t { bst = operators.PipelineQueries.build(spark, sfDir) },
              "d47_pack" -> t { noop(operators.PipelineQueries.packBoot(bst)) },
              "d48_attrition" -> t { noop(operators.PipelineQueries.attritionBoot(bst)) },
              "d57_chain" -> t { ist = operators.PipelineQueries.buildInc(spark, sfDir) },
              "d57_pack" -> t { noop(operators.PipelineQueries.packInc(ist)) },
              "d60_attrition" -> t { noop(operators.PipelineQueries.attritionInc(ist)) },
              // d59's decomposition (r13 advice): the bootstrap store-write
              // and the cold incremental consumer, priced separately
              "d59_boot" -> t { base59 = operators.PipelineQueries.bootStoreJob(spark, sfDir) },
              "d59_inc" -> t { noop(operators.PipelineQueries.incStoreJob(spark, sfDir, base59)) })
          } catch { case e: Throwable =>
            recordFailure("shared_lane", e)
            Nil
          }
        val reps = Seq.fill(3)(rep()).filter(_.nonEmpty)
        if (reps.size < 3) Nil
        else reps.head.map(_._1).map { k =>
          val vs = reps.map(_.toMap.apply(k))
          k -> median3(vs(0), vs(1), vs(2))
        }
      }
      flush("shared")
    } else skipped += "shared"

    // ---- raw-operator timings: operator cost WITHOUT the oracle arm ----
    if (fits(estOps)) {
      markPhase("ops")
      val docs = operators.Tables.load(spark, sfDir, "documents")
      opTimes = Seq[(String, () => Seq[Double])](
        "d06_op" -> { () =>
          // Signature table materialized OUTSIDE each timed region: d06_op is
          // the banded candidate join alone, the reusable-artifact shape a
          // pipeline at 100 TB runs against a persisted signature store.
          // PinScope clears the SQL cache after every rep, so the persist +
          // count is redone per rep — always before the clock starts.
          Seq.fill(3) {
            val sigs = operators.Dedup.signatures(docs).persist()
            sigs.count()
            timeOnce("d06_op") {
              operators.Dedup.lshCandidates(sigs)
                .write.format("noop").mode("overwrite").save()
            }
          }
        },
        "d07_op" -> { () =>
          Seq.fill(3)(timeOnce("d07_op") {
            operators.Dedup.simhashCandidates(docs)
              .write.format("noop").mode("overwrite").save()
          })
        },
        "d56_op" -> { () =>
          // The DOULION production arm ALONE (r12 verdict housekeeping:
          // the d56 gate re-pays d41's exact arm for its in-band error
          // contract; a real corpus runs only the estimator). Canonical
          // edge list + the deterministic p=1/4 sample are materialized
          // OUTSIDE the clock (persisted artifacts at 100 TB); the timed
          // region is the sampled orientation + wedge close + scale.
          Seq.fill(3) {
            val es = operators.GraphQueries.canonicalEdges(spark, sfDir)
              .filter(org.apache.spark.sql.functions
                .expr("(a * 100003L + b * 7919L) % 1000000L") < 250000L)
              .persist()
            es.count()
            timeOnce("d56_op") {
              operators.GraphQueries.trianglesOf(es)
                .agg((org.apache.spark.sql.functions.count(
                  org.apache.spark.sql.functions.lit(1)) * 64)
                  .as("est_triangles"))
                .write.format("noop").mode("overwrite").save()
            }
          }
        },
        "e10_op" -> { () =>
          // Quantized-retrieval scoring arm alone: the e10 gate number is
          // dominated by the exact float truth arm + recall contract; this
          // times the int8 kernel (native IntCosineSim, round 9) over
          // pre-encoded code tables — the shape a 100 TB retrieval scan
          // actually runs. Encode + persist happen OUTSIDE the clock
          // (PinScope sweeps the pins after each rep).
          val base = operators.Tables.load(spark, sfDir, "embeddings")
          Seq.fill(3) {
            val q = base.filter(col("vec_id") < 10)
              .select(col("vec_id").as("qid"),
                operators.VectorQueries.int8Codes(col("embedding")).as("qq"))
              .persist()
            val c = base.filter(col("vec_id") >= 10)
              .select(col("vec_id").as("cid"),
                operators.VectorQueries.int8Codes(col("embedding")).as("qc"))
              .persist()
            q.count(); c.count()
            timeOnce("e10_op") {
              operators.VectorQueries.quantizedTop5(q, c)
                .write.format("noop").mode("overwrite").save()
            }
          }
        }
      ).map { case (opName, run) =>
        val reps = run()
        val t = if (reps.exists(_ < 0)) -1.0
          else median3(reps(0), reps(1), reps(2))
        opName -> t
      }
      flush("ops")
    } else skipped += "ops"

    // ---- concurrent arm (round 9): mirror the reference's stress
    // protocol (rubix_stressor.py 8 threads; perf.go 10 concurrent
    // runs) — 8 threads x 3 shuffled rounds over the 20 heaviest
    // NON-chain queries (SharedFamily excluded, see its scaladoc), every
    // execution fingerprint-checked against its sequential run. c*/s*
    // participate on a dedicated SERIAL lane (mutual exclusion among
    // themselves — global cache counters, scratch dirs, checkpoints —
    // while running concurrently with the whole SQL surface; see
    // ConcurrentHarness scaladoc). A mismatch or error poisons the
    // artifact like any other bench failure. ----
    // Arm cost is estimated FROM the measured warm medians, because the
    // r16 full run proved a flat constant lies: the expected-hash pass
    // alone costs ~one sequential execution of the pool (~170 s at
    // sf0.1) before the concurrent rounds even start, and the rounds'
    // wall is floored by the serial-lane members' sum x rounds. Model:
    // est ~= poolWarmSum x (1 hash pass + ~2.5 for 3 rounds at 8
    // threads with the measured serial-lane mix) — 3.5x total for the
    // full arm, 2.5x for the reduced 10x2 fallback, which preserves the
    // stress signal when the window is tight instead of dropping it.
    val warmMed = currentWarm.map { case (n, _, md, _) => n -> md }.toMap
    val poolAll = names
      .filterNot(SharedFamily)
      .filter(n => warmMed.getOrElse(n, -1.0) >= 0)
      .sortBy(n => -warmMed(n))
    def poolSum(k: Int): Double = poolAll.take(k).map(warmMed).sum
    val concCfg: Option[(Int, Int)] =
      if (fits(poolSum(20) * 3.5)) Some((20, 3))
      else if (fits(poolSum(10) * 2.5)) Some((10, 2))
      else if (fits(poolSum(8) * 1.7)) Some((8, 1))
      else None
    concCfg match {
      case Some((poolN, rounds)) =>
        markPhase("conc")
        val concPool = poolAll.take(poolN)
        val concExpected = concPool.map { n =>
          n -> PinScope.run(spark)(
            ConcurrentHarness.resultHash(SparkEntry.queries(n)(spark, sfDir)))
        }.toMap
        val conc = ConcurrentHarness.run(threads = 8, rounds = rounds,
          concPool.map(n => n -> (() => SparkEntry.queries(n)(spark, sfDir))),
          concExpected)
        PinScope.run(spark)(()) // one sweep after the whole phase
        (conc.mismatches ++ conc.errors).foreach { msg =>
          Console.err.println(s"BENCH FAILURE in concurrent arm: $msg")
        }
        if (conc.mismatches.nonEmpty || conc.errors.nonEmpty) {
          failed += "concurrent_arm"
          failures("concurrent_arm") =
            (conc.mismatches ++ conc.errors).take(3).mkString(" | ").take(600)
        }
        val concSerial = concPool.count(ConcurrentHarness.serialLane)
        concJson =
          f"""{"threads":8,"rounds":$rounds,"pool":${concPool.size},"reduced":${poolN < 20},"serial_lane":$concSerial,"executed":${conc.executed},"total_sec":${conc.totalSec}%.3f,"mismatches":${conc.mismatches.size},"errors":${conc.errors.size}}"""
        flush("conc")
      case None => skipped += "conc"
    }

    markPhase("end")

    // ---- verbose (humans + BASELINE.md): full names, min/med/max ----
    currentWarm.foreach { case (n, mn, md, mx) =>
      println(f"""{"q":"$n","min":$mn%.3f,"med":$md%.3f,"max":$mx%.3f}""")
    }

    flush("end")
    // ---- compact artifact line, LAST so the tail capture keeps it ----
    println(latestArtifact)
    println(latestTotals)
    // The r8 driver artifact carried `parsed: null` — its parser sees
    // sbt's "[info] " prefix on stdout lines. Emit the same lines on
    // stderr too (sbt passes program stderr through un-prefixed) so
    // either stream yields a line that starts at the '{'.
    Console.err.println(latestArtifact)
    Console.err.println(latestTotals)
    Console.err.flush()
    completed = true
    try Runtime.getRuntime.removeShutdownHook(hook)
    catch { case _: IllegalStateException => () }
    spark.stop()
    if (failed.nonEmpty)
      throw new RuntimeException(s"bench queries failed: ${failed.mkString(", ")}")
  }
}
