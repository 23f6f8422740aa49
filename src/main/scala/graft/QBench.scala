package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch A/B harness (not part of the driver contract): times isolated
  * formulations of a query so plan choices are measured, not guessed.
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.QBench q31"
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // honor the driver-contract core count (r19: the SCALE.md low-vs-high
    // core ladders time QBench arms at local[8] vs local[32])
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val which = args.headOption.getOrElse("q31")

    def time(name: String, reps: Int = 3)(mk: => DataFrame): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s min=${times.min}%.3f  all=${times.map(t => f"$t%.3f").mkString(",")}")
    }

    which match {
      case "q31" => q31(spark, sfDir, time)
      case "d26parts" => d26parts(spark, sfDir)
      case "concsoak" => concSoak(spark, sfDir,
        rounds = args.drop(1).headOption.map(_.toInt).getOrElse(10))
      case "stream" => stream(spark, sfDir)
      case "s04" => s04(spark, sfDir)
      case "mrl" => mrl(spark, sfDir)
      case "ham" => ham(spark, sfDir)
      case "ivfpq" => ivfpq(spark, sfDir)
      case "knnscale" => knnScale(spark, sfDir,
        nprobe = args.drop(1).headOption.map(_.toInt).getOrElse(8))
      case "qkrecall" => qkRecall(spark, sfDir,
        nprobe = args.drop(1).headOption.map(_.toInt).getOrElse(8),
        tau = args.drop(2).headOption.map(_.toDouble).getOrElse(0.35),
        tileStride = args.drop(3).headOption.map(_.toLong),
        quantTau = args.drop(4).headOption.map(_.toDouble))
      case "s15prof" =>
        // Phase attribution for the suite's most expensive gate (r18
        // verdict #4): setup (input prep + slice writes), per-batch cost
        // split by output/store writes, and the final read — so the
        // "shrink s15" work targets measured wall, not guesses.
        streaming.EventStreams.curationProbe = (name, sec) =>
          println(f"[s15prof] $name%-16s $sec%7.2fs")
        (1 to 2).foreach { rep =>
          println(s"[s15prof] --- rep $rep ---")
          val t0 = System.nanoTime()
          PinScope.run(spark) {
            SparkEntry.queries("s15_stream_curation")(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
          }
          println(f"[s15prof] TOTAL            ${(System.nanoTime() - t0) / 1e9}%7.2fs")
        }
        streaming.EventStreams.curationProbe = (_, _) => ()
      case "s15ab" =>
        // Same-window A/B of the r18 adaptive probe prefilter: one
        // discarded codegen rep, then alternating plain-arm (default
        // threshold) and forced prune+Bloom (threshold=0) executions —
        // the alternation cancels window drift that makes cross-run
        // comparisons lie on a loaded box.
        val key = "graft.streaming.probe.prune.threshold.bytes"
        def once(): Double = {
          val t0 = System.nanoTime()
          PinScope.run(spark) {
            SparkEntry.queries("s15_stream_curation")(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
          }
          (System.nanoTime() - t0) / 1e9
        }
        once() // codegen
        val reps = (1 to 6).map { i =>
          val forced = i % 2 == 0
          if (forced) spark.conf.set(key, "0") else spark.conf.unset(key)
          val t = try once() finally spark.conf.unset(key)
          println(f"[s15ab] ${if (forced) "prefilter" else "plain    "} $t%7.2fs")
          (forced, t)
        }
        def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
        println(f"[s15ab] plain med=${med(reps.filter(!_._1).map(_._2))}%.2fs " +
          f"prefilter med=${med(reps.filter(_._1).map(_._2))}%.2fs")
      case "q" =>
        // generic bench-shaped timing: PinScope per rep, 1 discarded
        // codegen rep + 3 timed, for any declared query list
        args.drop(1).foreach { q =>
          def once(): Double = {
            val t0 = System.nanoTime()
            PinScope.run(spark) {
              SparkEntry.queries(q)(spark, sfDir)
                .write.format("noop").mode("overwrite").save()
            }
            (System.nanoTime() - t0) / 1e9
          }
          once()
          val ts = (1 to 3).map(_ => once())
          println(f"[q] $q med=${ts.sorted.apply(1)}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
        }
      case "tri" =>
        // alias for the triangle pair (was a verbatim copy of the `q`
        // timing loop — r18 advice)
        main(Array("q", "d41_triangles", "d56_triangle_estimate"))
        return
      case "d30ab" =>
        // Same-window A/B of d30's broadcast-vs-shuffle arm (r18 verdict
        // #5): alternate the graph broadcast budget between default and
        // 0 (forces the shuffle fallback), s15ab's drift-cancelling
        // alternation.
        val key = "graft.graph.broadcast.max.bytes"
        def once(): Double = {
          val t0 = System.nanoTime()
          PinScope.run(spark) {
            SparkEntry.queries("d30_pagerank")(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
          }
          (System.nanoTime() - t0) / 1e9
        }
        once() // codegen
        val reps = (1 to 8).map { i =>
          val shuffleArm = i % 2 == 0
          if (shuffleArm) spark.conf.set(key, "0") else spark.conf.unset(key)
          val t = try once() finally spark.conf.unset(key)
          println(f"[d30ab] ${if (shuffleArm) "shuffle  " else "broadcast"} $t%7.2fs")
          (shuffleArm, t)
        }
        def medAb(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
        println(f"[d30ab] broadcast med=${medAb(reps.filter(!_._1).map(_._2))}%.2fs " +
          f"shuffle med=${medAb(reps.filter(_._1).map(_._2))}%.2fs")
      case "d57prof" =>
        operators.PipelineQueries.incProbe = (name, act) => {
          val t0 = System.nanoTime()
          val n = act()
          println(f"[d57prof] $name%-14s ${(System.nanoTime() - t0) / 1e9}%7.2fs  n=$n")
        }
        (1 to 2).foreach { rep =>
          println(s"[d57prof] --- rep $rep ---")
          val t0 = System.nanoTime()
          SparkEntry.queries("d57_incremental_pipeline")(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          println(f"[d57prof] TOTAL          ${(System.nanoTime() - t0) / 1e9}%7.2fs")
        }
        operators.PipelineQueries.incProbe = (_, _) => ()
      case "seamlane" =>
        // A/B the r17 lazy-seam experiment over the bench shared lane:
        // same rep body as Bench's lane, eager vs lazy checkpoints, 3
        // reps each after a discarded codegen rep. What to look for:
        // lazy must not regress the LANE TOTAL (the work just moves from
        // the chain rows into the first consuming output), and the seam
        // ledger's sum should collapse toward zero — each vanished seam
        // is one fewer sequential driver-sync stall draw at cluster
        // scale.
        def noop(df: DataFrame): Unit =
          df.write.format("noop").mode("overwrite").save()
        def rep(): Seq[(String, Double)] = PinScope.run(spark) {
          def t(body: => Unit): Double = {
            val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
          }
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
            "d59_boot" -> t { base59 = operators.PipelineQueries.bootStoreJob(spark, sfDir) },
            "d59_inc" -> t { noop(operators.PipelineQueries.incStoreJob(spark, sfDir, base59)) })
        }
        Seq("eager" -> "false", "lazy" -> "true").foreach { case (tag, v) =>
          sys.props.put("graft.chain.lazy.seams", v)
          rep() // codegen/page-cache pay, discarded
          val reps = (1 to 3).map { i =>
            val (r, sm) = operators.SeamClock.recording(rep())
            println(f"[seamlane:$tag] rep $i total=${r.map(_._2).sum}%7.2f " +
              r.map { case (k, x) => f"$k=$x%.2f" }.mkString(" "))
            println(f"[seamlane:$tag] rep $i seams n=${sm.size} " +
              f"sum=${sm.map(_._2).sum}%.2f " +
              sm.map { case (k, x) => f"$k=$x%.2f" }.mkString(" "))
            r.map(_._2).sum
          }
          println(f"[seamlane:$tag] lane totals med=${reps.sorted.apply(1)}%7.2f " +
            reps.map(t => f"$t%.2f").mkString(","))
        }
        sys.props.remove("graft.chain.lazy.seams")
      case name if SparkEntry.queries.contains(name) =>
        // generic: any gate query by name, 1 warmup + 3 timed reps
        time(name, 4)(SparkEntry.queries(name)(spark, sfDir))
      case _ => sys.error(s"unknown: $which")
    }
    spark.stop()
  }

  private def q31(spark: SparkSession, dir: String,
      time: (String, Int) => (=> DataFrame) => Unit): Unit = {
    def li = operators.Tables.load(spark, dir, "lineitem")
    def band(df: DataFrame): DataFrame = df
      .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"), col("n"),
        (abs(col("ap") - col("exact_parts")) <= col("exact_parts") * 0.05).as("parts_in_band"),
        (abs(col("ao") - col("exact_orders")) <= col("exact_orders") * 0.05).as("orders_in_band"))

    // warmup
    li.groupBy("l_returnflag").count().write.format("noop").mode("overwrite").save()

    // A: round-3 triples (current)
    time("A_triples", 3) {
      val triples = li
        .select(col("l_returnflag"), posexplode(
          array(col("l_partkey").cast("long"), col("l_orderkey").cast("long")))
          .as(Seq("which", "key")))
        .groupBy("l_returnflag", "which", "key")
        .agg(count(lit(1)).as("cnt"))
      band(triples.groupBy("l_returnflag").agg(
        count(when(col("which") === 0, col("key"))).as("exact_parts"),
        count(when(col("which") === 1, col("key"))).as("exact_orders"),
        sum(when(col("which") === 0, col("cnt"))).as("n"),
        approx_count_distinct(when(col("which") === 0, col("key")), 0.016).as("ap"),
        approx_count_distinct(when(col("which") === 1, col("key")), 0.016).as("ao")))
    }

    // B: r2 two-agg + join
    time("B_two_agg_join", 3) {
      val approx = li.groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.016).as("ap"),
          approx_count_distinct(col("l_orderkey"), 0.016).as("ao"),
          count(lit(1)).as("n"))
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
      band(approx.join(exact, "l_returnflag"))
    }

    // C: two-level no-Expand per key column + join (two scans, no Generate)
    time("C_two_level_join", 3) {
      val parts = li.groupBy("l_returnflag", "l_partkey")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("exact_parts"), sum("cnt").as("n"),
          approx_count_distinct(col("l_partkey"), 0.016).as("ap"))
      val orders = li.groupBy("l_returnflag", "l_orderkey")
        .agg(count(lit(1)).as("o_cnt"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("exact_orders"),
          approx_count_distinct(col("l_orderkey"), 0.016).as("ao"))
      band(parts.join(orders, "l_returnflag"))
    }

    // D: single agg, Expand + HLL together (the alleged 77s trap — verify)
    time("D_single_agg", 1) {
      band(li.groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        count(lit(1)).as("n"),
        approx_count_distinct(col("l_partkey"), 0.016).as("ap"),
        approx_count_distinct(col("l_orderkey"), 0.016).as("ao")))
    }
  }

  /** Concurrency soak: the bench arm's protocol at many more rounds —
    * every gate family (cache and streaming queries on the serial
    * lane), 8 threads, shuffled per round, every execution
    * fingerprint-checked. One-off evidence run for rare-interleaving
    * confidence beyond ConcurrentGateSpec's 2-round CI budget. */
  private def concSoak(spark: SparkSession, dir: String, rounds: Int): Unit = {
    val pool = Seq(
      "q01_pricing_summary", "q05_region_revenue", "q09_distinct_buckets",
      "q14_window_rank", "q25_max_all", "q31_approx_distinct",
      "q34_salted_agg", "q38_asof_custom_plan", "q46_lateral_join",
      "q51_funnel",
      "d04_dedup_exact", "d06_dedup_minhash_lsh", "d07_dedup_simhash",
      "d10_dedup_components", "d21_window_dedup", "d26_semantic_dedup",
      "d27_dedup_rewrite", "d28_bpe_merges", "d29_budget_select",
      "e01_knn_brute", "e05_centroid_udaf", "e08_ivf_rerank",
      "e10_quantized_knn", "m02_decode_stub", "m05_frame_sample",
      "d08_fingerprint64",
      "c01_cached_scan_agg", "c08_warm_hitrate", "c11_admission_gate",
      "s03_stream_dedup", "s07_stream_static_join",
      // round-9 session additions: recursive CTE, salted join, gap
      // fill, the three newest retrieval tiers, DSIR votes, URL
      // canonicalization, sequence packing, video demux, sliding
      // windows (serial lane via the s prefix)
      "q52_recursive_cte", "q53_salted_join", "q57_gap_fill",
      "e11_pq_adc", "e12_matryoshka", "e13_hamming_rerank",
      "d34_importance_votes", "d35_url_canonical", "d36_sequence_pack",
      "m08_video_demux", "s10_sliding_window",
      // late-round-9 additions: bloom dedup (broadcast sketch under
      // concurrency), nested round-trip, the composed IVFADC and kNN
      // join, adaptive cutoffs, lang segments, outer join (serial lane)
      "d37_bloom_dedup", "d39_adaptive_cutoff", "d40_lang_segments",
      "q58_nested_orders", "e15_knn_join", "e16_ivfpq",
      "s11_stream_outer_join",
      // the round's last wave: triangles, set-sim join, leak-free
      // split, RRF fusion, kNN classify, dup sentences, string agg,
      // streaming CMS (serial lane)
      "d41_triangles", "d42_setsim_join", "d43_leakfree_split",
      "e20_rrf_fusion", "e21_knn_classify", "d44_dup_sentences",
      "q60_string_agg", "s12_stream_sketch",
      // round-10 additions: the DEFLATE codec, the suffix-automaton
      // substring tiers, and the remaining tagged-metric cache
      // contracts — c* now races on the shared lane, so the soak
      // exercises the per-query attribution under maximal interleaving
      "m11_inflate", "d45_substring_dedup", "d46_substring_decontam",
      "c05_partition_roundtrip", "c09_bucketed_join", "c12_vectored_scan",
      // round-11 additions: the composed pipeline + its attrition
      // accounting — the composition is where shared-state bugs
      // (persisted temp frames, tag attribution) would surface — and the
      // peer-read gate (ownership resolver + registry entries are
      // per-execution keyed, so concurrent c13s must stay disjoint)
      "d47_pipeline_pack", "d48_pipeline_attrition", "c13_peer_read",
      "d49_incremental_dedup", "s13_stream_ingest_dedup", "d50_quota_mix",
      "d51_pack_manifest",
      // late-round-11 curation tier: cross-doc line dedup (corpus-wide
      // hot-line state under interleaving), repetition filters, and the
      // broadcast-bench semantic decontamination pass
      "d52_line_dedup", "d53_gopher_repetition", "e22_semantic_decontam",
      "m12_png_decode",
      // round-12: BPE-tokenized packing (shared 1-row merge-table
      // broadcast under interleaving), the eviction-under-budget gate
      // (private budgeted manager + per-execution scratch — concurrent
      // executions must stay disjoint), and the sampled triangle
      // estimator
      "d54_bpe_pack", "d55_bpe_manifest", "c14_eviction_budget",
      "d56_triangle_estimate",
      // the incremental composed pipeline — store-vs-batch frames are
      // all persisted per-execution; interleaving would surface any
      // cross-execution leakage of the hot-line/chunk-store caches
      "d57_incremental_pipeline",
      // shadow-mode sizing: two private managers (one dummy) per
      // execution — concurrent runs must keep prediction windows disjoint
      "c15_shadow_sizing",
      // late-round-12: the trained classifier (broadcast model under
      // interleaving) and MMR selection (8 bounded driver argmax steps
      // over a per-execution checkpointed relevance frame — the soak's
      // no-per-task-PinScope discipline is what keeps that frame alive)
      "d58_centroid_classify", "e23_mmr_select",
      // s14 (serial lane via the s prefix): per-execution scratch
      // stream dirs + the external quota store must stay disjoint
      "s14_stream_quota",
      // round-13: the persisted store handoff (per-execution graft://
      // store dir — concurrent bootstrap writes + cold reads must stay
      // disjoint), the incremental attrition histogram, incremental IVF
      // maintenance (per-execution k-means training + centroid
      // broadcasts under interleaving), and the composed streaming
      // curation chain (serial lane; three external stores per
      // execution)
      "d59_store_handoff", "d60_incremental_attrition",
      "e24_incremental_ivf", "s15_stream_curation")
    val queries = SparkEntry.queries
    val expected = pool.map { n =>
      n -> PinScope.run(spark)(
        ConcurrentHarness.resultHash(queries(n)(spark, dir)))
    }.toMap
    val out = ConcurrentHarness.run(threads = 8, rounds = rounds,
      pool.map(n => n -> (() => queries(n)(spark, dir))), expected)
    PinScope.run(spark)(())
    println(f"concsoak: pool=${pool.size} rounds=$rounds " +
      f"executed=${out.executed} total=${out.totalSec}%.1fs " +
      f"mismatches=${out.mismatches.size} errors=${out.errors.size}")
    (out.mismatches ++ out.errors).foreach(m => println(s"  SOAK FAILURE: $m"))
    require(out.mismatches.isEmpty && out.errors.isEmpty, "soak failed")
  }

  private def d26parts(spark: SparkSession, dir: String): Unit = {
    import operators._
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      PinScope.run(spark) {
        val e = Tables.load(spark, dir, "embeddings")
        val exactPairs = DedupQueries.exactSemanticPairs(e, 0.35).persist()
        t("exactPairs")(exactPairs.count())
        val comps = TextQueries.componentsOf(
          exactPairs.select(col("id_a").as("doc_a"), col("id_b").as("doc_b")),
          e.select(col("vec_id").as("doc_id")))
        t("componentsOf")(comps.count())
        val quantPairs = t("quantPairs(build)")(
          DedupQueries.quantSemanticPairs(spark, e, 0.35, k = 16, nprobe = 4))
        t("quantPairs(run)")(quantPairs.count())
        val flag = exactPairs.join(quantPairs, Seq("id_a", "id_b"), "left_semi")
          .agg(count(lit(1)).as("hits"))
          .crossJoin(exactPairs.agg(count(lit(1)).as("total")))
        t("recallFlag")(flag.count())
      }
    }
  }

  /** e12 recall grid: truncated-prefix shortlist recall@5 vs the exact
    * arm, across prefix widths and shortlist sizes. */
  private def mrl(spark: SparkSession, dir: String): Unit = {
    for (p <- Seq(8, 16, 24, 32); n <- Seq(20, 50, 100)) {
      PinScope.run(spark) {
        val (exact, approx) = operators.VectorQueries.mrlArms(spark, dir, p, n)
        val hits = exact.join(approx, Seq("qid", "cid"), "left_semi").count()
        val total = exact.count()
        println(f"prefix=$p%2d shortlist=$n%2d recall@5=${hits.toDouble / total}%.3f ($hits/$total)")
      }
    }
  }

  /** SCALE.md's e15 production regime: whole-corpus kNN join with a
    * trained IVF blocking at k ∝ n and FIXED nprobe. kNN is a TIGHT
    * query — a vector's top-3 live in its nearest cells — so unlike the
    * τ=0.35 wide-radius range search (qkRecall), fixed nprobe should
    * hold recall while candidates stay linear (n · nprobe · cellsize).
    * Prints approx time, exact-arm time, and recall@3. */
  private def knnScale(spark: SparkSession, dir: String, nprobe: Int): Unit =
    PinScope.run(spark) {
      val V = graft.functions.VectorOps
      val e = operators.Tables.load(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding")).persist()
      val n = e.count()
      val k = math.max(16, (n / 125).toInt)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy(col("cos").desc, col("cid"))
      def top3(scored: DataFrame): DataFrame = scored
        .filter(col("qid") =!= col("cid"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("qid"), col("cid"))
      val t0 = System.nanoTime()
      val cents = operators.VectorQueries.kmeansCentroids(e, k, iters = 2,
        trainTargetRows = math.max(1000L, 64L * k))
      val bc = V.broadcastCentroids(spark, cents)
      val home = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
        .withColumn("cell", V.nearestCentroidCol(col("ce"), bc))
      val probes = e.select(col("vec_id").as("qid"), col("embedding").as("qe"))
        .withColumn("cell", explode(V.nearestCentroidsCol(col("qe"), bc, nprobe)))
      val approx = top3(home.join(probes, Seq("cell"))
        .withColumn("cos", V.cosineSim(col("qe"), col("ce")))
        .select(col("qid"), col("cid"), col("cos"))).persist()
      val na = approx.count()
      val t1 = System.nanoTime()
      // exact truth: corpus × corpus with the query side broadcast (the
      // probe's one-off measurement arm, not a gate plan)
      val exact = top3(
        e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
          .join(broadcast(e.select(col("vec_id").as("qid"),
            col("embedding").as("qe"))))
          .withColumn("cos", V.cosineSim(col("qe"), col("ce")))
          .select(col("qid"), col("cid"), col("cos"))).persist()
      val ne = exact.count()
      val t2 = System.nanoTime()
      val hits = exact.join(approx, Seq("qid", "cid"), "left_semi").count()
      println(f"n=$n k=$k nprobe=$nprobe recall@3=${hits.toDouble / ne}%.3f " +
        f"($hits/$ne, approx_rows=$na) " +
        f"approx=${(t1 - t0) / 1e9}%.1fs exact=${(t2 - t1) / 1e9}%.1fs")
    }

  /** SCALE.md's recall check for the scaled-k production arm: at any
    * corpus size, quantSemanticPairs with k ∝ n (cells ~125 vectors,
    * nprobe=8) must still recover the d26 recall contract against the
    * exact arm — the linear-time claim is hollow if growing k starves
    * recall. Run with SPARK_GRAFT_SF_DIR at each scale point. */
  private def qkRecall(spark: SparkSession, dir: String,
      nprobe: Int, tau: Double, tileStride: Option[Long],
      quantTau: Option[Double] = None): Unit =
    PinScope.run(spark) {
      val e = operators.Tables.load(spark, dir, "embeddings")
      val n = e.count()
      val k = math.max(16, (n / 125).toInt)
      val t0 = System.nanoTime()
      val exact = operators.DedupQueries.exactSemanticPairs(e, tau).persist()
      val total = exact.count()
      val t1 = System.nanoTime()
      val quant = operators.DedupQueries
        .quantSemanticPairs(spark, e, quantTau.getOrElse(tau), k = k,
          nprobe = nprobe).persist()
      val hits = exact.join(quant, Seq("id_a", "id_b"), "left_semi").count()
      val t2 = System.nanoTime()
      println(f"n=$n k=$k nprobe=$nprobe tau=$tau%.2f " +
        f"recall=${hits.toDouble / total}%.3f ($hits/$total) " +
        f"exact=${(t1 - t0) / 1e9}%.1fs quant=${(t2 - t1) / 1e9}%.1fs")
      // decomposition for a ScaleGen-tiled corpus: intra-tile pairs are
      // the planted duplicate structure (rotation-invariant, identical
      // per tile); cross-tile pairs are the random-cosine tail
      tileStride.foreach { ts =>
        def split(df: org.apache.spark.sql.DataFrame, same: Boolean) = {
          val cond = (col("id_a") / ts).cast("long") ===
            (col("id_b") / ts).cast("long")
          df.filter(if (same) cond else !cond)
        }
        for (same <- Seq(true, false)) {
          val tot = split(exact, same).count()
          val hit = split(exact, same)
            .join(quant, Seq("id_a", "id_b"), "left_semi").count()
          val label = if (same) "intra-tile" else "cross-tile"
          println(f"  $label: recall=${if (tot == 0) Double.NaN
            else hit.toDouble / tot}%.3f ($hit/$tot)")
        }
      }
    }

  /** e16 recall grid over the IVF probing width (shortlist fixed at the
    * committed 64): how much of PQ's recall the cell restriction keeps. */
  private def ivfpq(spark: SparkSession, dir: String): Unit = {
    for (np <- Seq(1, 2, 4, 8, 16)) {
      PinScope.run(spark) {
        val r = operators.VectorQueries.ivfPqRecall(spark, dir, nprobe = np)
        println(f"nprobe=$np%2d recall@5=$r%.3f")
      }
    }
  }

  /** e13 recall grid: 1-bit hamming shortlist recall@5 vs the exact arm,
    * across shortlist sizes. */
  private def ham(spark: SparkSession, dir: String): Unit = {
    for (n <- Seq(5, 16, 32, 64, 128, 256)) {
      PinScope.run(spark) {
        val (exact, approx) = operators.VectorQueries.hammingArms(spark, dir, n)
        val hits = exact.join(approx, Seq("qid", "cid"), "left_semi").count()
        val total = exact.count()
        println(f"shortlist=$n%3d recall@5=${hits.toDouble / total}%.3f ($hits/$total)")
      }
    }
  }

  private def s04(spark: SparkSession, dir: String): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    def ev = {
      // dir/file layout handling as in EventStreams.eventsStream
      val reader = spark.readStream.schema(batchSchema)
      val raw =
        if (new java.io.File(s"$dir/events.parquet").isDirectory)
          reader.parquet(s"$dir/events.parquet")
        else reader.option("pathGlobFilter", "events.parquet").parquet(dir)
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else raw
    }
    (1 to 2).foreach { rep =>
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("event_id").as("p_id"), col("ts").as("p_ts"))
        .withWatermark("p_ts", "2 hours")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("c_id"), col("ts").as("c_ts"))
        .withWatermark("c_ts", "2 hours")
      val t0 = System.nanoTime()
      val q = purchases.join(clicks,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"))
        .select(col("p_user"), col("p_id"), col("c_id"))
        .writeStream.outputMode("append").format("memory")
        .queryName(s"dbg_ssj_$rep").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      if (q.isActive) q.stop()
      println(f"rep$rep total ${(System.nanoTime() - t0) / 1e9}%.2f s, batches=${q.recentProgress.length}")
      q.recentProgress.foreach { p =>
        println(s"  batch=${p.batchId} rows=${p.numInputRows} durationMs=${p.durationMs}")
      }
    }
  }

  private def stream(spark: SparkSession, dir: String): Unit = {
    def run(tag: String): Unit = {
      Seq("s01" -> (() => streaming.EventStreams.windowedCounts(spark, dir)),
        "s02" -> (() => streaming.EventStreams.sessionize(spark, dir)),
        "s03" -> (() => streaming.EventStreams.streamDedup(spark, dir)),
        "s04" -> (() => streaming.EventStreams.streamStreamJoin(spark, dir))
      ).foreach { case (n, f) =>
        val t0 = System.nanoTime()
        val cnt = f().count()
        println(f"$tag $n%-4s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$cnt")
      }
    }
    // withStreamConf pins noDataMicroBatches/state partitions per query,
    // so there is no meaningful session-level A/B here — two passes just
    // separate cold-JVM cost from steady state
    run("cold")
    run("steady")
  }
}
