package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Systematic plan hygiene across the ENTIRE batch gate: no query may
  * plan a CartesianProduct, and BroadcastNestedLoopJoin may appear only
  * where a bounded side makes it the intended plan (documented
  * allowlist). Guards against regressions that stay correct at test
  * scale but stop scaling — the class of defect a per-query spec misses
  * when a new query is added without its own plan audit. */
class PlanHygieneSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  // BNLJ is the intended plan where one side is provably tiny:
  //   e01: bounded probe set (10 vectors) against the corpus
  //   q24: theta join bounded by two selective predicates
  //   q32: interval join with a tight range predicate
  //   q28/q36: scalar/EXISTS subqueries over 3-row bounds
  //   d16: 1-row threshold aggregate cross-joined into the frequent-set
  //        filter (broadcast of a single row, never data-dependent)
  //   e07/e08/e10: e01's bounded probe broadcast + a 1-row recall-flag
  //        broadcast (e10's quantized arm scores the same bounded
  //        probe x corpus product in integer dot products)
  //   d26: a 1-row recall-flag broadcast (the e07/e10 contract); the
  //        candidate joins themselves are label/cell equi-joins
  //   d28: a 1-row merge-table broadcast (the d16 threshold pattern)
  //   d29: a 1-row token-budget broadcast (same pattern)
  //   e11: the exact arm's bounded probe x corpus product + the 1-row
  //        recall-flag broadcast (e07/e08/e10's contract)
  //   d31: 1-row sketch/total/contract broadcasts over the 10-row top-k
  //   e12: the bounded probe broadcast (prefix-shortlist + exact arms)
  //        + the 1-row recall-flag broadcast (e07/e10's contract)
  //   d32: a 1-row max-count broadcast over the ≤5-row lang aggregate
  //   e13: the bounded probe broadcast (hamming-shortlist + exact arms)
  //        + the 1-row recall-flag broadcast (e07/e10's contract)
  //   d34: a 1-row totals broadcast over the 64-row bucket stats (the
  //        d16 threshold pattern)
  //   d37: a 1-row fn/fp contract-flag broadcast (the recall-flag
  //        pattern); the bloom test itself is a zero-join projection
  //        and the verify joins are key equi-joins
  //   e14: the bounded probe broadcast (10 vectors) against the corpus
  //        — the range-search scan IS the unconditioned broadcast join
  //   e16: the exact arm's bounded probe x corpus product + the 1-row
  //        recall-flag broadcast (e07/e10's contract); the IVF/ADC
  //        joins are cell/code equi-joins
  //   e17: the bounded probe broadcast with only the label-mismatch
  //        predicate — by construction a non-equi join over a 10-row side
  private val bnljAllowed = Set("e01_knn_brute", "q24_theta_join",
    "q32_interval_join", "q28_correlated_subquery", "q36_exists_in_mix",
    "d16_bigram_coverage", "e07_ann_rerank", "e08_ivf_rerank",
    "e10_quantized_knn", "d26_semantic_dedup", "d28_bpe_merges",
    "d29_budget_select", "e11_pq_adc", "d31_heavy_hitters",
    "e12_matryoshka", "d32_temperature_mix", "e13_hamming_rerank",
    "d34_importance_votes", "d37_bloom_dedup", "e14_range_search",
    "e16_ivfpq", "e17_hard_negatives",
    // d43: a 1-row leak-free contract-flag broadcast (the recall-flag
    // pattern); split assignment itself is a zero-join projection
    // e19/e20/e21: the bounded probe broadcast (10 vectors) against the
    //      corpus — the e01/e14 shape with MaxSim / dual-ranker /
    //      neighbor-vote scoring
    "d43_leakfree_split", "e19_maxsim", "e20_rrf_fusion",
    "e21_knn_classify",
    // d47/d48/d49: the 1-row lsh_recall_ok / |bench| contract-flag
    // broadcasts (the d43/q31 pattern) plus the e22 semantic stage's
    // aggregate-sized benchmark-embedding broadcast against the clean
    // set; the stages themselves are equi-joins + windows
    "d47_pipeline_pack", "d48_pipeline_attrition", "d49_incremental_dedup",
    // d50: the aggregate-sized quota build (5-lang weight table × 1-row
    // normalizer/budget) — per-doc joins are broadcast equi-joins
    "d50_quota_mix",
    // d54/d55: d28's 1-row merge-table broadcast (the d16 pattern)
    // feeding the BPE application projection
    "d54_bpe_pack", "d55_bpe_manifest",
    // d56: 1-row count frames (est/exact/edge totals) cross-joined into
    // the single-row contract output
    "d56_triangle_estimate",
    // d57/d59/d60: the 1-row store base-offset, |bench| count, and
    // lsh_recall_ok contract frames cross-joined into the manifest (the
    // q31 shape); d59 reads base-offset from the persisted manifest;
    // d60 shares the chain (plus the 1-row |bench| broadcast in the
    // verbatim-plant input synthesis)
    "d57_incremental_pipeline", "d59_store_handoff",
    "d60_incremental_attrition",
    // e22: the aggregate-sized benchmark side broadcast against the
    // train corpus — the e01/e14 unconditioned-broadcast shape
    "e22_semantic_decontam",
    // e23: the 1-row query vector broadcast into the relevance pass
    // (the q31 shape); the k argmax scans read a checkpointed frame
    "e23_mmr_select",
    // e24/e25: the bounded probe broadcast (exact + merged-IVF arms)
    // plus the 1-row recall/drift contract broadcasts (e07/e10's
    // pattern); e25's drift baseline rides 1-row persisted-stats frames
    "e24_incremental_ivf", "e25_ivf_store_handoff")

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("no batch query plans a CartesianProduct; BNLJ only where bounded") {
    val batchQueries = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(_.startsWith("s")) // streaming queries execute on build
    assert(batchQueries.size >= 58)
    val offenders = batchQueries.flatMap { name =>
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val cart = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") &&
        !bnljAllowed.contains(name)
      if (cart) Some(s"$name: CartesianProduct")
      else if (bnlj) Some(s"$name: unexpected BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, s"plan hygiene violations:\n${offenders.mkString("\n")}")
  }
}
