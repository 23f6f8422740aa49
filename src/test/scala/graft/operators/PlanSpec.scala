package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the plans must be the ones we'd want at 100 TB —
  * filters/projections reaching the parquet scan, small dims broadcast,
  * partial aggregation before shuffles, whole-stage codegen in the hot
  * paths. Guards against regressions that stay correct but stop scaling.
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // static-plan audit: AQE wraps plans in AdaptiveSparkPlan before
      // finalization, hiding codegen spans from toString
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.maxMetadataStringLength", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("q02: filter + projection pushed to the parquet scan") {
    val p = plan("q02_filter_project")
    assert(p.contains("PushedFilters: ["), "expected pushed filters")
    assert(p.contains("GreaterThan(l_discount") || p.contains("LessThan(l_quantity"),
      s"expected value filters pushed, got:\n$p")
    assert(p.contains("ReadSchema"), p)
    // only the needed columns are read
    assert(!p.contains("l_returnflag"), "unprojected column must not be read")
  }

  test("q05: dimension joins are broadcast, fact side streams") {
    val p = plan("q05_region_revenue")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q01: partial aggregation before the shuffle (map-side combine)") {
    val p = plan("q01_pricing_summary")
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0, p)
    assert(p.indexOf("HashAggregate", firstAgg + 1) > firstAgg,
      "expected partial+final HashAggregate pair")
    // whole-stage codegen spans print as "*(n)" in plan toString
    assert(p.contains("*("), "aggregation must stay codegen'd")
  }

  test("q25 max_all: partial max before the single-partition exchange") {
    val p = plan("q25_max_all")
    assert(p.contains("partial_max"), "map-side partial max required")
    assert(p.contains("*("), "scan pipeline must stay codegen'd")
    // SortAggregate is expected here: max(string) buffers aren't
    // hash-aggregable; the partial/final split is what matters at scale
    assert(p.contains("Exchange SinglePartition"), p)
  }

  test("d06 minhash: no cartesian product anywhere in the LSH join") {
    val p = plan("d06_dedup_minhash_lsh")
    assert(!p.contains("CartesianProduct"),
      "LSH candidate join must be an equi-join on (band, bh)")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("d07 simhash: candidate join is banded, not lang-only") {
    val p = plan("d07_dedup_simhash")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "candidate join must be an equi-join, not a theta join on lang alone")
    // the candidate join's keys must include the pigeonhole band columns
    // (the query also has an outer join attaching candidates to the
    // planted-pair list — scan every join line for the banded one)
    val joinLines = p.linesIterator.filter(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin") ||
        l.contains("BroadcastHashJoin")).toSeq
    assert(joinLines.exists(l => l.contains("bv#") && l.contains("band#")),
      s"some join's keys must include (band, bv), got: ${joinLines.mkString("\n")}")
    // the expensive fingerprint pipeline must be computed once (cached)
    assert(p.contains("InMemoryTableScan"),
      "simhash table must be persisted so both join branches reuse it")
  }

  test("d06 minhash: signature pipeline computed once, ids-only band join") {
    val p = plan("d06_dedup_minhash_lsh")
    // every consumer of the signature pipeline reads the cache (the plan
    // string prints the cached subtree inline under InMemoryRelation, so
    // count scans, not the absence of the subtree's operators)
    val scans = p.linesIterator.count(_.contains("InMemoryTableScan"))
    assert(scans >= 2,
      s"signature table must be persisted and reused by all consumers, saw $scans scans")
    // the shingle explode must only run to populate the cache: every
    // occurrence sits beneath an InMemoryRelation definition
    val gen = p.linesIterator.count(l =>
      l.contains("regexp_extract_all") || l.contains("ws_tokens"))
    val rel = p.linesIterator.count(_.contains("InMemoryRelation"))
    assert(gen <= rel,
      s"shingle pipeline appears $gen times but only $rel cached relations — recompute outside the cache")
  }

  test("d21 window dedup: one hash pass, no recompute, no cartesian") {
    val p = plan("d21_window_dedup")
    assert(!p.contains("CartesianProduct"), p)
    // window-hash generation is a single codegen projection feeding the
    // min-over-window — the expression must appear exactly once (a second
    // occurrence means the exploded table is being recomputed per consumer)
    val gens = p.linesIterator.count(_.contains("shingle_hash64"))
    assert(gens == 1, s"shingle_hash64 appears $gens times — recompute:\n$p")
  }

  test("d22 bpe tokenization: pure per-row projection, zero exchanges") {
    val p = plan("d22_token_bpe")
    assert(!p.contains("Exchange"),
      s"per-row tokenization must not shuffle:\n$p")
  }

  test("d27 rewrite: window-hash shuffle + doc rollup, no self-join on text") {
    val p = plan("d27_dedup_rewrite")
    assert(!p.contains("CartesianProduct"), p)
    // the rewrite joins the per-doc dup-position ARRAY back to the doc
    // table — every join must be an equi-join keyed on doc_id/hash,
    // never a nested loop over text
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"rewrite must stay equi-joined:\n$p")
    // exactly one Window (the min-over-window-hash first-occurrence pass)
    assert("Window\\b".r.findAllIn(p).nonEmpty, p)
  }

  test("d28 bpe merges: application is a broadcast projection, counting one shuffle") {
    val p = plan("d28_bpe_merges")
    assert(!p.contains("CartesianProduct"), p)
    // merge table reaches rows via a 1-row broadcast (BNLJ allowlisted in
    // PlanHygieneSpec); the per-doc application itself must not shuffle
    // the docs — the only hashpartitioning exchanges belong to the pair
    // count + top-8 ranking, keyed on the pair value
    val exchanges = "Exchange hashpartitioning\\(([a-z_]+)#".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(exchanges.subsetOf(Set("m")),
      s"only the pair-count aggregate may shuffle, saw keys $exchanges:\n$p")
  }

  test("e09 quantization: pure per-row projection, zero exchanges, codegen'd") {
    val p = plan("e09_vector_quantize")
    assert(!p.contains("Exchange"),
      s"per-row quantization must not shuffle:\n$p")
    // the native kernels must ride INSIDE a whole-stage-codegen span
    // (the r8 HOF formulation broke the span — that was the point of
    // replacing it); spans print as "*(n)" in the plan string
    assert(p.contains("*("),
      s"quantization projection lost whole-stage codegen:\n$p")
  }

  test("d23 normalize + d24 chunking: zero exchanges (scan-bounded)") {
    Seq("d23_normalize", "d24_sequence_chunks").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must not shuffle:\n$p")
    }
  }

  test("d29 budget select: prefix sum is bucket-partitioned, never a row-scale global window") {
    val p = plan("d29_budget_select")
    // the doc-table running sum must be PARTITIONED by the score bucket
    // (partition cols print first in windowspecdefinition)
    assert("windowspecdefinition\\(bucket#\\d+L?, score#".r.findFirstIn(p).isDefined,
      s"doc-table window must partition by bucket:\n$p")
    // the naive shape — one global window ordered by score over all rows
    // (exactly what the DuckDB oracle does) — must NOT appear
    assert("windowspecdefinition\\(score#".r.findFirstIn(p).isEmpty,
      s"found an unpartitioned score-ordered window (single-partition trap):\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d36 sequence pack: prefix sum is bucket-partitioned, never a row-scale global window") {
    val p = plan("d36_sequence_pack")
    // the doc-table exclusive cumsum must be PARTITIONED by the doc_id
    // bucket (partition cols print first in windowspecdefinition)
    assert("windowspecdefinition\\(bucket#\\d+L?, doc_id#".r.findFirstIn(p).isDefined,
      s"doc-table window must partition by bucket:\n$p")
    // the naive shape — one global window ordered by doc_id over all
    // rows (exactly what the DuckDB oracle does) — must NOT appear
    assert("windowspecdefinition\\(doc_id#".r.findFirstIn(p).isEmpty,
      s"found an unpartitioned doc_id-ordered window (single-partition trap):\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d50 quota mix: doc-table window partitions on the tie class, never a language") {
    val p = plan("d50_quota_mix")
    // the per-doc rank window must partition on (lang, n_chars) — the
    // bounded tie class (both partition keys precede the doc_id ORDER
    // col in windowspecdefinition) — never on lang alone with n_chars
    // in the ORDER clause, which is the oracle's whole-language
    // row_number (row-scale single partitions per language)
    assert("windowspecdefinition\\(lang#\\d+, n_chars#\\d+L?, doc_id#"
      .r.findFirstIn(p).isDefined,
      s"doc-table window must partition by the (lang, n_chars) tie class:\n$p")
    assert("windowspecdefinition\\(lang#\\d+, n_chars#\\d+L? DESC NULLS LAST, doc_id#"
      .r.findFirstIn(p).isEmpty,
      s"found a lang-only partitioned rank window (row-scale partition trap):\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("e04 ann: corpus never shuffled, probe side broadcast") {
    // pure-LSH op is library surface (no gate entry since r8) — plan
    // audited directly
    val p = VectorQueries.knnLsh(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"bounded probe buckets must broadcast against the corpus:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("e05 centroid UDAF: partial aggregation before the shuffle") {
    val p = plan("e05_centroid_udaf")
    assert(p.contains("partial_vectorcentroid") ||
      p.contains("partial_VectorCentroid") ||
      (p.contains("ObjectHashAggregate") &&
        p.indexOf("ObjectHashAggregate") !=
          p.lastIndexOf("ObjectHashAggregate")),
      s"Aggregator must run map-side partials:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("d09 embed near-dup: equi-join on the label block, no cartesian") {
    val p = plan("d09_embed_neardup")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("e01 knn: bounded probe side is broadcast") {
    val p = plan("e01_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"corpus side must broadcast against the bounded probe set:\n$p")
  }

  test("q46 lateral: decorrelated to a group-limit window + broadcast join") {
    val p = plan("q46_lateral_join")
    // Catalyst must NOT execute the correlated subquery per outer row:
    // the decorrelated plan ranks suppliers per nation with a map-side
    // WindowGroupLimit (top-k pushed below the exchange) and broadcasts
    // the 25-row nation side.
    assert(p.contains("WindowGroupLimit"), s"no group-limit pushdown:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"nation side not broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"lateral fell back to a nested loop:\n$p")
  }

  test("q48 max_by/min_by agree with the window-ranking formulation") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val got = graft.SparkEntry.queries("q48_selective_agg")(spark, dir).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Long]("top_order"), r.getAs[Long]("bottom_order"))).toMap
    val priceKey = (round(col("o_totalprice") * 100).cast("long") *
      10000000L + col("o_orderkey"))
    val ranked = Tables.load(spark, dir, "orders")
      .withColumn("k", priceKey)
      .withColumn("rmax", row_number().over(
        Window.partitionBy("o_orderpriority").orderBy(col("k").desc)))
      .withColumn("rmin", row_number().over(
        Window.partitionBy("o_orderpriority").orderBy(col("k").asc)))
      .filter(col("rmax") === 1 || col("rmin") === 1)
      .collect()
    ranked.foreach { r =>
      val (top, bottom) = got(r.getAs[String]("o_orderpriority"))
      if (r.getAs[Int]("rmax") == 1)
        assert(r.getAs[Long]("o_orderkey") == top, s"top mismatch: $r")
      if (r.getAs[Int]("rmin") == 1)
        assert(r.getAs[Long]("o_orderkey") == bottom, s"bottom mismatch: $r")
    }
  }

  test("q47 range frame: one hash exchange on user_id feeding one Window") {
    val p = plan("q47_range_frame")
    assert(p.contains("Window"), s"no window exec:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"range frame must not global-sort:\n$p")
  }

  test("q52 recursive CTE: executed as Spark's UnionLoop, not an unrolled plan") {
    val p = plan("q52_recursive_cte")
    assert(p.contains("UnionLoop"), s"expected UnionLoop exec:\n$p")
  }

  test("q53 salted join: a shuffle join keyed on (hot_key, salt), dim replicated") {
    val p = plan("q53_salted_join")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      s"salting demo must stay a shuffle join (broadcast hides the skew):\n$p")
    assert(p.contains("salt"), s"salt must participate in the join keys:\n$p")
    assert(!p.contains("BroadcastHashJoin"), s"dim must not be broadcast:\n$p")
  }

  test("q57 gap fill: one hash exchange on o_custkey feeding one Window") {
    val p = plan("q57_gap_fill")
    assert(p.contains("Window"), s"no window exec:\n$p")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly 1 shuffle, got $exchanges:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      s"carry-forward must not global-sort:\n$p")
  }

  test("d37 bloom dedup: membership test is codegen'd, no corpus-vs-corpus join") {
    val p = plan("d37_bloom_dedup")
    // the native expression must sit inside a whole-stage span, not an
    // interpreted fallback projection
    assert(p.contains("bloom_might_contain"), s"native expression missing:\n$p")
    // codegen'd operators print with the *(N) span marker in toString
    assert("""\*\(\d+\) Project \[[^\n]*bloom_might_contain""".r
      .findFirstIn(p).isDefined,
      s"membership projection fell out of whole-stage codegen:\n$p")
    // the verify joins are key equi-joins over the hit sliver — never a
    // sort-merge of the two corpus halves on raw text
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d39 adaptive cutoff: the percentile window runs over the histogram, not the corpus") {
    val p = plan("d39_adaptive_cutoff")
    // the cumulative-count window partitions by lang and is fed by the
    // (lang, score) aggregate — Window above HashAggregate in the plan
    assert("windowspecdefinition\\(lang#\\d+, score#".r.findFirstIn(p).isDefined,
      s"expected the lang-partitioned histogram window:\n$p")
    val winIdx = p.indexOf("Window")
    val aggIdx = p.lastIndexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"window must consume an aggregate (histogram), not corpus rows:\n$p")
    // no row-scale unpartitioned window anywhere
    assert("windowspecdefinition\\(score#".r.findFirstIn(p).isEmpty, p)
  }

  test("e15 knn join: label equi-join feeds a vid-partitioned rank window") {
    val p = plan("e15_knn_join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected an equi-join on the label block:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"kNN join must never be all-pairs:\n$p")
    assert("windowspecdefinition\\(vid#\\d+L".r.findFirstIn(p).isDefined,
      s"expected the per-vector rank window:\n$p")
  }

  test("d45 substring dedup: window-hash equi-join, lcs_len in codegen, no cartesian") {
    val p = plan("d45_substring_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must be the window equi-join, never all-pairs:\n$p")
    assert(p.toLowerCase.contains("lcs_len"),
      s"expected the native lcs_len expression in the plan:\n$p")
    // the pair join keys on the 64-bit window hash (plus the confirming
    // string equality), not on the raw window string alone
    assert(p.contains("xxhash64"), s"expected hash-keyed join:\n$p")
  }

  test("d46 decontamination: benchmark windows broadcast, train side streams") {
    val p = plan("d46_substring_decontam")
    assert(p.contains("BroadcastHashJoin"),
      s"the benchmark window side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"no all-pairs anywhere:\n$p")
  }

  test("m11 inflate: pure per-row batch decode, zero exchanges") {
    val p = plan("m11_inflate")
    assert(!p.contains("Exchange"),
      s"a per-row codec projection must not shuffle:\n$p")
  }
}
