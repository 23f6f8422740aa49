package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Quality gates for the LLM-pipeline operators: MinHash estimates must
  * track exact Jaccard, and LSH ANN must recall most brute-force
  * neighbors. Run on sf0.001 to keep the suite fast. */
class PipelineSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("minhash estimate tracks exact shingle jaccard on candidate pairs") {
    val docs = Tables.load(spark, dir, "documents")
    val sigs = Dedup.signatures(docs)
    val cands = Dedup.lshCandidates(sigs)

    // exact jaccard over the same 3-gram shingle sets, joined to estimates
    val sh = docs.withColumn("__tok", Dedup.tokenCol)
      .select(col("doc_id"), Dedup.shingleHashes.as("sh"))
    val exact = cands
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("exact_j",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .select("doc_a", "doc_b", "est_jaccard", "exact_j")
      .collect()

    assert(exact.nonEmpty, "LSH must surface candidate pairs")
    val errs = exact.map(r =>
      math.abs(r.getAs[Double]("est_jaccard") - r.getAs[Double]("exact_j")))
    val meanErr = errs.sum / errs.length
    assert(meanErr < 0.15, f"mean |est - exact| = $meanErr%.3f too high")
  }

  test("lsh ann recalls most brute-force top-5 neighbors") {
    val brute = SparkEntryQueries("e01_knn_brute")
    val lsh = VectorQueries.knnLsh(spark, dir)
    val bruteSet = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshSet = lsh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bruteSet & lshSet).size.toDouble / bruteSet.size
    assert(recall >= 0.5, f"LSH recall $recall%.2f < 0.5 vs brute force")
  }

  test("ivf ann recalls most brute-force top-5 neighbors") {
    val brute = SparkEntryQueries("e01_knn_brute")
    val ivf = VectorQueries.knnIvf(spark, dir)
    val bruteSet = brute.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfSet = ivf.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bruteSet & ivfSet).size.toDouble / bruteSet.size
    assert(ivfSet.size == bruteSet.size, "top-5 per probe expected")
    assert(recall >= 0.5, f"IVF recall $recall%.2f < 0.5 vs brute force")
  }

  private def SparkEntryQueries(name: String) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("simhash: identical docs -> identical fingerprints, near piles close") {
    val docs = Tables.load(spark, dir, "documents").limit(50)
    val fps = Dedup.simhashTable(docs).orderBy("doc_id").collect()
    // deterministic: recomputation matches
    val fps2 = Dedup.simhashTable(docs).orderBy("doc_id").collect()
    assert(fps.map(_.getLong(1)).sameElements(fps2.map(_.getLong(1))))
  }

  test("simhash banding finds exactly the exhaustive hamming<=8 pairs") {
    val docs = Tables.load(spark, dir, "documents")
    val banded = Dedup.simhashCandidates(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // exhaustive same-lang comparison (the n² shape banding replaces)
    val t = Dedup.simhashTable(docs, carry = Seq("lang"))
    val a = t.select(col("lang"), col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = t.select(col("lang").as("lang_b"), col("doc_id").as("doc_b"),
      col("fp").as("fp_b"))
    val exhaustive = a
      .join(b, col("lang") === col("lang_b") && col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)").cast("int"))
      .filter(col("hamming") <= Dedup.MaxHamming)
      .select("doc_a", "doc_b", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == exhaustive,
      s"banding must be lossless: banded=${banded.size} exhaustive=${exhaustive.size}")
    assert(exhaustive.nonEmpty, "gate data must surface at least one near-dup pair")
  }

  test("multimodal stub decode is deterministic and partition-safe") {
    val q = graft.SparkEntry.queries("m02_decode_stub")
    val one = q(spark, dir).orderBy("doc_id").collect()
    val two = q(spark, dir).repartition(7).orderBy("doc_id").collect()
    assert(one.length == 500)
    assert(one.map(_.toString).sameElements(two.map(_.toString)),
      "repartitioned decode must yield identical results")
  }

  test("resize buckets partition the full byte sum; frame sums match slices") {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .collect()
    val payloads = docs.map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    payloads.values.take(50).foreach { payload =>
      val img = MultimodalQueries.decodePpm(MultimodalQueries.makePpm(payload))
      val buckets = MultimodalQueries.resizeSums(img)
      assert(buckets.sum == img.pixels.map(b => (b & 0xff).toLong).sum,
        "resize quadrants must partition the total pixel mass")
      // the codec round-trips: header parses back to the encode dims
      val n = payload.length
      assert(img.width == 4 + (if (n == 0) 0 else payload(0) & 0x07))
      assert(img.height == 4 + (if (n < 2) 0 else payload(1) & 0x07))
      assert(img.maxval == 255 && img.channels == 3)
    }
    // gate queries: deterministic under repartition, frame sums = slices
    val m04 = graft.SparkEntry.queries("m04_resize_stub")
    val a = m04(spark, dir).orderBy("doc_id").collect()
    val b = m04(spark, dir).repartition(7).orderBy("doc_id").collect()
    assert(a.length == 500 && a.map(_.toString).sameElements(b.map(_.toString)))
    val m05 = graft.SparkEntry.queries("m05_frame_sample")
    val c = m05(spark, dir).collect()
    assert(c.nonEmpty, "frame sampling must emit rows on the gate corpus")
    val fl = MultimodalQueries.frameLen
    c.foreach { row =>
      val (id, k, sum) = (row.getLong(0), row.getInt(1), row.getLong(2))
      assert(k % MultimodalQueries.frameStride == 0)
      val expect = payloads(id).slice(k * fl, (k + 1) * fl)
        .map(x => (x & 0xff).toLong).sum
      assert(sum == expect, s"frame ($id, $k) sum mismatch")
    }
  }

  test("e07 rerank: rows are exactly e01's top-5 and the recall flag is true") {
    val rerank = graft.SparkEntry.queries("e07_ann_rerank")(spark, dir).collect()
    assert(rerank.nonEmpty)
    rerank.foreach(r => assert(r.getAs[Boolean]("lsh_recall_ok"),
      s"LSH recall below 0.5: $r"))
    // the emitted truth target must be the exact top-5 — e01 restricted
    // to rnk <= 5 with identical columns
    val exact = graft.SparkEntry.queries("e01_knn_brute")(spark, dir)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"),
        r.getAs[Double]("cos_sim"), r.getAs[Long]("rnk"))).toSet
    val got = rerank.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid"),
      r.getAs[Double]("cos_sim"), r.getAs[Long]("rnk"))).toSet
    assert(got == exact, s"rerank truth target diverges from e01: ${got.diff(exact)}")
  }

  test("d47 composed pipeline: twins lose to survivorship, packing is contiguous, every stage moves") {
    val rows = SparkEntryQueries("d47_pipeline_pack")
      .orderBy(col("doc_id")).collect()
    assert(rows.nonEmpty)
    // planted-twin survivorship is VISIBLE: the d25 content policy must
    // pick the (strictly longer) twin, so packed output contains twin ids
    // carrying their original's component id
    val twinSurvivors = rows.filter(r =>
      r.getAs[Long]("doc_id") >= 1000000L && r.getAs[Long]("comp") < 1000000L)
    assert(twinSurvivors.nonEmpty,
      "no twin survived with its original's comp — survivorship stage is vacuous")
    // packing contiguity: token_start is the exclusive running sum in
    // doc_id order — any gap/overlap means the bucketed prefix sum broke
    var expect = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("token_start") == expect,
        s"doc ${r.getAs[Long]("doc_id")}: token_start ${r.getAs[Long]("token_start")} != $expect")
      expect += r.getAs[Long]("n_tokens")
    }
    // the in-band LSH recall contract must hold on the real corpus
    assert(rows.forall(_.getAs[Boolean]("lsh_recall_ok")))

    // attrition: every stage must move at least one doc (the non-vacuity
    // dial — a reordered chain that silently no-ops a stage fails here,
    // e.g. chunk-dedup BEFORE near-dedup zeroes the near-dup edge set)
    val att = SparkEntryQueries("d48_pipeline_attrition").collect()
      .map(r => (r.getAs[Long]("drop_reason"), r.getAs[String]("split")) ->
        r.getAs[Long]("n_docs")).toMap
    val byReason = att.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    assert(byReason.getOrElse(1L, 0L) > 0, "quality stage dropped nothing")
    assert(byReason.getOrElse(2L, 0L) > 0, "near-dup stage dropped nothing")
    // the r12 stages each have designed flow at every SF: organic
    // repetition breaches (16), the pure-boilerplate replacement docs
    // emptied by line dedup (32), and the graded planted semantic leaks
    // at noise levels 0-1 (64)
    assert(byReason.getOrElse(16L, 0L) > 0, "repetition stage dropped nothing")
    assert(byReason.getOrElse(32L, 0L) > 0, "line-dedup emptied nothing")
    assert(byReason.getOrElse(64L, 0L) > 0, "semantic decontam dropped nothing")
    assert(byReason.keySet.subsetOf(Set(0L, 1L, 2L, 4L, 8L, 16L, 32L, 64L)))
    // survivors carry a split, dropped docs carry 'dropped', exclusively
    assert(att.keys.forall { case (reason, split) =>
      if (reason == 0L) Set("train", "val", "test").contains(split)
      else split == "dropped"
    })
    // lineage is total: reason counts add up to the augmented input size
    val docs = Tables.load(spark, dir, "documents")
    val nCorpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0).count()
    val nTwins = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0 &&
      pmod(col("doc_id"), lit(7)) === 3).count()
    assert(att.values.sum == nCorpus + nTwins,
      s"lineage not total: ${att.values.sum} != ${nCorpus + nTwins}")
  }

  test("d57 incremental pipeline: appends at the store tail, twins dedupe vs store, batch-only output") {
    val rows = SparkEntryQueries("d57_incremental_pipeline")
      .orderBy(col("token_start")).collect()
    assert(rows.nonEmpty)
    // the pack stream APPENDS at the store's next-token offset — a zero
    // base would mean the incremental run restarted the stream (the
    // store-contract bug class the gate exists for)
    val base = rows.head.getAs[Long]("token_start")
    assert(base > 0, "base offset 0: packing ignored the store tail")
    // contiguity from the base: exclusive running sum, no gaps/overlaps
    var expect = base
    rows.foreach { r =>
      assert(r.getAs[Long]("token_start") == expect,
        s"doc ${r.getAs[Long]("doc_id")}: token_start " +
          s"${r.getAs[Long]("token_start")} != $expect")
      expect += r.getAs[Long]("n_tokens")
    }
    assert(rows.forall(_.getAs[Boolean]("lsh_recall_ok")))

    // output is batch-only: original batch ids (doc_id % 4 == 0) plus
    // re-crawl twins (>= 2,000,000) whose STORE original failed
    // admission — a store id in the output means the chain rescanned
    // the old corpus
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.forall(id => id >= 2000000L || id % 4 == 0),
      "store-side doc id leaked into the incremental output")

    // dedup-vs-store flow: most planted re-crawls are flagged against
    // the store and dropped; the few survivors are exactly the twins
    // whose original never entered the store (failed quality upstream)
    val docs = Tables.load(spark, dir, "documents")
    val planted = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0 &&
      pmod(col("doc_id"), lit(4)) =!= 0 &&
      pmod(col("doc_id"), lit(9)) === 5).count()
    val twinsKept = ids.count(_ >= 2000000L)
    assert(planted > 10, s"flow: only $planted twins planted")
    assert(twinsKept < planted / 2,
      s"vs-store dedup vacuous: $twinsKept of $planted twins survived")

    // attrition flow on the batch itself: some original batch docs
    // dropped (quality/repetition/dedup/decontam), some kept
    val batchN = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0 &&
      pmod(col("doc_id"), lit(4)) === 0).count()
    val origKept = ids.count(id => id < 2000000L)
    assert(origKept > 0 && origKept < batchN,
      s"batch attrition vacuous: $origKept of $batchN kept")

    // chunk-store flow: at least one planted shared-chunk batch doc
    // survived to be rewritten against the store chunk set
    assert(ids.exists(id => id < 2000000L && id % 97 == 13),
      "no planted shared-chunk doc in the output — chunk stage unexercised")
  }

  test("d60 incremental attrition: all nine drop reasons flow at sf0.001; every batch doc accounted exactly once") {
    val rows = SparkEntryQueries("d60_incremental_attrition").collect()
    val byReason = rows.groupBy(_.getAs[Long]("drop_reason"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    // non-vacuity dial: the planted devices (re-crawls -> 2, compilation
    // cells -> 128 and 4, verbatim first-sentence -> 8) plus organic flow
    // must light every reason — a silently dead plant fails here, not in
    // the hash gate (which would agree on the dead histogram)
    val want = Set(0L, 1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L)
    assert(want.subsetOf(byReason.keySet),
      s"drop reasons with zero flow: ${(want -- byReason.keySet).toSeq.sorted}")
    // conservation: totals = batch inputs + planted re-crawls, each
    // exactly once (disjoint first-drop reasons partition the batch)
    val docs = Tables.load(spark, dir, "documents")
    val batchN = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0 &&
      pmod(col("doc_id"), lit(4)) === 0).count()
    val twinsN = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0 &&
      pmod(col("doc_id"), lit(4)) =!= 0 &&
      pmod(col("doc_id"), lit(9)) === 5).count()
    assert(byReason.values.sum == batchN + twinsN,
      s"histogram total ${byReason.values.sum} != batch $batchN + twins $twinsN")
    // survivors (reason 0) are exactly the packed output of d57
    val packed = SparkEntryQueries("d57_incremental_pipeline").count()
    assert(byReason(0L) == packed,
      s"reason-0 count ${byReason(0L)} != d57 packed rows $packed")
  }

  test("iterated BPE: every epoch ranks 8 merges, and epoch-2+ merges fire on tokens MADE by earlier epochs") {
    val (_, ems) = TextQueries.bpeIterate(spark, dir, 4)
    val epochMerges: Seq[Seq[String]] =
      ems.map(_.collect()(0).getSeq[String](0).toSeq)
    assert(epochMerges.forall(_.size == 8),
      s"epoch sizes: ${epochMerges.map(_.size)}")
    // the iterated property: some later-epoch merge has a side that IS a
    // token produced by an earlier epoch's merge — a static single-epoch
    // ranking (r12's table) can never produce such an entry
    var priorTokens = Set.empty[String]
    var fired = 0
    epochMerges.zipWithIndex.foreach { case (ms, e) =>
      if (e > 0) fired += ms.count { m =>
        val side = m.split("", 2)
        priorTokens.contains(side(0)) || priorTokens.contains(side(1))
      }
      priorTokens ++= ms.map(_.replace("", ""))
    }
    assert(fired > 0,
      "no epoch-2+ merge involves an earlier epoch's merged token — the iteration is vacuous")
  }

  test("d55 BPE manifest: interior sequences fill to exactly 128 BPE tokens; BPE counts genuinely diverge from whitespace counts") {
    val rows = SparkEntryQueries("d55_bpe_manifest").collect()
    assert(rows.nonEmpty)
    val bySeq = rows.groupBy(_.getAs[Long]("seq_id"))
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, spans) =>
      val fill = spans.map(_.getAs[Long]("len_in_seq")).sum
      if (seq < lastSeq)
        assert(fill == 128L, s"seq $seq fills to $fill BPE tokens, not 128")
      else assert(fill <= 128L, s"final seq overfilled: $fill")
    }
    // the non-vacuity dial: if the "BPE" counts were secretly whitespace
    // counts, packing under the merge table would be d36 in disguise —
    // the per-doc totals must differ for most docs (the pre-tokenizer
    // splits punctuation/numbers AND the merges shrink sequences)
    val bpePerDoc = rows.groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.map(_.getAs[Long]("len_in_seq")).sum).toMap
    val ws = SparkEntryQueries("d36_sequence_pack").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    val diff = bpePerDoc.count { case (id, n) => ws.get(id).exists(_ != n) }
    assert(diff * 10 >= bpePerDoc.size * 9,
      s"only $diff/${bpePerDoc.size} docs have BPE != whitespace counts")
  }

  test("d51 manifest: every interior sequence fills to exactly 128 tokens, spans partition docs") {
    val rows = SparkEntryQueries("d51_pack_manifest").collect()
    assert(rows.nonEmpty)
    val bySeq = rows.groupBy(_.getAs[Long]("seq_id"))
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (seq, spans) =>
      val fill = spans.map(_.getAs[Long]("len_in_seq")).sum
      if (seq < lastSeq)
        assert(fill == 128L, s"seq $seq fills to $fill tokens, not 128")
      else assert(fill <= 128L, s"final seq overfilled: $fill")
      // spans within a sequence must tile without gaps or overlaps
      val sorted = spans.sortBy(_.getAs[Long]("start_in_seq"))
      var cursor = 0L
      sorted.foreach { sp =>
        assert(sp.getAs[Long]("start_in_seq") == cursor,
          s"seq $seq: span starts at ${sp.getAs[Long]("start_in_seq")}, expected $cursor")
        cursor += sp.getAs[Long]("len_in_seq")
      }
    }
    // per doc: spans across sequences must sum to its token count, with
    // exactly one head and one tail
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (doc, spans) =>
      assert(spans.count(_.getAs[Boolean]("doc_head")) == 1, s"doc $doc heads")
      assert(spans.count(_.getAs[Boolean]("doc_tail")) == 1, s"doc $doc tails")
    }
  }

  test("d20 domains: per-domain doc counts re-derive from the id arithmetic") {
    val rows = graft.SparkEntry.queries("d20_url_domains")(spark, dir).collect()
      .map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("n_urls"), r.getAs[Long]("n_docs"), r.getAs[Long]("n_https")))
      .toMap
    val nDocs = Tables.load(spark, dir, "documents").count()
    // site domains: doc_id % 7 x doc_id % 3 -> 21 https domains, one URL
    // per doc; cdn domains: even doc_id % 4 in {0, 2} -> 2 http domains
    assert(rows.size == 23, s"expected 23 domains, got ${rows.keySet}")
    (0L until 7L).foreach { s7 =>
      Seq(("com", 0L), ("org", 1L), ("net", 2L)).foreach { case (tld, r3) =>
        val expect = (0L until nDocs).count(d => d % 7 == s7 && d % 3 == r3).toLong
        val (urls, docs, https) = rows(s"site$s7.example.$tld")
        assert(urls == expect && docs == expect && https == expect,
          s"site$s7.example.$tld: ($urls,$docs,$https) != $expect")
      }
    }
    Seq(0L, 2L).foreach { c4 =>
      val expect = (0L until nDocs).count(d => d % 2 == 0 && d % 4 == c4).toLong
      val (urls, docs, https) = rows(s"cdn$c4.example.com")
      assert(urls == expect && docs == expect && https == 0,
        s"cdn$c4: ($urls,$docs,$https) != $expect")
    }
  }

  test("q49 variant extraction agrees with the schema-declared from_json path") {
    import org.apache.spark.sql.functions._
    val variant = graft.SparkEntry.queries("q49_variant_json")(spark, dir)
      .collect().map(r => r.getAs[Long]("k_mod") ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_k"), r.getAs[Long]("max_k"))).toMap
    val declared = Tables.load(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_mod"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"), max("k").as("max_k"))
      .collect().map(r => r.getAs[Long]("k_mod") ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_k"), r.getAs[Long]("max_k"))).toMap
    assert(variant == declared, s"variant path diverges: $variant vs $declared")
  }
}
