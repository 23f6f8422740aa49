package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Semantic gates for the round-4 pipeline operators (d12-d15): top-term
  * ranking is well-ordered, repetition and contamination fractions agree
  * with independently-computed set arithmetic, and stratified sampling is
  * a pure function of content (partitioning-invariant). Run on sf0.001 to
  * keep the suite fast; the DuckDB oracle covers exact values at sf0.01.
  */
class TextPipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("d12 top terms: <=3 per doc, ranks well-ordered by (tf, -df, term)") {
    val rows = q("d12_tfidf_topterms").collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (doc, rs) =>
      assert(rs.length <= 3, s"doc $doc emitted ${rs.length} terms")
      val ordered = rs.sortBy(_.getAs[Long]("rnk"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val ka = (-a.getAs[Long]("tf"), a.getAs[Long]("df"), a.getAs[String]("term"))
          val kb = (-b.getAs[Long]("tf"), b.getAs[Long]("df"), b.getAs[String]("term"))
          assert(Ordering[(Long, Long, String)].lt(ka, kb),
            s"doc $doc rank order violated: $a then $b")
        case _ =>
      }
    }
  }

  test("d13 repetition agrees with builtin distinct-gram arithmetic") {
    val got = q("d13_repetition").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_total"), r.getAs[Long]("n_distinct"))).toMap
    assert(got.nonEmpty)
    // independent formulation: gram strings via transform + array_distinct
    val want = Tables.load(spark, dir, "documents")
      .withColumn("toks", expr("regexp_extract_all(text, '\\\\S+', 0)"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), (size(col("toks")) - 2).as("n_total"),
        size(array_distinct(expr(
          """transform(sequence(0, size(toks) - 3),
            |  i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))""".stripMargin)))
          .as("n_distinct"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_total").toLong, r.getAs[Int]("n_distinct").toLong)).toMap
    assert(got == want)
    got.values.foreach { case (total, distinct) =>
      assert(distinct >= 1 && distinct <= total)
    }
  }

  test("d14 contamination agrees with array_intersect against benchmark grams") {
    val docs = Tables.load(spark, dir, "documents")
      .withColumn("toks", expr("regexp_extract_all(text, '\\\\S+', 0)"))
      .select(col("doc_id"), graft.functions.TextHashes.shingleHash64Col(
        col("text"), col("toks"), 3, emptyIfShort = true).as("ghs"))
    val benchGrams = docs.filter(col("doc_id") < 20)
      .agg(array_distinct(flatten(collect_list("ghs")))).first().getSeq[Long](0)
    val want = docs.filter(col("doc_id") >= 20 && size(col("ghs")) > 0)
      .select(col("doc_id"), size(col("ghs")).as("n_grams"),
        size(array_intersect(col("ghs"),
          lit(benchGrams.toArray))).as("n_hit"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_grams").toLong, r.getAs[Int]("n_hit").toLong)).toMap
    val got = q("d14_contamination").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"))).toMap
    assert(got == want)
    // benchmark docs never appear in the output
    assert(got.keys.forall(_ >= 20))
  }

  test("d15 stratified sample is partitioning-invariant and rate-shaped") {
    val a = q("d15_stratified_sample").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // same computation over a different physical layout must agree exactly
    graft.functions.Fingerprint64.register(spark)
    val fp = graft.functions.Fingerprint64.fingerprint64(col("text"))
    val b = Tables.load(spark, dir, "documents")
      .repartition(13, col("doc_id"))
      .select(col("lang"), col("text")).withColumn("fp", fp)
      .withColumn("bucket", expr("pmod(pmod(fp, 100L) + IF(fp < 0, 16L, 0L), 100L)"))
      .withColumn("rate", when(col("lang") === "en", 50L)
        .when(col("lang") === "de", 25L).otherwise(10L))
      .groupBy("lang").agg(count(lit(1)).as("n_total"),
        sum(when(col("bucket") < col("rate"), 1L).otherwise(0L)).as("n_kept"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(a == b)
    a.foreach { case (lang, (total, kept)) =>
      assert(kept <= total, s"$lang kept $kept of $total")
    }
  }

  test("d17 redaction: counted PII is fully scrubbed, counts agree with regexp_count") {
    val rows = q("d17_pii_redact").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_email") >= 1 && r.getAs[Long]("n_phone") >= 1 &&
        r.getAs[Long]("n_ip") >= 1, s"augmented PII not detected: $r")
    }
    // independent reconstruction through the SQL expression path: after
    // redaction ZERO matches of any pattern survive, and the pre-redaction
    // regexp_count agrees with the query's size(regexp_extract_all) counts
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\\\.[A-Za-z]{2,}"
    val phoneRe = "\\\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
    val ipRe = "\\\\b[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}\\\\b"
    val residual = Tables.load(spark, dir, "documents")
      .selectExpr("doc_id",
        """concat(text, ' contact user', doc_id, '@mail.example.com or +1-555-',
          |lpad(cast(doc_id % 10000 AS STRING), 4, '0'), ' ip 10.',
          |cast(doc_id % 256 AS STRING), '.0.',
          |cast((doc_id * 7) % 256 AS STRING)) AS t""".stripMargin)
      .selectExpr("doc_id",
        s"regexp_count(t, '$emailRe') AS ce",
        s"regexp_count(t, '$phoneRe') AS cp",
        s"regexp_count(t, '$ipRe') AS ci",
        s"""regexp_count(regexp_replace(regexp_replace(regexp_replace(t,
           |  '$emailRe', '<EMAIL>'), '$phoneRe', '<PHONE>'), '$ipRe', '<IP>'),
           |  '$emailRe|$phoneRe|$ipRe') AS leftover""".stripMargin)
      .collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    residual.foreach { r =>
      val g = byId(r.getAs[Long]("doc_id"))
      assert(r.getAs[Int]("leftover") == 0, s"PII survived redaction: $r")
      assert(g.getAs[Long]("n_email") == r.getAs[Int]("ce").toLong &&
        g.getAs[Long]("n_phone") == r.getAs[Int]("cp").toLong &&
        g.getAs[Long]("n_ip") == r.getAs[Int]("ci").toLong,
        s"count mismatch: $g vs $r")
    }
  }

  test("d18 chunk dedup: kept count equals global distinct chunk count") {
    val rows = q("d18_chunk_dedup").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_chunks"), r.toString)
      assert(r.getAs[Long]("n_kept") >= 0 && r.getAs[Long]("kept_chars") >= 0)
    }
    // first-occurrence keep rule <=> exactly one survivor per distinct
    // chunk text corpus-wide
    val distinctChunks = Tables.load(spark, dir, "documents")
      .selectExpr("regexp_extract_all(text, '\\\\S+', 0) AS tk")
      .selectExpr(
        """explode(CASE WHEN size(tk) = 0 THEN array()
          |ELSE transform(sequence(0, cast(ceil(size(tk)/20.0) AS INT) - 1),
          |               i -> array_join(slice(tk, i*20+1, 20), ' ')) END) AS chunk"""
          .stripMargin)
      .agg(countDistinct(col("chunk"))).head.getLong(0)
    val totalKept = rows.map(_.getAs[Long]("n_kept")).sum
    assert(totalKept == distinctChunks,
      s"kept $totalKept != distinct $distinctChunks")
  }

  test("d19 filter chain: kept is the AND of its rules; ok_len agrees with d01") {
    val rows = q("d19_filter_chain").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val expect = r.getAs[Boolean]("ok_len") && r.getAs[Boolean]("ok_wordlen") &&
        r.getAs[Boolean]("ok_stop") && r.getAs[Boolean]("ok_rep")
      assert(r.getAs[Boolean]("kept") == expect, s"kept != AND of rules: $r")
    }
    // cross-query consistency: the token-count rule must agree with the
    // independently-computed d01 token counts
    val nTok = q("d01_text_stats").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    rows.foreach { r =>
      val n = nTok(r.getAs[Long]("doc_id"))
      assert(r.getAs[Boolean]("ok_len") == (n >= 10 && n <= 1000),
        s"ok_len disagrees with d01 n_tokens=$n: $r")
    }
  }

  test("d33 oov rate: agrees with an independently-computed top-16 vocabulary") {
    val rows = q("d33_oov_rate").collect()
    assert(rows.length == 500)
    // independent recomputation: tokenize on the driver, rank by
    // (count desc, token asc), cut at 16, score each doc
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        "\\S+".r.findAllIn(r.getAs[String]("text")).toSeq)
    val counts = docs.flatMap(_._2).groupBy(identity).map { case (w, ws) => (w, ws.length) }
    val vocab = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(16).map(_._1).toSet
    val expected = docs.map { case (id, toks) =>
      val oov = toks.count(!vocab.contains(_))
      (id, (toks.length.toLong, oov.toLong,
        if (toks.isEmpty) 1000L else 1000L * oov / toks.length))
    }.toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val got = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
        r.getAs[Long]("oov_permille"))
      assert(got == expected(id), s"doc $id: got $got expected ${expected(id)}")
    }
    // sanity: permille bounded, and not everything is in-vocab (the
    // 31-token synthetic vocabulary guarantees out-of-top-16 tokens)
    assert(rows.forall { r =>
      val p = r.getAs[Long]("oov_permille"); p >= 0 && p <= 1000 })
    assert(rows.exists(_.getAs[Long]("n_oov") > 0))
  }

  test("d34 importance votes: bounded by token count, sign-consistent, discriminative") {
    val rows = graft.PinScope.run(spark) { q("d34_importance_votes").collect() }
    assert(rows.length == 500)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_tokens"); val v = r.getAs[Long]("votes")
      assert(math.abs(v) <= n, s"votes $v exceed token count $n")
      assert(r.getAs[Boolean]("target_like") == (v > 0))
    }
    // the vote test must discriminate: both positive and negative scores
    // exist on the synthetic corpus (measured -39..+11 at sf0.01)
    assert(rows.exists(_.getAs[Long]("votes") > 0), "no target-like docs")
    assert(rows.exists(_.getAs[Long]("votes") < 0), "no anti-target docs")
  }

  test("d35 url canonicalization: messy variants unify, exactly one keeper per group") {
    val rows = q("d35_url_canonical").collect()
    assert(rows.nonEmpty)
    // canonical form is fully normalized: lowercase scheme+host, no
    // www., no default port, no fragment, no trailing slash
    rows.foreach { r =>
      val c = r.getAs[String]("curl")
      assert(c.startsWith("https://site"), s"bad canonical: $c")
      assert(!c.contains("www.") && !c.contains(":443") && !c.contains("#") &&
        !c.endsWith("/"), s"unnormalized canonical: $c")
    }
    // keep is exactly the min-doc_id row of each canonical group
    val byCanon = rows.groupBy(_.getAs[String]("curl"))
    byCanon.foreach { case (c, g) =>
      val keepers = g.filter(_.getAs[Boolean]("keep"))
      assert(keepers.length == 1, s"$c has ${keepers.length} keepers")
      assert(keepers.head.getAs[Long]("doc_id") ==
        g.map(_.getAs[Long]("doc_id")).min, s"$c keeper is not min doc_id")
      assert(g.forall(_.getAs[Long]("n_dups") == g.length))
    }
    // real dedup structure: fewer canonical urls than raw urls
    assert(byCanon.size < rows.length, "no cross-doc collisions — vacuous dedup")
  }

  test("d36 sequence pack: stream is contiguous and seq arithmetic is consistent") {
    val rows = graft.PinScope.run(spark) {
      q("d36_sequence_pack").orderBy("doc_id").collect()
    }
    assert(rows.length == 500)
    // contiguity: each doc starts exactly where the previous one ended
    // (the bucketed prefix sum must equal the naive serial cumsum)
    var expectStart = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("token_start") == expectStart,
        s"doc ${r.getAs[Long]("doc_id")} starts at ${r.getAs[Long]("token_start")}, expected $expectStart")
      expectStart += r.getAs[Long]("n_tokens")
    }
    rows.foreach { r =>
      val (st, n) = (r.getAs[Long]("token_start"), r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("seq_id") == st / 128)
      assert(r.getAs[Long]("seq_offset") == st % 128)
      val expectSeqs = if (n == 0) 0L else (st + n - 1) / 128 - st / 128 + 1
      assert(r.getAs[Long]("n_seqs") == expectSeqs)
    }
    // packing is real: some docs straddle a sequence boundary
    assert(rows.exists(_.getAs[Long]("n_seqs") > 1), "no doc crosses a cut point")
  }
}
