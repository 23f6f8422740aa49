package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen expressions must be BIT-IDENTICAL to the builtin /
  * HOF formulations they replaced — otherwise round-2 outputs silently
  * drift from round-1 (and from the DuckDB oracle, which was tuned against
  * the HOF fold order). Each test recomputes the round-1 formulation
  * inline and compares exactly. Runs on real gate data (sf0.001). */
class NativeExprParitySpec extends AnyFunSuite with BeforeAndAfterAll {
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

  private def docs = graft.operators.Tables.load(spark, dir, "documents")
  private def embs = graft.operators.Tables.load(spark, dir, "embeddings")

  test("simhash64 expression == explode + 64-sum aggregate formulation") {
    val toks = docs
      .withColumn("__tok", expr("regexp_extract_all(text, '\\\\S+', 0)"))
      .filter(size(col("__tok")) > 0)
    val native = toks
      .select(col("doc_id"), TextHashes.simhash64Col(col("__tok")).as("fp"))
    // round-1 shape: per-token hash votes aggregated per doc
    val exploded = toks.select(col("doc_id"),
      explode(expr("transform(__tok, t -> xxhash64(t))")).as("h"))
    val sums = (0 until 64).map(b =>
      sum(when(expr(s"(h >> $b) & 1") === 1, 1L).otherwise(-1L)).as(s"s$b"))
    val fpExpr = (0 until 64)
      .map(b => s"IF(s$b > 0, shiftleft(1L, $b), 0L)").mkString(" + ")
    val agg = exploded.groupBy("doc_id").agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), expr(fpExpr).as("fp"))
    val diff = native.join(agg.withColumnRenamed("fp", "fp2"), "doc_id")
      .filter(col("fp") =!= col("fp2")).count()
    assert(diff == 0, s"$diff docs with mismatched simhash fingerprints")
    assert(native.count() == agg.count())
  }

  test("minhash_sig expression == min(xxhash64(i, h)) aggregate formulation") {
    import graft.operators.Dedup
    val base = docs.withColumn("__tok", Dedup.tokenCol)
      .select(col("doc_id"), Dedup.shingleHashes.as("sh"))
    val native = base.select(col("doc_id"),
      TextHashes.minhashSigCol(col("sh"), Dedup.NumPerms).as("sig"))
    val exploded = base.select(col("doc_id"), explode(col("sh")).as("h"))
    val mins = (0 until Dedup.NumPerms).map(i =>
      min(xxhash64(lit(i.toLong), col("h"))).as(s"m$i"))
    val agg = exploded.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until Dedup.NumPerms).map(i => col(s"m$i")): _*).as("sig2"))
    val diff = native.join(agg, "doc_id")
      .filter(col("sig") =!= col("sig2")).count()
    assert(diff == 0, s"$diff docs with mismatched minhash signatures")
  }

  test("shingle_hash64 expression == HOF concat+xxhash64 formulation") {
    val base = docs.withColumn("__tok",
      expr("regexp_extract_all(text, '\\\\S+', 0)"))
    val hof = expr(
      """CASE WHEN size(__tok) < 3 THEN array(xxhash64(text))
        |ELSE array_distinct(transform(sequence(1, size(__tok) - 2),
        |  i -> xxhash64(concat(element_at(__tok, i), ' ',
        |                       element_at(__tok, i + 1), ' ',
        |                       element_at(__tok, i + 2))))) END""".stripMargin)
    val cmp = base.select(col("doc_id"), hof.as("h"),
      TextHashes.shingleHash64Col(col("text"), col("__tok"), 3).as("n"),
      TextHashes.shingleHash64Col(col("text"), col("__tok"), 3,
        emptyIfShort = true).as("ne"))
    assert(cmp.filter(col("h") =!= col("n")).count() == 0,
      "native shingle hashes must equal the HOF formulation exactly")
    // emptyIfShort differs only for docs under 3 tokens
    assert(cmp.filter(size(col("__tok")) >= 3)
      .filter(col("h") =!= col("ne")).count() == 0)
    assert(cmp.filter(size(col("__tok")) < 3)
      .filter(size(col("ne")) =!= 0).count() == 0)
  }

  test("cosine_sim and l2norm expressions == HOF fold formulation") {
    val pairs = embs.filter(col("vec_id") < 5)
      .select(col("vec_id").as("ida"), col("embedding").as("a"))
      .crossJoin(embs.filter(col("vec_id").between(5, 9))
        .select(col("vec_id").as("idb"), col("embedding").as("b")))
    val hofDot = expr("aggregate(zip_with(a, b, " +
      "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)")
    def hofNorm(c: String) = expr(s"sqrt(aggregate($c, 0.0D, " +
      "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))")
    val cmp = pairs
      .withColumn("hof", hofDot / (hofNorm("a") * hofNorm("b")))
      .withColumn("nat", VectorOps.cosineSim(col("a"), col("b")))
      .withColumn("hofn", hofNorm("a"))
      .withColumn("natn", VectorOps.l2normCol(col("a")))
    assert(cmp.filter(col("hof") =!= col("nat")).count() == 0,
      "cosine must be bit-identical to the HOF fold")
    assert(cmp.filter(col("hofn") =!= col("natn")).count() == 0,
      "l2norm must be bit-identical to the HOF fold")
    val l1 = embs.withColumn("hof",
        expr("aggregate(embedding, 0.0D, (acc, x) -> acc + abs(CAST(x AS DOUBLE)))"))
      .withColumn("nat", VectorOps.absSumCol(col("embedding")))
    assert(l1.filter(col("hof") =!= col("nat")).count() == 0,
      "abs-sum must be bit-identical to the HOF fold")
  }

  test("int8 quantization kernels == round-8 HOF formulations (bit parity)") {
    // the exact HOF bodies e09/e10 shipped in round 8, recomputed inline
    val base = embs
      .withColumn("scale0", expr(
        "aggregate(embedding, 0.0D, (a, x) -> greatest(a, abs(CAST(x AS DOUBLE)))) / 127.0D"))
      .withColumn("scale", when(col("scale0") === 0.0, lit(1.0))
        .otherwise(col("scale0")))
      .withColumn("qv_hof", expr(
        """transform(embedding, x -> CAST(CAST(x AS DOUBLE)/scale
          |  + IF(x >= CAST(0.0 AS FLOAT), 0.5D, -0.5D) AS BIGINT))""".stripMargin))
      .withColumn("qv_auto_hof", expr(
        """transform(embedding, x -> CAST(CAST(x AS DOUBLE) /
          |  IF(aggregate(embedding, 0.0D, (a, v) -> greatest(a, abs(CAST(v AS DOUBLE)))) = 0.0D, 1.0D,
          |     aggregate(embedding, 0.0D, (a, v) -> greatest(a, abs(CAST(v AS DOUBLE)))) / 127.0D)
          |  + IF(x >= CAST(0.0 AS FLOAT), 0.5D, -0.5D) AS BIGINT))""".stripMargin))
      .withColumn("ma_nat", VectorOps.maxAbsCol(col("embedding")) / lit(127.0))
      .withColumn("qv_nat", VectorOps.int8EncodeCol(col("embedding"), col("scale")))
      .withColumn("qv_auto_nat", VectorOps.int8EncodeAutoCol(col("embedding")))
    assert(base.filter(col("scale0") =!= col("ma_nat")).count() == 0,
      "max-abs scale must be bit-identical to the HOF greatest fold")
    assert(base.filter(col("qv_hof") =!= col("qv_nat")).count() == 0,
      "explicit-scale encode must equal the HOF transform exactly")
    assert(base.filter(col("qv_auto_hof") =!= col("qv_auto_nat")).count() == 0,
      "auto-scale encode must equal the HOF transform exactly")
    val stats = base
      .withColumn("sum_hof", expr("aggregate(qv_hof, 0L, (a, v) -> a + v)"))
      .withColumn("max_hof",
        expr("aggregate(transform(qv_hof, v -> abs(v)), 0L, (a, v) -> greatest(a, v))"))
      .withColumn("err_hof", expr(
        """aggregate(zip_with(embedding, qv_hof,
          |  (x, v) -> CAST(abs(CAST(x AS DOUBLE) - v*scale)/scale*1000000.0D AS BIGINT)),
          |  0L, (a, b) -> a + b)""".stripMargin))
      .withColumn("sum_nat", VectorOps.longSumCol(col("qv_nat")))
      .withColumn("max_nat", VectorOps.longAbsMaxCol(col("qv_nat")))
      .withColumn("err_nat",
        VectorOps.quantErrPpmCol(col("embedding"), col("qv_nat"), col("scale")))
    assert(stats.filter(col("sum_hof") =!= col("sum_nat")).count() == 0)
    assert(stats.filter(col("max_hof") =!= col("max_nat")).count() == 0)
    assert(stats.filter(col("err_hof") =!= col("err_nat")).count() == 0)
  }

  test("int_cosine_sim == HOF long-fold formulation (bit parity)") {
    val coded = embs.select(col("vec_id"),
      VectorOps.int8EncodeAutoCol(col("embedding")).as("q"))
    val pairs = coded.filter(col("vec_id") < 5)
      .select(col("vec_id").as("ida"), col("q").as("qq"))
      .crossJoin(coded.filter(col("vec_id").between(5, 9))
        .select(col("vec_id").as("idb"), col("q").as("qc")))
    // e10's round-8 Column formulation: dot / sqrt(na) / sqrt(nb),
    // left-associated — the division order the kernel must reproduce
    val hof =
      expr("aggregate(zip_with(qq, qc, (x, y) -> x * y), 0L, (a, v) -> a + v)") /
        sqrt(expr("aggregate(transform(qq, x -> x * x), 0L, (a, v) -> a + v)")) /
        sqrt(expr("aggregate(transform(qc, x -> x * x), 0L, (a, v) -> a + v)"))
    val cmp = pairs.withColumn("hof", hof)
      .withColumn("nat", VectorOps.intCosineSimCol(col("qq"), col("qc")))
    assert(cmp.filter(col("hof") =!= col("nat")).count() == 0,
      "integer cosine must be bit-identical to the HOF fold")
  }

  test("sign_bits64 == HOF shift-fold formulation (bit parity)") {
    // e13's encode: bit i set iff embedding[i] > 0, folded as a sum of
    // disjoint powers of two (equivalent to OR for distinct bits)
    val hof = expr(
      """aggregate(sequence(0, size(embedding) - 1), 0L,
        |  (a, i) -> a + IF(CAST(element_at(embedding, i + 1) AS DOUBLE) > 0.0D,
        |                   shiftleft(1L, i), 0L))""".stripMargin)
    val cmp = embs.select(col("vec_id"),
      hof.as("hof"), VectorOps.signBits64Col(col("embedding")).as("nat"))
    assert(cmp.filter(col("hof") =!= col("nat")).count() == 0,
      "sign-bit packing must be bit-identical to the HOF fold")
  }

  test("null array elements: vector exprs return NULL, text hashes skip") {
    val s = spark
    import s.implicits._
    val df = Seq(1).toDF("x").selectExpr(
      "array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS va",
      "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS vb",
      "array('a', CAST(NULL AS STRING), 'b') AS toks")
    val r = df.select(
      VectorOps.cosineSim(col("va"), col("vb")).as("c"),
      VectorOps.l2normCol(col("va")).as("n"),
      graft.operators.VectorQueries.srpBucketIds("va").as("b"),
      TextHashes.simhash64Col(col("toks")).as("sh")).collect()(0)
    assert(r.isNullAt(0), "cosine over a null element must be NULL")
    assert(r.isNullAt(1), "l2norm over a null element must be NULL")
    assert(r.isNullAt(2), "bucket ids over a null element must be NULL")
    // simhash skips null tokens: equals the hash of just ('a','b')
    val want = df.selectExpr("array('a', 'b') AS toks")
      .select(TextHashes.simhash64Col(col("toks"))).collect()(0).getLong(0)
    assert(r.getLong(3) == want)
    // centroid Aggregator: zero-length vectors count but don't poison sums
    val cent = VectorCentroid.asUdaf
    val mixed = Seq(Array(2.0f, 4.0f), Array.empty[Float], Array(4.0f, 8.0f))
      .toDF("v").repartition(3)
    val c = mixed.agg(cent(col("v"))).collect()(0).getSeq[Double](0)
    assert(c == Seq(2.0, 4.0), s"empty vectors count toward n: $c")
  }

  test("srp_bucket_ids expression == HOF hyperplane formulation") {
    import graft.operators.VectorQueries.{NumTables, PlanesPerTable}
    val nPlanes = NumTables * PlanesPerTable
    val planes = typedlit((0 until nPlanes).map(i =>
      VectorOps.hyperplane(i, 64).toSeq))
    val signs = transform(sequence(lit(0), lit(nPlanes - 1)), k =>
      when(aggregate(
        zip_with(col("embedding"), element_at(planes, k + 1),
          (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v) > 0, 1L).otherwise(0L))
    val weights = typedlit((0 until PlanesPerTable).map(p => 1L << p))
    val hofBuckets = array((0 until NumTables).map { t =>
      aggregate(
        zip_with(slice(signs, t * PlanesPerTable + 1, PlanesPerTable),
          weights, (s, w) => s * w),
        lit(0L), (acc, v) => acc + v)
    }: _*)
    val cmp = embs.select(
      hofBuckets.as("hof"),
      graft.operators.VectorQueries.srpBucketIds().as("nat"))
    assert(cmp.filter(col("hof") =!= col("nat")).count() == 0,
      "bucket ids must match the HOF formulation exactly")
  }

  // ---- r18 curation-kernel expressions (TextStats) ----

  /** Gate corpus + crafted edges: empty, whitespace-only, every \s class
    * char, non-\s controls/unicode spaces (NBSP is NOT Java \s), multi-
    * byte tokens, and boilerplate-style short docs. */
  private def textEdgeCases = {
    val sp = spark
    import sp.implicits._
    Seq("", " ", " \t\n\f\r ", "a", " a ", "a b", "a  b\tc",
      "x y", "\u00A0", "héllo wörld 世界 tok",
      "a b c", "one two three four five six seven eight nine ten",
      "the the the a of to in is", "t " * 40)
      .toDF("text").withColumn("doc_id", monotonically_increasing_id())
  }

  test("ws_tokens expression == regexp_extract_all(text, '\\S+') exactly") {
    for (df <- Seq(docs.select("doc_id", "text"), textEdgeCases)) {
      val cmp = df.select(
        expr("regexp_extract_all(text, '\\\\S+', 0)").as("re"),
        TextStats.wsTokensCol(col("text")).as("nat"))
      assert(cmp.filter(not(col("re") <=> col("nat"))).count() == 0,
        "ws_tokens must equal the regexp formulation on every row")
    }
  }

  test("quality_stats expression == the d19 HOF stat quadruple") {
    val stops = Seq("the", "a", "and", "of", "to", "in", "is")
    val inL = stops.map(s => s"'$s'").mkString("(", ", ", ")")
    for (df <- Seq(docs.select("doc_id", "text"), textEdgeCases)) {
      val base = df
        .withColumn("tk", expr("regexp_extract_all(text, '\\\\S+', 0)"))
        .withColumn("qs", TextStats.qualityStatsCol(col("tk"), stops))
        .withColumn("h_n_tok", size(col("tk")).cast("long"))
        .withColumn("h_tok_chars",
          expr("aggregate(tk, 0L, (acc, t) -> acc + length(t))"))
        .withColumn("h_n_stop",
          size(expr(s"filter(tk, t -> t IN $inL)")).cast("long"))
        .withColumn("h_n_tri_distinct", size(array_distinct(expr(
          """CASE WHEN size(tk) < 3 THEN array()
            |ELSE transform(sequence(0, size(tk) - 3),
            |  i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2])) END"""
            .stripMargin))).cast("long"))
      val bad = base.filter(
        not(col("qs.n_tok") <=> col("h_n_tok")) ||
          not(col("qs.tok_chars") <=> col("h_tok_chars")) ||
          not(col("qs.n_stop") <=> col("h_n_stop")) ||
          not(col("qs.n_tri_distinct") <=> col("h_n_tri_distinct")))
      assert(bad.count() == 0,
        "quality_stats must equal the HOF quadruple on every row")
    }
    // and the composed filter keeps exactly the same docs on gate data
    val viaHelper = graft.operators.PipelineQueries
      .qualityDocs(docs.select("doc_id", "lang", "source", "text"))
      .select("doc_id")
    val hofKept = {
      val b = docs
        .withColumn("tk", expr("regexp_extract_all(text, '\\\\S+', 0)"))
        .withColumn("n_tok", size(col("tk")).cast("long"))
        .withColumn("tok_chars",
          expr("aggregate(tk, 0L, (acc, t) -> acc + length(t))"))
        .withColumn("n_stop",
          size(expr(s"filter(tk, t -> t IN $inL)")).cast("long"))
        .withColumn("n_tri", greatest(col("n_tok") - 2, lit(0L)))
        .withColumn("n_tri_distinct", size(array_distinct(expr(
          """CASE WHEN size(tk) < 3 THEN array()
            |ELSE transform(sequence(0, size(tk) - 3),
            |  i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2])) END"""
            .stripMargin))).cast("long"))
      b.filter(col("n_tok").between(10, 1000) &&
          lit(2) * col("n_tok") <= col("tok_chars") &&
          col("tok_chars") <= lit(12) * col("n_tok") &&
          col("n_stop") >= 2 &&
          (col("n_tri") === 0 ||
            lit(10) * col("n_tri_distinct") >= lit(4) * col("n_tri")))
        .select("doc_id")
    }
    assert(viaHelper.exceptAll(hofKept).count() == 0 &&
      hofKept.exceptAll(viaHelper).count() == 0,
      "qualityDocs admission set must be unchanged")
  }

  test("gram_joins expression == chunk/window transform+slice+array_join") {
    for (df <- Seq(docs.select("doc_id", "text"), textEdgeCases)) {
      val base = df
        .withColumn("tk", expr("regexp_extract_all(text, '\\\\S+', 0)"))
      val chunksHof = expr(
        """CASE WHEN size(tk) = 0 THEN array()
          |ELSE transform(sequence(0, cast(ceil(size(tk)/20.0) AS INT) - 1),
          |               i -> array_join(slice(tk, i*20+1, 20), ' ')) END"""
          .stripMargin)
      val winsHof = expr(
        """CASE WHEN size(tk) < 8 THEN array()
          |ELSE transform(sequence(1, size(tk)-7),
          |  i -> array_join(slice(tk, i, 8), ' ')) END""".stripMargin)
      // repetitionDocs' bigram axis (width 2, stride 1)
      val bigramsHof = expr(
        """CASE WHEN size(tk) < 2 THEN array()
          |ELSE transform(sequence(1, size(tk) - 1),
          |  i -> concat(tk[i-1], ' ', tk[i])) END""".stripMargin)
      val cmp = base.select(
        chunksHof.as("ch"), TextStats.chunkJoinsCol(col("tk"), 20).as("cn"),
        winsHof.as("wh"), TextStats.windowJoinsCol(col("tk"), 8).as("wn"),
        bigramsHof.as("bh"), TextStats.windowJoinsCol(col("tk"), 2).as("bn"))
      assert(cmp.filter(not(col("ch") <=> col("cn")) ||
        not(col("wh") <=> col("wn")) ||
        not(col("bh") <=> col("bn"))).count() == 0,
        "gram_joins must equal the HOF formulations on every row")
    }
  }

  test("sentence_split == filter(split(text,'[.!?]+\\s+'), trim-nonempty)") {
    val sp = spark
    import sp.implicits._
    // gate corpus + regex-split edge cases: leading/trailing delimiters,
    // terminator runs without whitespace (NOT a delimiter), tab-only
    // segments (trim removes ASCII 32 only -> kept), empty text,
    // multi-byte text, consecutive delimiters
    val edges = Seq("", ".", ". ", " . ", "a.b", "a. b", "a.. b", "a.!? b",
      "a . b", ". a", "a .", "a. . b", " \t. b", "a.\t.\tb", "x?! y! z",
      "héllo. wörld? 世界. tok", "a.   b", "a.\n\nb", "..!!??  ",
      "ends with period. ", "no terminators at all", "a!b?c.d",
      "tab\tseparated. next", ".. ", " .. a .. b .. ")
      .toDF("text")
    for (df <- Seq(docs.select("text"), edges)) {
      val cmp = df.select(
        expr("filter(split(text, '[.!?]+\\\\s+'), x -> length(trim(x)) > 0)")
          .as("hof"),
        TextStats.sentencesCol(col("text")).as("nat"))
      assert(cmp.filter(not(col("hof") <=> col("nat"))).count() == 0,
        "sentence_split must equal the split+filter formulation on every row")
    }
  }

  test("bpe_pre_tokens / bpe_class_counts == regexp + rlike formulations") {
    val pat = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+|\\s+"
    val sp = spark
    import sp.implicits._
    // alternation edge cases: every contraction suffix, bare/lone
    // apostrophes (match NOTHING — regexp skips a char), space binding
    // to alpha/digit/other runs but not to ws/apostrophe, tab runs,
    // multi-byte "other" runs, string boundaries
    val edges = Seq("", "'", "''", "'s", "'x", "'re", "'r", "'lll", "it's",
      "don't-stop", "you'll", "we've", "I'm", "he'd", "a'",
      " x", "  x", " 5", " .", " '", " 'st", "\tx", " \t x",
      "a1b2", "42%", "(you'll see 42%)!", "héllo wörld", " é", "a é b",
      "trailing space ", "multi  spaces", "end.'", "'t'want",
      "It's v3.2, don't-stop #7 (you'll see 42%)!")
      .toDF("t")
    val base = docs.select(concat(col("text"), lit(" It's v"),
      (col("doc_id") % 10).cast("string"), lit(".2, don't-stop #"),
      col("doc_id").cast("string"), lit(" (you'll see 42%)!")).as("t"))
    for (df <- Seq(base, edges)) {
      val cmp = df.select(
        regexp_extract_all(col("t"), lit(pat), lit(0)).as("re"),
        TextStats.bpePreTokensCol(col("t")).as("nat"))
      assert(cmp.filter(not(col("re") <=> col("nat"))).count() == 0,
        "bpe_pre_tokens must equal the regexp alternation on every row")
      val cc = df
        .withColumn("bt", regexp_extract_all(col("t"), lit(pat), lit(0)))
        .withColumn("bc", TextStats.bpeClassCountsCol(col("bt")))
        .select(
          size(filter(col("bt"), x => x.rlike("^ ?[A-Za-z]")))
            .cast("long").as("h_alpha"),
          size(filter(col("bt"), x => x.rlike("^ ?[0-9]")))
            .cast("long").as("h_num"),
          size(filter(col("bt"), x => x.rlike("^'")))
            .cast("long").as("h_contr"),
          col("bc.n_alpha"), col("bc.n_num"), col("bc.n_contr"))
      assert(cc.filter(
        not(col("h_alpha") <=> col("n_alpha")) ||
          not(col("h_num") <=> col("n_num")) ||
          not(col("h_contr") <=> col("n_contr"))).count() == 0,
        "bpe_class_counts must equal the rlike filters on every row")
    }
  }

  test("fuzz: native text kernels == regex/HOF on seeded random strings") {
    // deterministic fuzz over an adversarial alphabet: every \s class
    // byte, terminators, apostrophes + contraction suffix chars, digits,
    // multi-byte code points, NBSP (NOT Java \s) — 600 strings of
    // length 0-40
    val alphabet = Array(" ", "\t", "\n", "\u000B", "\f", "\r", ".", "!",
      "?", "'", "s", "t", "r", "e", "v", "m", "l", "d", "a", "B", "0",
      "9", ",", ";", "é", "世", "\u00A0", "#")
    val rnd = new scala.util.Random(181818L)
    val strings = (1 to 600).map { _ =>
      val n = rnd.nextInt(41)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val sp = spark
    import sp.implicits._
    val df = strings.toDF("text")
    val bpePat =
      "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s']+|\\s+"
    val cmp = df.select(
      expr("regexp_extract_all(text, '\\\\S+', 0)").as("h_tok"),
      TextStats.wsTokensCol(col("text")).as("n_tok"),
      expr("filter(split(text, '[.!?]+\\\\s+'), x -> length(trim(x)) > 0)")
        .as("h_sent"),
      TextStats.sentencesCol(col("text")).as("n_sent"),
      regexp_extract_all(col("text"), lit(bpePat), lit(0)).as("h_bpe"),
      TextStats.bpePreTokensCol(col("text")).as("n_bpe"),
      size(expr("regexp_extract_all(text, '[.,;:!?]', 0)")).as("h_punct"),
      TextStats.asciiSetCountCol(col("text"), ".,;:!?").as("n_punct"))
    val bad = cmp.filter(
      not(col("h_tok") <=> col("n_tok")) ||
        not(col("h_sent") <=> col("n_sent")) ||
        not(col("h_bpe") <=> col("n_bpe")) ||
        not(col("h_punct") <=> col("n_punct")))
    assert(bad.count() == 0,
      "native kernels must match regex/HOF on fuzzed strings; first: " +
        bad.take(1).mkString)
  }

  test("sorted_pairs edge recipe == distinct-(o,p) self-join on o") {
    val li = graft.operators.Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val viaJoin = {
      val d = li.distinct()
      d.as("x").join(d.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
        .distinct()
    }
    val viaPairs = li.groupBy("o").agg(collect_set(col("p")).as("ps"))
      .select(explode(PairExprs.sortedPairsCol(col("ps"))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
    assert(viaPairs.exceptAll(viaJoin).count() == 0 &&
      viaJoin.exceptAll(viaPairs).count() == 0,
      "canonical edge set must be unchanged by the sorted_pairs recipe")
    // expression-level edges: dups, unsorted input, nulls, empty
    val sp = spark
    import sp.implicits._
    val arrs = Seq(
      (Seq(3L, 1L, 2L), 1), (Seq(5L, 5L, 5L), 2), (Seq.empty[Long], 3),
      (Seq(7L), 4), (Seq(2L, 1L, 2L, 1L), 5)).toDF("ps", "id")
    val got = arrs.select(col("id"),
      PairExprs.sortedPairsCol(col("ps")).as("pr")).collect()
      .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
        .map(x => (x.getLong(0), x.getLong(1))))
      .toMap
    assert(got(1) == Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(got(2) == Seq.empty)
    assert(got(3) == Seq.empty)
    assert(got(4) == Seq.empty)
    assert(got(5) == Seq((1L, 2L)))
  }

  test("stop_count / tok_chars_sum / ascii_set_count == HOF formulations") {
    val stops = Seq("the", "a", "and", "of", "is")
    val inL = stops.map(s => s"'$s'").mkString("(", ", ", ")")
    for (df <- Seq(docs.select("doc_id", "text"), textEdgeCases)) {
      val base = df
        .withColumn("tk", expr("regexp_extract_all(text, '\\\\S+', 0)"))
      val cmp = base.select(
        size(expr(s"filter(tk, t -> t IN $inL)")).as("h_stop"),
        TextStats.stopCountCol(col("tk"), stops).as("n_stop"),
        expr("aggregate(tk, 0L, (acc, t) -> acc + length(t))").as("h_chars"),
        TextStats.tokCharsCol(col("tk")).as("n_chars"),
        size(expr("regexp_extract_all(text, '[.,;:!?]', 0)")).as("h_punct"),
        TextStats.asciiSetCountCol(col("text"), ".,;:!?").as("n_punct"))
      assert(cmp.filter(
        not(col("h_stop") <=> col("n_stop")) ||
          not(col("h_chars") <=> col("n_chars")) ||
          not(col("h_punct") <=> col("n_punct"))).count() == 0,
        "stat primitives must equal the HOF formulations on every row")
    }
    // null-element semantics (tokens arrays never carry nulls in the
    // engine, but the contract is pinned anyway)
    val sp = spark
    import sp.implicits._
    val withNulls = Seq(
      (Seq[String]("a", null, "the"), 1),
      (Seq[String](null), 2),
      (Seq[String](), 3)).toDF("tk", "id")
    val got = withNulls.select(col("id"),
      TextStats.stopCountCol(col("tk"), stops).as("ns"),
      TextStats.tokCharsCol(col("tk")).as("tc"),
      size(expr(s"filter(tk, t -> t IN $inL)")).as("hs"),
      expr("aggregate(tk, 0L, (acc, t) -> acc + length(t))").as("hc"))
    assert(got.filter(not(col("ns") <=> col("hs")) ||
      not(col("tc") <=> col("hc"))).count() == 0,
      "null-element semantics must match the HOFs")
  }

  test("bpe_apply_merges / bpe_seq_pairs == aggregate-replace / split+slice " +
      "HOF chains (real corpus + seeded fuzz)") {
    val sp = spark
    import sp.implicits._
    // HOF reference bodies — EXACTLY the r18 formulations being replaced
    val hofPairs = expr(
      """IF(size(slice(split(ms, chr(1)), 2,
        |          greatest(size(split(ms, chr(1))) - 2, 0))) >= 2,
        |  transform(sequence(1, size(slice(split(ms, chr(1)), 2,
        |      greatest(size(split(ms, chr(1))) - 2, 0))) - 1),
        |    i -> concat(
        |      element_at(slice(split(ms, chr(1)), 2,
        |        greatest(size(split(ms, chr(1))) - 2, 0)), i),
        |      chr(1),
        |      element_at(slice(split(ms, chr(1)), 2,
        |        greatest(size(split(ms, chr(1))) - 2, 0)), i + 1))),
        |  CAST(array() AS ARRAY<STRING>))""".stripMargin)
    val hofApply = expr(
      """aggregate(em, ms, (acc, mm) -> replace(acc,
        |  concat(chr(1), mm, chr(1)),
        |  concat(chr(1), replace(mm, chr(1), ''), chr(1))))""".stripMargin)
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val cmp = df.select(
        hofPairs.as("h_pairs"),
        TextStats.bpeSeqPairsCol(col("ms")).as("n_pairs"),
        hofApply.as("h_app"),
        TextStats.bpeApplyMergesCol(col("ms"), col("em")).as("n_app"),
        (size(split(col("ms"), "\u0001")) - 2).as("h_cnt"),
        (TextStats.asciiSetCountCol(col("ms"), "\u0001") - 1).as("n_cnt"))
      val bad = cmp.filter(
        not(col("h_pairs") <=> col("n_pairs")) ||
          not(col("h_app") <=> col("n_app")) ||
          not(col("h_cnt") <=> col("n_cnt")))
      assert(bad.count() == 0,
        "bpe kernels must match the HOF chains; first: " + bad.take(1).mkString)
    }
    // 1. real corpus: d28's augmented pre-token sequences under its own
    //    top-8 merge table (the production input shape)
    val tok = docs.select(col("doc_id"),
        concat(col("text"), lit(" It's v"),
          (col("doc_id") % 10).cast("string"), lit(".2, don't-stop #"),
          col("doc_id").cast("string"), lit(" (you'll see 42%)!")).as("t"))
      .select(col("doc_id"), TextStats.bpePreTokensCol(col("t")).as("bt"))
      .select(col("doc_id"),
        expr("concat(chr(1), concat_ws(chr(1), bt), chr(1))").as("ms"))
    val top8 = tok
      .select(explode(TextStats.bpeSeqPairsCol(col("ms"))).as("m"))
      .groupBy("m").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("m")).limit(8)
      .agg(expr(
        "transform(sort_array(collect_list(struct(-cnt AS nc, m AS m))), p -> p.m)")
        .as("em"))
    check(tok.crossJoin(broadcast(top8)))
    // 2. seeded fuzz: adversarial ms strings (stray/adjacent 0x01 bytes,
    //    empty tokens, multi-byte chars, no boundaries at all) under
    //    adversarial merge lists (overlapping pairs, self-merges, tokens
    //    containing 0x01, empty strings)
    val alphabet = Array("\u0001", "\u0001\u0001", "a", "b", "ab", " ", "é",
      "世", "'", "")
    val rnd = new scala.util.Random(191919L)
    def rndStr(maxLen: Int): String =
      (1 to rnd.nextInt(maxLen + 1))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val fuzz = (1 to 400).map { _ =>
      val ms = rndStr(24)
      val em = (1 to rnd.nextInt(6)).map(_ =>
        s"${rndStr(3)}\u0001${rndStr(3)}")
      (ms, em)
    }.toDF("ms", "em")
    check(fuzz)
    // 3. null semantics: a null merge element nulls the output, exactly
    //    like the HOF chain; a null ms stays null
    val nulls = Seq(
      ("\u0001a\u0001b\u0001", Seq[String]("a\u0001b", null)),
      (null.asInstanceOf[String], Seq[String]("a\u0001b"))).toDF("ms", "em")
    val nl = nulls.select(
      hofApply.as("h_app"),
      TextStats.bpeApplyMergesCol(col("ms"), col("em")).as("n_app"))
    assert(nl.filter(not(col("h_app") <=> col("n_app"))).count() == 0,
      "null semantics must match the HOF chain")
    assert(nl.filter(col("n_app").isNotNull).count() == 0)
  }
}
