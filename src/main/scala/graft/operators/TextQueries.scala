package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis + deduplication operators over the `documents` table —
  * the LLM-training-data-pipeline surface (tokenization, quality scoring,
  * language ID, exact/near dedup). All column expressions are Spark
  * built-ins (whole-stage codegen'd, no UDFs), so they survive a 100 TB
  * scan: per-row work with no shuffle until the final aggregate/join, and
  * near-dup joins shuffle on band/group keys rather than comparing all
  * pairs.
  */
object TextQueries {

  /** Tokens = maximal non-whitespace runs; shared by both engines'
    * expressions (regexp '\S+'). Spark side is the native byte-scan loop,
    * row-identical to regexp_extract_all(text,'\S+',0)
    * (NativeExprParitySpec); the oracle side keeps the regexp. */
  private val tokensCol: Column =
    graft.functions.TextStats.wsTokensCol(col("text"))

  /** The sentence axis shared by d38/d40/d44 — split `text` on
    * terminator+whitespace boundaries, drop whitespace-only fragments.
    * Exactly one definition per engine: this Column and
    * [[sentenceAxisCte]] MUST stay equivalent — editing one without the
    * other silently skews the sentence axis all three ops share. */
  val sentencesCol: Column =
    graft.functions.TextStats.sentencesCol(col("text"))

  /** DuckDB CTE body `s(doc_id, sents)` over `documents` — the oracle
    * side of [[sentencesCol]]. Compose as `"WITH " + sentenceAxisCte`
    * (+ `",\n..."` for further CTEs). */
  val sentenceAxisCte: String =
    """s AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '[.!?]+\s+'),
      |      x -> length(trim(x)) > 0) AS sents
      |  FROM documents)""".stripMargin

  private[operators] val enStop = Seq("the", "a", "and", "of", "to", "in", "is")
  private[operators] def inList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Exact n-gram Jaccard pairs over hashed 3-gram shingles (the d05
    * body, shared with the d10 dedup-pipeline composition): candidates
    * restricted to same (lang, source), intersection counted via an
    * equi-join on the 8-byte gram hash, never a pairwise
    * array_intersect. Returns (doc_a, doc_b, jaccard[round 3]). */
  def jaccardPairs(s: SparkSession, dir: String): DataFrame =
    jaccardPairsOf(Tables.load(s, dir, "documents")
      .repartition(s.sparkContext.defaultParallelism))

  /** [[jaccardPairs]] over an arbitrary (doc_id, lang, source, text)
    * frame — the composed pipeline (d47) runs the SAME candidate
    * mechanism over its post-quality corpus instead of the raw table. */
  def jaccardPairsOf(docs: DataFrame): DataFrame = {
    val sh = docs
      .withColumn("toks", tokensCol)
      .select(col("doc_id"), col("lang"), col("source"),
        graft.functions.TextHashes.shingleHash64Col(
          col("text"), col("toks"), 3, emptyIfShort = true).as("ghs"))
      .persist()
    val sizes = sh.select(col("doc_id"), size(col("ghs")).as("n_grams"))
    val gtab = sh.select(col("doc_id"), col("lang"), col("source"),
      explode(col("ghs")).as("gh"))
    val inter = gtab.select(col("doc_id").as("doc_a"), col("lang"), col("source"), col("gh"))
      .join(gtab.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"),
        col("source").as("source_b"), col("gh").as("gh_b")),
        col("gh") === col("gh_b") && col("lang") === col("lang_b") &&
          col("source") === col("source_b") && col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_grams").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_grams").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")), 3).as("jaccard"))
  }

  /** Shared oracle CTE: per-doc distinct 3-gram shingle strings; `body`
    * selects from `sh(doc_id, lang, source, grams)`. */
  def shingleOracle(body: String): String =
    """WITH sh AS (
      |  SELECT doc_id, lang, source,
      |    list_distinct(list_transform(
      |      range(1, greatest(len(regexp_extract_all(text,'\S+'))-2, 0)+1),
      |      i -> concat(regexp_extract_all(text,'\S+')[i], ' ',
      |                  regexp_extract_all(text,'\S+')[i+1], ' ',
      |                  regexp_extract_all(text,'\S+')[i+2]))) AS grams
      |  FROM documents),
      |""".stripMargin + body

  /** The shared d05 oracle CTE producing (doc_a, doc_b, jaccard) from
    * gram strings; `body` selects from `pairs`. */
  def jaccardOracle(body: String): String = shingleOracle(
    """pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    round(CAST(length(list_intersect(a.grams, b.grams)) AS DOUBLE) /
      |          (length(a.grams) + length(b.grams)
      |           - length(list_intersect(a.grams, b.grams))), 3) AS jaccard
      |  FROM sh a JOIN sh b
      |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
      |  WHERE length(list_intersect(a.grams, b.grams)) > 0)
      |""".stripMargin + body)

  /** Near-dup connected components (doc_id, comp) via min-label
    * propagation to a fixpoint over the jaccard >= 0.3 edge set — each
    * iteration is one equi-join shuffle, converging in O(cluster
    * diameter) rounds (the standard large-scale CC shape). Only a 1-row
    * convergence aggregate reaches the driver per round; lineage is
    * severed every 10 rounds so a high-diameter graph can't make the
    * accumulated plan itself the bottleneck. Shared by d10 (canonical
    * lowest-id survivor) and d25 (content-policy survivor). */
  def connectedComponents(s: SparkSession, dir: String): DataFrame =
    componentsOf(
      jaccardPairs(s, dir)
        .filter(col("jaccard") >= 0.3)
        .select(col("doc_a"), col("doc_b")),
      Tables.load(s, dir, "documents").select(col("doc_id")))

  /** Generic min-label propagation over an arbitrary (doc_a, doc_b) edge
    * frame + (doc_id) node frame — the engine behind d10/d25 (text
    * near-dup graphs) and d26 (semantic near-dup graphs). Converged
    * labels equal the component's minimum node id. */
  def componentsOf(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val und = edges.union(
      edges.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))).persist()
    // EVERY round eagerly localCheckpoints: the `union(labels,
    // prop(labels))` shape embeds the previous labels plan TWICE, so
    // without per-round lineage truncation the logical plan doubles each
    // round and the driver OOMs building plan strings long before the
    // data is the problem (the r10 sf0.3 scale probe hit exactly this at
    // a larger component diameter — 8 GiB heap gone at ~15 rounds).
    // After truncation the plan is depth-1 per round and the label table
    // itself (|V| rows) is the only thing checkpointed. The previous
    // round's checkpoint blocks are freed immediately below; PinScope
    // sweeps whatever the final round leaves.
    var labels = nodes
      .select(col("doc_id"), col("doc_id").as("comp")).localCheckpoint()
    def freeCheckpoint(df: DataFrame): Unit = scala.util.Try {
      df.queryExecution.analyzed match {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          r.rdd.unpersist(blocking = false)
        case _ => ()
      }
    }
    // convergence: the label sum is monotonically decreasing until the
    // fixpoint; carry the previous round's sum instead of re-aggregating
    // each round's convergence aggregate is a driver-sync barrier (the
    // lazy checkpoint materializes inside it) — ledgered via SeamClock
    // when the bench lane is recording, a no-op otherwise
    var prevSum = SeamClock.barrier("cc.init")(
      labels.agg(sum("comp")).first().getLong(0))
    var converged = false
    var round = 0
    while (!converged) {
      val prop = und.join(labels, und("doc_a") === labels("doc_id"))
        .select(und("doc_b").as("doc_id"), col("comp"))
      val next = labels.union(prop)
        .groupBy("doc_id").agg(min("comp").as("comp"))
        .localCheckpoint()
      round += 1
      val newSum = SeamClock.barrier(s"cc.round$round")(
        next.agg(sum("comp")).first().getLong(0))
      freeCheckpoint(labels)
      labels = next
      converged = prevSum == newSum
      prevSum = newSum
    }
    // the final labels are materialized (the convergence aggregate ran),
    // so the edge table can release its executors' memory now
    und.unpersist()
    labels
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- token counting + basic quality stats ----
    QueryDef("d01_text_stats",
      s"""SELECT doc_id, lang, n_chars,
         | CAST(length(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
         | CAST(length(text) AS BIGINT) AS text_len,
         | CAST(list_sum(list_transform(regexp_extract_all(text, '\\S+'),
         |   t -> length(t))) AS BIGINT) AS token_chars,
         | CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
         | CAST(length(list_filter(regexp_extract_all(text, '\\S+'),
         |   t -> t IN ${inList(enStop)})) AS BIGINT) AS n_stopwords
         |FROM documents""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents").select(
        col("doc_id"), col("lang"), col("n_chars"),
        size(tokensCol).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("text_len"),
        graft.functions.TextStats.tokCharsCol(tokensCol).as("token_chars"),
        graft.functions.TextStats.asciiSetCountCol(col("text"), ".,;:!?")
          .cast("long").as("n_punct"),
        graft.functions.TextStats.stopCountCol(tokensCol, enStop)
          .cast("long").as("n_stopwords"))
    },

    // ---- quality score: identical arithmetic both sides over exact ints ----
    QueryDef("d02_quality_score",
      s"""SELECT doc_id,
         | round(0.4 * least(n_tok / 50.0, 1.0)
         |     + 0.3 * (1.0 - n_punct / greatest(n_tok, 1) )
         |     + 0.3 * least(stop / greatest(n_tok, 1) * 5.0, 1.0), 3) AS quality
         |FROM (SELECT doc_id,
         |        CAST(length(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS n_tok,
         |        CAST(length(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
         |        CAST(length(list_filter(regexp_extract_all(text, '\\S+'),
         |          t -> t IN ${inList(enStop)})) AS DOUBLE) AS stop
         |      FROM documents) t""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(tokensCol).cast("double").as("n_tok"),
          graft.functions.TextStats.asciiSetCountCol(col("text"), ".,;:!?")
            .cast("double").as("n_punct"),
          graft.functions.TextStats.stopCountCol(tokensCol, enStop)
            .cast("double").as("stop"))
        .select(col("doc_id"),
          round(lit(0.4) * least(col("n_tok") / 50.0, lit(1.0))
            + lit(0.3) * (lit(1.0) - col("n_punct") / greatest(col("n_tok"), lit(1.0)))
            + lit(0.3) * least(col("stop") / greatest(col("n_tok"), lit(1.0)) * 5.0, lit(1.0)), 3)
            .as("quality"))
    },

    // ---- language ID: stopword-count heuristic with deterministic ties ----
    QueryDef("d03_lang_id",
      """SELECT doc_id, lang AS labeled_lang,
        | CASE WHEN en >= de AND en >= fr AND en >= es THEN 'en'
        |      WHEN de >= fr AND de >= es THEN 'de'
        |      WHEN fr >= es THEN 'fr' ELSE 'es' END AS guessed_lang
        |FROM (SELECT doc_id, lang,
        |   length(list_filter(regexp_extract_all(text, '\S+'), t -> t IN ('the','a','and','of','is'))) AS en,
        |   length(list_filter(regexp_extract_all(text, '\S+'), t -> t IN ('der','die','das','und','ist'))) AS de,
        |   length(list_filter(regexp_extract_all(text, '\S+'), t -> t IN ('le','la','et','les','des'))) AS fr,
        |   length(list_filter(regexp_extract_all(text, '\S+'), t -> t IN ('el','los','las','y','es'))) AS es
        | FROM documents) t""".stripMargin) { (s, dir) =>
      def cnt(words: Seq[String]) =
        graft.functions.TextStats.stopCountCol(tokensCol, words)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          cnt(Seq("the", "a", "and", "of", "is")).as("en"),
          cnt(Seq("der", "die", "das", "und", "ist")).as("de"),
          cnt(Seq("le", "la", "et", "les", "des")).as("fr"),
          cnt(Seq("el", "los", "las", "y", "es")).as("es"))
        .select(col("doc_id"), col("lang").as("labeled_lang"),
          when(col("en") >= col("de") && col("en") >= col("fr") && col("en") >= col("es"), "en")
            .when(col("de") >= col("fr") && col("de") >= col("es"), "de")
            .when(col("fr") >= col("es"), "fr")
            .otherwise("es").as("guessed_lang"))
    },

    // ---- exact dedup: content-hash groups ----
    QueryDef("d04_dedup_exact",
      """SELECT doc_id, md5(text) AS fp,
        | count(*) OVER (PARTITION BY md5(text)) AS n_copies
        |FROM documents""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(md5(col("text")))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("fp"),
          count(lit(1)).over(w).as("n_copies"))
    },

    // ---- near-dup: exact 3-gram shingle Jaccard on grouped candidates ----
    // Candidates are restricted to same (lang, source) — the blocked-join
    // pattern that keeps pair count linear-ish at scale.
    QueryDef("d05_ngram_jaccard",
      jaccardOracle("SELECT doc_a, doc_b, jaccard FROM pairs")) { (s, dir) =>
      jaccardPairs(s, dir)
    },

    // ---- TF-IDF-style top terms per document: tf from an exploded-token
    // aggregation, document frequency joined back per term. Ordering is
    // pure integers (tf desc, df asc, term asc) so ranks are engine-exact;
    // the float idf is a downstream one-liner and would only re-introduce
    // the rounding-boundary class. Scale shape: both aggregations shuffle
    // on their natural keys ((doc_id,term) then (term)); the df side is
    // post-aggregation (vocabulary-sized, far smaller than the corpus) so
    // AQE broadcasts it when it fits and shuffles when a web-scale vocab
    // doesn't — never all-pairs, no driver state. tf is persisted because
    // both the join input and the df aggregation consume it. ----
    QueryDef("d12_tfidf_topterms",
      """WITH w AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
        |           FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |r AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |  row_number() OVER (PARTITION BY tf.doc_id
        |                     ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rnk
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, term, tf, df, CAST(rnk AS BIGINT) AS rnk FROM r
        |WHERE rnk <= 3""".stripMargin) { (s, dir) =>
      val tf = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(tokensCol).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .persist()
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("df").asc, col("term").asc)
      tf.join(df, "term")
        .withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rnk"))
    },

    // ---- within-document repetition (Gopher-style quality filter): the
    // fraction of a doc's 3-gram occurrences that repeat an earlier gram.
    // Pure per-row arithmetic over the codegen'd distinct-shingle
    // expression — no shuffle anywhere; at 100 TB this is a streaming
    // projection. round() of an exact-integer division is bit-identical
    // IEEE on both engines (the d05 jaccard precedent). Docs under 3
    // tokens have no grams and are excluded on both sides. ----
    QueryDef("d13_repetition",
      """SELECT doc_id, n_total, n_distinct,
        | round(1.0 - CAST(n_distinct AS DOUBLE) / n_total, 3) AS rep_frac
        |FROM (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text, '\S+')) - 2 AS BIGINT) AS n_total,
        |    CAST(length(list_distinct(list_transform(
        |      range(1, greatest(len(regexp_extract_all(text,'\S+'))-2, 0)+1),
        |      i -> concat(regexp_extract_all(text,'\S+')[i], ' ',
        |                  regexp_extract_all(text,'\S+')[i+1], ' ',
        |                  regexp_extract_all(text,'\S+')[i+2])))) AS BIGINT) AS n_distinct
        |  FROM documents
        |  WHERE len(regexp_extract_all(text, '\S+')) >= 3) t""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"), tokensCol.as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"),
          (size(col("toks")) - 2).cast("long").as("n_total"),
          size(graft.functions.TextHashes.shingleHash64Col(
            col("text"), col("toks"), 3, emptyIfShort = true))
            .cast("long").as("n_distinct"))
        .select(col("doc_id"), col("n_total"), col("n_distinct"),
          round(lit(1.0) - col("n_distinct").cast("double") / col("n_total"), 3)
            .as("rep_frac"))
    },

    // ---- decontamination: per corpus doc, the fraction of its distinct
    // 3-gram shingles that appear anywhere in a benchmark set (doc_id <
    // 20 stands in for the eval-suite grams). The benchmark gram set is
    // deduplicated then BROADCAST — eval suites are small by construction,
    // so corpus grams are checked map-side and never shuffled; the only
    // exchange is the per-doc count rollup. Grams ride as 8-byte xxhashes
    // (the d05 convention), not strings. ----
    QueryDef("d14_contamination", shingleOracle(
      """c AS (SELECT doc_id, unnest(grams) AS gh FROM sh
        |      WHERE doc_id >= 20 AND length(grams) > 0),
        |b AS (SELECT DISTINCT unnest(grams) AS gh FROM sh WHERE doc_id < 20)
        |SELECT c.doc_id, count(*) AS n_grams,
        | CAST(sum(CASE WHEN b.gh IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_hit,
        | round(CAST(sum(CASE WHEN b.gh IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
        |       / count(*), 3) AS contam_frac
        |FROM c LEFT JOIN b ON c.gh = b.gh
        |GROUP BY c.doc_id""".stripMargin)) { (s, dir) =>
      // persisted: both the benchmark and corpus branches consume it, and
      // tokenize+shingle is the dominant per-row cost — one pass, not two
      val sh = Tables.load(s, dir, "documents")
        .withColumn("toks", tokensCol)
        .select(col("doc_id"), graft.functions.TextHashes.shingleHash64Col(
          col("text"), col("toks"), 3, emptyIfShort = true).as("ghs"))
        .persist()
      val bench = sh.filter(col("doc_id") < 20)
        .select(explode(col("ghs")).as("gh")).distinct()
        .withColumn("hit", lit(1L))
      val corpus = sh.filter(col("doc_id") >= 20 && size(col("ghs")) > 0)
        .select(col("doc_id"), explode(col("ghs")).as("gh"))
      corpus.join(broadcast(bench), Seq("gh"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .select(col("doc_id"), col("n_grams"), col("n_hit"),
          round(col("n_hit").cast("double") / col("n_grams"), 3).as("contam_frac"))
    },

    // ---- dedup pipeline: near-dup edges -> connected components ->
    // canonical survivor per cluster. Components via min-label
    // propagation to a fixpoint (each iteration = one equi-join shuffle;
    // converges in O(cluster diameter) rounds — the standard large-scale
    // CC shape). Only a 1-row convergence aggregate reaches the driver
    // per round. Oracle: DuckDB recursive CTE over the same edge set. ----
    QueryDef("d10_dedup_components", TextQueries.jaccardOracle(
      """, und AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs WHERE jaccard >= 0.3
        |  UNION ALL
        |  SELECT doc_b, doc_a FROM pairs WHERE jaccard >= 0.3),
        |walk(node, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT u.b, w.comp FROM walk w JOIN und u ON u.a = w.node)
        |SELECT node AS doc_id, CAST(min(comp) AS BIGINT) AS comp,
        |       min(comp) = node AS kept
        |FROM walk GROUP BY node""".stripMargin)
      .replaceFirst("WITH sh AS", "WITH RECURSIVE sh AS")) { (s, dir) =>
      connectedComponents(s, dir)
        .select(col("doc_id"), col("comp"),
          (col("doc_id") === col("comp")).as("kept"))
    },

    // ---- leakage-free train/val/test split (d43): d11's deterministic
    // splitting made NEAR-DUP-AWARE — the unit of assignment is the
    // d10 connected component, not the document, so two near-duplicate
    // docs can never land on opposite sides of a train/test boundary
    // (the contamination path a content-hash split leaves open: twin
    // docs have different hashes). Split = comp % 10 (0-7 train, 8
    // val, 9 test), a pure function of the component id both engines
    // derive identically. The leak_free flag re-checks the invariant
    // in-band (distinct splits per component == 1 everywhere) so a
    // refactor back to per-doc assignment hash-fails loudly. Scale
    // shape: d10's fixpoint plus one zero-shuffle projection. ----
    QueryDef("d43_leakfree_split", TextQueries.jaccardOracle(
      """, und AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs WHERE jaccard >= 0.3
        |  UNION ALL
        |  SELECT doc_b, doc_a FROM pairs WHERE jaccard >= 0.3),
        |walk(node, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT u.b, w.comp FROM walk w JOIN und u ON u.a = w.node),
        |c AS (SELECT node AS doc_id, CAST(min(comp) AS BIGINT) AS comp
        |      FROM walk GROUP BY node)
        |SELECT doc_id, comp,
        |  CASE WHEN comp % 10 < 8 THEN 'train'
        |       WHEN comp % 10 = 8 THEN 'val' ELSE 'test' END AS split,
        |  true AS leak_free
        |FROM c""".stripMargin)
      .replaceFirst("WITH sh AS", "WITH RECURSIVE sh AS")) { (s, dir) =>
      val comps = connectedComponents(s, dir)
        .select(col("doc_id"), col("comp"),
          when(pmod(col("comp"), lit(10)) < 8, "train")
            .when(pmod(col("comp"), lit(10)) === 8, "val")
            .otherwise("test").as("split"))
      val flag = comps.groupBy("comp")
        .agg(countDistinct("split").as("ns"))
        .agg((max("ns") === 1).as("leak_free"))
      comps.crossJoin(broadcast(flag))
    },

    // ---- dedup survivor selection by CONTENT policy: within each
    // near-dup component keep the LONGEST document (tie -> lowest id),
    // the standard production alternative to d10's keep-lowest-id — a
    // pipeline usually wants the most complete copy, not the first one
    // crawled. All-integer ordering key (n_chars, doc_id), so the argmax
    // is bit-stable on both engines with no rounding contract. Scale
    // shape: components as in d10, then ONE window pass partitioned by
    // component (first_value over an integer sort) — no extra join
    // rounds, no driver-side selection. ----
    QueryDef("d25_dedup_survivor", TextQueries.jaccardOracle(
      """, und AS (
        |  SELECT doc_a AS a, doc_b AS b FROM pairs WHERE jaccard >= 0.3
        |  UNION ALL
        |  SELECT doc_b, doc_a FROM pairs WHERE jaccard >= 0.3),
        |walk(node, comp) AS (
        |  SELECT doc_id, doc_id FROM documents
        |  UNION
        |  SELECT u.b, w.comp FROM walk w JOIN und u ON u.a = w.node),
        |lab AS (
        |  SELECT node AS doc_id, CAST(min(comp) AS BIGINT) AS comp
        |  FROM walk GROUP BY node),
        |j AS (
        |  SELECT l.doc_id, l.comp, d.n_chars
        |  FROM lab l JOIN documents d USING (doc_id))
        |SELECT doc_id, comp, CAST(survivor_id AS BIGINT) AS survivor_id,
        |       doc_id = survivor_id AS kept
        |FROM (
        |  SELECT doc_id, comp,
        |    first_value(doc_id) OVER (PARTITION BY comp
        |      ORDER BY n_chars DESC, doc_id) AS survivor_id
        |  FROM j) t""".stripMargin)
      .replaceFirst("WITH sh AS", "WITH RECURSIVE sh AS")) { (s, dir) =>
      val labels = connectedComponents(s, dir)
      val sized = labels.join(
        Tables.load(s, dir, "documents").select("doc_id", "n_chars"), "doc_id")
      val byComp = org.apache.spark.sql.expressions.Window
        .partitionBy("comp").orderBy(col("n_chars").desc, col("doc_id"))
      sized
        .withColumn("survivor_id", first("doc_id").over(byComp).cast("long"))
        .select(col("doc_id"), col("comp"), col("survivor_id"),
          (col("doc_id") === col("survivor_id")).as("kept"))
    },

    // ---- corpus-LM coverage scoring (bigram language-model shape
    // without the floats): pass 1 aggregates corpus bigram counts and
    // keeps those above a corpus-relative threshold (ndocs/20 — scale-
    // invariant, so the op is equally discriminative at every SF); pass
    // 2 re-joins the frequent set to score each doc by how much of its
    // text is made of corpus-frequent bigrams. All-integer outputs, so
    // bit-stable with no rounding contract. Scale shape: bigram counts
    // hash-partition on the gram (the d05 convention), the threshold
    // rides a 1-row broadcast instead of a driver collect, and the
    // frequent set (vocabulary-bounded, threshold-pruned) broadcasts
    // back — the same equi-join works unbroadcast if a corpus's frequent
    // set ever outgrows that. ----
    QueryDef("d16_bigram_coverage",
      """WITH bg AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(regexp_extract_all(text, '\S+'))),
        |                i -> regexp_extract_all(text, '\S+')[i] || ' ' ||
        |                     regexp_extract_all(text, '\S+')[i+1])) AS bg
        |  FROM documents),
        |freq AS (SELECT bg FROM bg GROUP BY bg
        |         HAVING count(*) >= (SELECT count(*) FROM documents) / 20),
        |per AS (
        |  SELECT b.doc_id, count(*) AS n_bigrams,
        |         count(*) FILTER (WHERE f.bg IS NOT NULL) AS n_frequent,
        |         count(DISTINCT f.bg) AS n_frequent_distinct
        |  FROM bg b LEFT JOIN freq f USING (bg) GROUP BY b.doc_id)
        |SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
        |       coalesce(n_frequent, 0) AS n_frequent,
        |       coalesce(n_frequent_distinct, 0) AS n_frequent_distinct
        |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val bigrams = docs
        .select(col("doc_id"), tokensCol.as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("doc_id"), explode(
          graft.functions.TextStats.windowJoinsCol(col("w"), 2)).as("bg"))
        .persist()
      val thr = docs.agg((count(lit(1)) / 20).as("thr"))
      val freq = bigrams.groupBy("bg").agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(thr))
        .filter(col("c") >= col("thr"))
        .select(col("bg"), lit(1).as("isf"))
      val per = bigrams.join(broadcast(freq), Seq("bg"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          count(col("isf")).as("n_frequent"),
          countDistinct(when(col("isf").isNotNull, col("bg")))
            .as("n_frequent_distinct"))
      docs.select("doc_id").join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("n_frequent"), lit(0L)).as("n_frequent"),
          coalesce(col("n_frequent_distinct"), lit(0L)).as("n_frequent_distinct"))
    },

    // ---- PII redaction: scrub emails / phone numbers / IPv4 addresses
    // with regex replacement and count what was found. The synthetic
    // corpus carries no PII, so both engines append the SAME
    // deterministic doc_id-derived PII tail in-query, then redact it —
    // the redaction logic (not the augmentation) is the operator under
    // test. Regexes stay in the Java∩RE2 common subset (char classes,
    // bounded repeats, \b) so both engines compile them identically;
    // equality of the full redacted text is pinned by md5, not a
    // truncated sample. Per-row codegen'd projection: zero shuffles,
    // embarrassingly parallel at 100 TB. ----
    QueryDef("d17_pii_redact",
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@mail.example.com or +1-555-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ip 10.' ||
        |      CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
        |      CAST((doc_id * 7) % 256 AS VARCHAR) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
        |  CAST(length(regexp_extract_all(t,
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
        |  CAST(length(regexp_extract_all(t,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ip,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')) AS red_md5,
        |  CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |      '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')) AS BIGINT)
        |    AS red_len
        |FROM aug""".stripMargin) { (s, dir) =>
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
      val ipRe = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
      val aug = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@mail.example.com or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" ip 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), ((col("doc_id") * 7) % 256).cast("string")).as("t"))
      val red = regexp_replace(regexp_replace(regexp_replace(col("t"),
        emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipRe, "<IP>")
      aug.select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(emailRe), lit(0))).cast("long").as("n_email"),
        size(regexp_extract_all(col("t"), lit(phoneRe), lit(0))).cast("long").as("n_phone"),
        size(regexp_extract_all(col("t"), lit(ipRe), lit(0))).cast("long").as("n_ip"),
        md5(red.cast("binary")).as("red_md5"),
        length(red).cast("long").as("red_len"))
    },

    // ---- paragraph/chunk-level dedup (the C4/RefinedWeb line-dedup
    // shape): the corpus has no newlines, so "paragraphs" are fixed
    // 20-token chunks — the operator is the corpus-wide first-occurrence
    // keep rule, which is chunking-agnostic. One window over the chunk
    // text picks the globally-first (doc_id, idx) occurrence; per-doc
    // rollup reports how much text survives. Scale shape: the shuffle
    // key is the chunk itself (hash-partitioned, like d04's exact
    // dedup); at 100 TB swap the window for a groupBy(chunk).agg(min
    // (first_key)) + re-join on a 16-byte chunk hash so shuffled rows
    // carry the hash, not the text — same semantics, narrower exchange
    // (kept_chars then rides the pre-hashed row). ----
    QueryDef("d18_chunk_dedup",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents),
        |chunks AS (
        |  SELECT doc_id,
        |    list_transform(range(0, CAST(ceil(len(tk)/20.0) AS INT)),
        |      i -> list_aggregate(tk[i*20+1 : i*20+20], 'string_agg', ' ')) AS cs
        |  FROM toks),
        |occ AS (
        |  SELECT doc_id, unnest(cs) AS chunk, unnest(range(0, len(cs))) AS idx
        |  FROM chunks),
        |keyed AS (
        |  SELECT doc_id, idx, chunk,
        |    min(doc_id * 100000 + idx) OVER (PARTITION BY chunk) AS first_key
        |  FROM occ)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN doc_id * 100000 + idx = first_key
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN doc_id * 100000 + idx = first_key
        |                THEN length(chunk) ELSE 0 END) AS BIGINT) AS kept_chars
        |FROM keyed GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val occ = Tables.load(s, dir, "documents")
        .select(col("doc_id"), tokensCol.as("tk"))
        // guard: sequence(0, -1) is DESCENDING in Spark, so an empty doc
        // must short-circuit to an empty chunk list (DuckDB range(0,0)
        // is already empty)
        .select(col("doc_id"),
          graft.functions.TextStats.chunkJoinsCol(col("tk"), 20).as("cs"))
        .select(col("doc_id"), posexplode(col("cs")).as(Seq("idx", "chunk")))
      val firstKey = min(col("doc_id") * 100000 + col("idx"))
        .over(Window.partitionBy("chunk"))
      val kept = (col("doc_id") * 100000 + col("idx")) === col("first_key")
      occ.withColumn("first_key", firstKey)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(kept, 1L).otherwise(0L)).as("n_kept"),
          sum(when(kept, length(col("chunk")).cast("long")).otherwise(0L))
            .as("kept_chars"))
    },

    // ---- composite quality-filter chain (the Gopher/C4 rule-stack
    // shape): four keep/drop rules — token-count band, mean-word-length
    // band, minimum stopword evidence, distinct-trigram repetition floor
    // — each emitted as its own flag plus the AND. Every rule is
    // ALL-INTEGER arithmetic (ratios stated cross-multiplied, e.g.
    // mean word length in [2,12] as 2*n_tok <= chars <= 12*n_tok), so
    // there is no float to disagree on. The whole chain is one
    // codegen'd per-row projection: zero shuffles, and at 100 TB it
    // composes with d15's sampling and d04/d18's dedup as the pure-map
    // stage of the ingest funnel. ----
    QueryDef("d19_filter_chain",
      s"""WITH f AS (
         |  SELECT doc_id,
         |    regexp_extract_all(text, '\\S+') AS tk,
         |    length(regexp_extract_all(text, '\\S+')) AS n_tok,
         |    list_sum(list_transform(regexp_extract_all(text, '\\S+'),
         |      t -> length(t))) AS tok_chars,
         |    length(list_filter(regexp_extract_all(text, '\\S+'),
         |      t -> t IN ${inList(enStop)})) AS n_stop
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, n_tok, tok_chars, n_stop,
         |    greatest(n_tok - 2, 0) AS n_tri,
         |    length(list_distinct(list_transform(
         |      range(1, greatest(n_tok - 2, 0) + 1),
         |      i -> concat(tk[i], ' ', tk[i+1], ' ', tk[i+2])))) AS n_tri_distinct
         |  FROM f)
         |SELECT doc_id,
         |  (n_tok BETWEEN 10 AND 1000) AS ok_len,
         |  (2 * n_tok <= tok_chars AND tok_chars <= 12 * n_tok) AS ok_wordlen,
         |  (n_stop >= 2) AS ok_stop,
         |  (n_tri = 0 OR 10 * n_tri_distinct >= 4 * n_tri) AS ok_rep,
         |  ((n_tok BETWEEN 10 AND 1000)
         |   AND (2 * n_tok <= tok_chars AND tok_chars <= 12 * n_tok)
         |   AND (n_stop >= 2)
         |   AND (n_tri = 0 OR 10 * n_tri_distinct >= 4 * n_tri)) AS kept
         |FROM g""".stripMargin) { (s, dir) =>
      val base = Tables.load(s, dir, "documents")
        .select(col("doc_id"), tokensCol.as("tk"))
        .select(col("doc_id"),
          graft.functions.TextStats.qualityStatsCol(col("tk"), enStop)
            .as("__qs"))
        .select(col("doc_id"),
          col("__qs.n_tok").as("n_tok"),
          col("__qs.tok_chars").as("tok_chars"),
          col("__qs.n_stop").as("n_stop"),
          greatest(col("__qs.n_tok") - 2, lit(0L)).as("n_tri"),
          col("__qs.n_tri_distinct").as("n_tri_distinct"))
      val okLen = col("n_tok").between(10, 1000)
      val okWord = (lit(2) * col("n_tok") <= col("tok_chars")) &&
        (col("tok_chars") <= lit(12) * col("n_tok"))
      val okStop = col("n_stop") >= 2
      val okRep = (col("n_tri") === 0) ||
        (lit(10) * col("n_tri_distinct") >= lit(4) * col("n_tri"))
      base.select(col("doc_id"), okLen.as("ok_len"), okWord.as("ok_wordlen"),
        okStop.as("ok_stop"), okRep.as("ok_rep"),
        (okLen && okWord && okStop && okRep).as("kept"))
    },

    // ---- URL extraction + per-domain stats (the C4/RefinedWeb domain
    // blocklist shape): pull every URL out of the text, group by domain,
    // count URLs / distinct docs / https share. The corpus has no URLs,
    // so both engines append the SAME deterministic doc_id-derived URL
    // tail (d17's augmentation pattern) — extraction and domain parsing
    // are the operators under test, regexes in the Java∩RE2 subset.
    // Scale shape: per-row extract + explode, one shuffle on the domain
    // (bounded by the web's domain cardinality, not corpus size); a
    // blocklist join would broadcast against exactly this output. ----
    QueryDef("d20_url_domains",
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' see https://site' || (doc_id % 7) || '.example.' ||
        |      CASE WHEN doc_id % 3 = 0 THEN 'com'
        |           WHEN doc_id % 3 = 1 THEN 'org' ELSE 'net' END ||
        |      '/page/' || doc_id || '?ref=' || (doc_id % 5) ||
        |      CASE WHEN doc_id % 2 = 0
        |           THEN ' and http://cdn' || (doc_id % 4) ||
        |                '.example.com/asset' || doc_id
        |           ELSE '' END AS t
        |  FROM documents),
        |urls AS (
        |  SELECT doc_id,
        |    unnest(regexp_extract_all(t,
        |      'https?://[A-Za-z0-9.-]+[A-Za-z0-9./?=_-]*')) AS url
        |  FROM aug)
        |SELECT regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS domain,
        |  CAST(count(*) AS BIGINT) AS n_urls,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN url LIKE 'https%' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_https
        |FROM urls GROUP BY 1""".stripMargin) { (s, dir) =>
      val urlRe = "https?://[A-Za-z0-9.-]+[A-Za-z0-9./?=_-]*"
      val aug = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat(col("text"), lit(" see https://site"),
          (col("doc_id") % 7).cast("string"), lit(".example."),
          when(col("doc_id") % 3 === 0, "com")
            .when(col("doc_id") % 3 === 1, "org").otherwise("net"),
          lit("/page/"), col("doc_id").cast("string"),
          lit("?ref="), (col("doc_id") % 5).cast("string"),
          when(col("doc_id") % 2 === 0,
            concat(lit(" and http://cdn"), (col("doc_id") % 4).cast("string"),
              lit(".example.com/asset"), col("doc_id").cast("string")))
            .otherwise("")).as("t"))
      aug.select(col("doc_id"),
          explode(regexp_extract_all(col("t"), lit(urlRe), lit(0))).as("url"))
        .groupBy(regexp_extract(col("url"), "https?://([A-Za-z0-9.-]+)", 1)
          .as("domain"))
        .agg(count(lit(1)).as("n_urls"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(when(col("url").startsWith("https"), 1L).otherwise(0L))
            .as("n_https"))
    },

    // ---- BPE-ish regex token counting (the GPT-2 pre-tokenizer shape,
    // restricted to the Java∩RE2 subset: non-capturing groups and ASCII
    // classes, NO lookahead — RE2 has none): contractions split off,
    // words/numbers keep their leading space, punctuation runs and
    // whitespace runs are their own tokens. The corpus is pure
    // [A-Za-z ] by construction, so each doc gets the d17/d20-style
    // deterministic augmentation (same expression both sides) to
    // exercise every token class. `covered` must equal the augmented
    // length — the pattern's alternatives partition the string, so a
    // tokenizer drift on EITHER engine breaks the equality and the
    // hash. Zero shuffle: one codegen regex pass per row. ----
    QueryDef("d22_token_bpe",
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' It''s v' || (doc_id % 10) || '.2, don''t-stop #' ||
        |      doc_id || ' (you''ll see 42%)!' AS t
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, t,
        |    regexp_extract_all(t,
        |      '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+|\s+') AS bt
        |  FROM aug)
        |SELECT doc_id,
        |  CAST(len(bt) AS BIGINT) AS n_bpe,
        |  CAST(len(list_filter(bt, x -> regexp_matches(x, '^ ?[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |  CAST(len(list_filter(bt, x -> regexp_matches(x, '^ ?[0-9]'))) AS BIGINT) AS n_num,
        |  CAST(len(list_filter(bt, x -> regexp_matches(x, '^['']'))) AS BIGINT) AS n_contr,
        |  CAST(list_sum(list_transform(bt, x -> length(x))) AS BIGINT) AS covered,
        |  CAST(length(t) AS BIGINT) AS text_len
        |FROM tok""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          concat(col("text"), lit(" It's v"),
            (col("doc_id") % 10).cast("string"), lit(".2, don't-stop #"),
            col("doc_id").cast("string"), lit(" (you'll see 42%)!")).as("t"))
        .select(col("doc_id"), col("t"),
          graft.functions.TextStats.bpePreTokensCol(col("t")).as("bt"))
        .withColumn("__bc",
          graft.functions.TextStats.bpeClassCountsCol(col("bt")))
        .select(col("doc_id"),
          size(col("bt")).cast("long").as("n_bpe"),
          col("__bc.n_alpha").as("n_alpha"),
          col("__bc.n_num").as("n_num"),
          col("__bc.n_contr").as("n_contr"),
          graft.functions.TextStats.tokCharsCol(col("bt")).as("covered"),
          length(col("t")).cast("long").as("text_len"))
    },

    // ---- BPE merge loop (d22's consumer — tokenization beyond the
    // regex pre-pass): derive a deterministic single-epoch merge table
    // (top-8 adjacent pre-token pairs corpus-wide, ranked count DESC
    // then pair ASC — a unique ordering, so both engines build the
    // SAME table), then apply the merges IN RANK ORDER to every doc's
    // pre-token sequence. The sequence rides as a chr(1)-joined string
    // with every token boundary marked, so one merge application is one
    // boundary-anchored non-overlapping replace — token-aligned by
    // construction (no mid-token matches), and merged tokens participate
    // in later ranks (the iterative BPE property; back-to-back repeats
    // of one pair sharing a boundary merge once per pass, a documented
    // deterministic simplification of canonical BPE). The merge table
    // reaches each row via a 1-row broadcast crossJoin (d16 pattern, no
    // driver collect) and its md5 rides as data, so a ranking drift on
    // either engine is a hash mismatch. Scale shape: pair counting is
    // one explode + one bounded-vocabulary shuffle; application is a
    // zero-shuffle projection. ----
    QueryDef("d28_bpe_merges",
      """WITH aug AS (
        |  SELECT doc_id,
        |    text || ' It''s v' || (doc_id % 10) || '.2, don''t-stop #' ||
        |      doc_id || ' (you''ll see 42%)!' AS t
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id,
        |    regexp_extract_all(t,
        |      '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+|\s+') AS bt
        |  FROM aug),
        |pairs AS (
        |  SELECT unnest(list_transform(range(1, len(bt)),
        |           i -> bt[CAST(i AS INT)] || chr(1) || bt[CAST(i+1 AS INT)])) AS m
        |  FROM tok),
        |top8 AS (
        |  SELECT m, count(*) AS cnt FROM pairs GROUP BY m
        |  ORDER BY cnt DESC, m LIMIT 8),
        |mt AS (SELECT list(m ORDER BY cnt DESC, m) AS merges FROM top8),
        |app AS (
        |  SELECT doc_id, bt, merges,
        |    list_reduce(
        |      list_prepend(chr(1) || array_to_string(bt, chr(1)) || chr(1), merges),
        |      (acc, mm) -> replace(acc,
        |        chr(1) || mm || chr(1),
        |        chr(1) || replace(mm, chr(1), '') || chr(1))) AS merged
        |  FROM tok, mt)
        |SELECT doc_id, CAST(len(bt) AS BIGINT) AS n_pre,
        |  CAST(len(string_split(merged, chr(1))) - 2 AS BIGINT) AS n_merged,
        |  md5(merged) AS merged_md5,
        |  md5(array_to_string(merges, chr(2))) AS merge_table_md5
        |FROM app""".stripMargin) { (s, dir) =>
      val tok = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          concat(col("text"), lit(" It's v"),
            (col("doc_id") % 10).cast("string"), lit(".2, don't-stop #"),
            col("doc_id").cast("string"), lit(" (you'll see 42%)!")).as("t"))
        .select(col("doc_id"),
          graft.functions.TextStats.bpePreTokensCol(col("t")).as("bt"))
      // corpus merge table: adjacent pre-token pairs, top-8 by (count
      // DESC, pair ASC). The pair explode is guarded: Spark's
      // sequence(1, 0) is DESCENDING and non-empty (augmented docs
      // always have >= 2 pre-tokens, but the guard keeps the operator
      // total). sort_array over struct(-cnt, m) reproduces the unique
      // ranking inside one aggregate row.
      val top8 = tok
        .select(explode(expr(
          """IF(size(bt) >= 2,
            |  transform(sequence(1, size(bt) - 1),
            |    i -> concat(element_at(bt, i), chr(1), element_at(bt, i + 1))),
            |  CAST(array() AS ARRAY<STRING>))""".stripMargin)).as("m"))
        .groupBy("m").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("m"))
        .limit(8)
      val merges = top8.agg(expr(
        "transform(sort_array(collect_list(struct(-cnt AS nc, m AS m))), p -> p.m)")
        .as("merges"))
      // merge application via the native sequential-replace expression
      // (r19, == the aggregate/replace HOF chain, NativeExprParitySpec);
      // n_merged counts boundary bytes natively instead of a regex split
      tok.crossJoin(broadcast(merges))
        .withColumn("merged", graft.functions.TextStats.bpeApplyMergesCol(
          expr("concat(chr(1), concat_ws(chr(1), bt), chr(1))"),
          col("merges")))
        .select(col("doc_id"),
          size(col("bt")).cast("long").as("n_pre"),
          (graft.functions.TextStats.asciiSetCountCol(col("merged"), "\u0001")
            - 1).cast("long").as("n_merged"),
          md5(col("merged")).as("merged_md5"),
          md5(concat_ws("\u0002", col("merges"))).as("merge_table_md5"))
    },

    // ---- token-budget corpus selection (the data-selection step every
    // budgeted training run performs: rank the corpus by quality, keep
    // documents in rank order until a token budget is spent). The
    // ordering key is an ALL-INTEGER quality score (d02's components in
    // exact integer arithmetic) with doc_id as the unique tiebreak, and
    // the budget is corpus-relative (half the total tokens), so the op
    // is deterministic and equally selective at every SF. The
    // interesting part is the SHAPE: a running total over a global
    // ordering is the classic single-partition-window scale trap (the
    // oracle's naive formulation!), so the Spark side computes the
    // prefix sum in two parallel passes — score-range buckets (a
    // monotone function of the score, so bucket-desc-then-within-bucket
    // order IS the global order), per-bucket token totals rolled up to
    // a <=31-row table whose exclusive prefix becomes each bucket's
    // offset (broadcast back), then one bucket-PARTITIONED window for
    // the within-bucket running sum. Every shuffle is keyed and
    // parallel; nothing row-scale ever passes through one partition
    // (PlanSpec pins the window's partition spec). At 100 TB the fixed
    // value-range buckets become sampled quantile boundaries
    // (repartitionByRange) — fixed ranges keep the gate deterministic. ----
    QueryDef("d29_budget_select",
      s"""WITH t AS (SELECT doc_id,
         |             len(regexp_extract_all(text,'\\S+')) AS n_tok,
         |             len(regexp_extract_all(text,'[.,;:!?]')) AS n_punct,
         |             len(list_filter(regexp_extract_all(text,'\\S+'),
         |               t -> t IN ${inList(enStop)})) AS stop
         |           FROM documents),
         |s AS (SELECT doc_id, n_tok,
         |        least(n_tok, 50) * 20
         |        + greatest(greatest(n_tok, 1) - n_punct, 0) * 1000 // greatest(n_tok, 1)
         |        + least(stop * 5000 // greatest(n_tok, 1), 1000) AS score
         |      FROM t),
         |b AS (SELECT CAST(sum(n_tok) // 2 AS BIGINT) AS budget FROM s),
         |c AS (SELECT doc_id, score, n_tok,
         |        sum(n_tok) OVER (ORDER BY score DESC, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |      FROM s)
         |SELECT doc_id, CAST(score AS BIGINT) AS score,
         |  CAST(n_tok AS BIGINT) AS n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
         |  cum <= (SELECT budget FROM b) AS kept
         |FROM c""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
      val scored = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          size(tokensCol).as("n_tok"),
          graft.functions.TextStats.asciiSetCountCol(col("text"), ".,;:!?")
            .as("n_punct"),
          graft.functions.TextStats.stopCountCol(tokensCol, enStop)
            .as("stop"))
        .select(col("doc_id"), col("n_tok").cast("long").as("n_tokens"),
          expr("""least(n_tok, 50) * 20L
            | + greatest(greatest(n_tok, 1) - n_punct, 0) * 1000L div greatest(n_tok, 1)
            | + least(stop * 5000L div greatest(n_tok, 1), 1000L)""".stripMargin)
            .as("score"))
        .persist() // two consumers: the budget aggregate + the main pass
      val budget = scored.agg(
        expr("CAST(sum(n_tokens) div 2 AS BIGINT)").as("budget"))
      // score-range buckets: monotone in score, so bucket-desc order
      // nests the global (score DESC, doc_id) order; score <= 3000 by
      // construction -> at most 31 buckets of width 100
      val bucketed = scored.withColumn("bucket", expr("score div 100L"))
      val totals = bucketed.groupBy("bucket").agg(sum("n_tokens").as("btotal"))
      // exclusive prefix over the TINY per-bucket table (<= 31 rows —
      // the only unpartitioned window in the plan, and it is
      // aggregate-sized, never row-sized)
      val offsets = totals.withColumn("off",
        coalesce(
          sum("btotal").over(w.orderBy(col("bucket").desc)
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val byBucket = w.partitionBy("bucket")
        .orderBy(col("score").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      bucketed
        .join(broadcast(offsets.select(col("bucket"), col("off"))), Seq("bucket"))
        .withColumn("cum_tokens",
          (col("off") + sum("n_tokens").over(byBucket)).cast("long"))
        .crossJoin(broadcast(budget))
        .select(col("doc_id"), col("score").cast("long").as("score"),
          col("n_tokens"), col("cum_tokens"),
          (col("cum_tokens") <= col("budget")).as("kept"))
    },

    // ---- text normalization (the CCNet/C4 pre-dedup step: lowercase,
    // whitespace collapse, trim): corpus text is already clean, so docs
    // get a deterministic case/whitespace perturbation first (d17/d20
    // augmentation pattern, same expression both sides) and the op under
    // test is the normalizer. The full normalized text is pinned by md5
    // (d17 precedent), so any normalization drift on either engine is a
    // hash mismatch. Zero shuffle: one codegen projection per row. ----
    QueryDef("d23_normalize",
      """WITH aug AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN upper(text) ELSE text END ||
        |    '   Trailing  WS ' || (doc_id % 5) || '  ' AS t
        |  FROM documents),
        |n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(lower(t), '\s+', ' ', 'g')) AS norm
        |  FROM aug)
        |SELECT doc_id, md5(norm) AS norm_md5,
        |  CAST(length(norm) AS BIGINT) AS norm_len,
        |  CAST(len(regexp_extract_all(norm, '\S+')) AS BIGINT) AS n_tokens
        |FROM n""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          concat(
            when(col("doc_id") % 2 === 0, upper(col("text")))
              .otherwise(col("text")),
            lit("   Trailing  WS "), (col("doc_id") % 5).cast("string"),
            lit("  ")).as("t"))
        .select(col("doc_id"),
          trim(regexp_replace(lower(col("t")), "\\s+", " ")).as("norm"))
        .select(col("doc_id"), md5(col("norm")).as("norm_md5"),
          length(col("norm")).cast("long").as("norm_len"),
          size(graft.functions.TextStats.wsTokensCol(col("norm")))
            .cast("long").as("n_tokens"))
    },

    // ---- fixed-window sequence chunking (training sequence prep: split
    // each doc's token stream into 32-token windows, stride 32, last
    // partial kept — the deterministic cousin of greedy sequence packing,
    // whose bin assignment is input-order-dependent and therefore not
    // oracle-able). Chunk boundaries are pure integer arithmetic
    // ((n+31) div 32 windows), chunk text pinned by md5. Zero shuffle:
    // tokenize + explode + slice in one codegen pass; at 100 TB chunking
    // is bounded by the scan exactly like signature generation. ----
    QueryDef("d24_sequence_chunks",
      """WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents),
        |c AS (
        |  SELECT doc_id, len(tk) AS n_tok,
        |    unnest(range(0, greatest((len(tk) + 31) // 32, 1))) AS chunk_idx,
        |    tk
        |  FROM t)
        |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(least(n_tok - chunk_idx*32, 32) AS BIGINT) AS chunk_tokens,
        |  md5(array_to_string(tk[chunk_idx*32+1 : least(chunk_idx*32+32, n_tok)], ' '))
        |    AS chunk_md5
        |FROM c""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), tokensCol.as("tk"))
        .withColumn("n_tok", size(col("tk")).cast("long"))
        .withColumn("chunk_idx", explode(sequence(lit(0L),
          greatest(expr("(n_tok + 31L) div 32L"), lit(1L)) - 1)))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          least(col("n_tok") - col("chunk_idx") * 32, lit(32L))
            .cast("long").as("chunk_tokens"),
          md5(concat_ws(" ", slice(col("tk"),
            (col("chunk_idx") * 32 + 1).cast("int"),
            least(col("n_tok") - col("chunk_idx") * 32, lit(32L)).cast("int"))))
            .as("chunk_md5"))
    },

    // ---- corpus heavy hitters (top-10 terms) with a count-min-sketch
    // cross-check: the exact arm is a vocabulary aggregation + TakeOrdered
    // top-k (never a single-partition global window). The approximate arm
    // builds Spark's native count_min_sketch aggregate (one binary row,
    // broadcast) and probes it per heavy hitter with the cms_estimate
    // expression — the read half Spark doesn't ship, evaluated in codegen
    // so the contract never leaves the plan. CMS guarantees
    // true <= est <= true + eps*N with prob >= conf per probe; with the
    // fixed seed the outcome is deterministic, and the in-band `cms_ok`
    // asserts it for all 10 hitters (eps = 0.001, N = total token count).
    // At 100 TB the sketch is the mergeable, fixed-size (~70 KB) summary
    // a frequency pipeline ships instead of the vocabulary. ----
    QueryDef("d31_heavy_hitters",
      """WITH w AS (SELECT unnest(regexp_extract_all(text, '\S+')) AS term
        |           FROM documents),
        |c AS (SELECT term, count(*) AS cnt FROM w GROUP BY term),
        |r AS (SELECT term, cnt,
        |  row_number() OVER (ORDER BY cnt DESC, term) AS rnk FROM c)
        |SELECT term, cnt, CAST(rnk AS BIGINT) AS rnk, true AS cms_ok
        |FROM r WHERE rnk <= 10""".stripMargin) { (s, dir) =>
      val terms = Tables.load(s, dir, "documents")
        .select(explode(tokensCol).as("term")).persist()
      val counts = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      // TakeOrdered top-k (distributed), rank attached over the 10 rows
      val top = counts.orderBy(col("cnt").desc, col("term")).limit(10)
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("cnt").desc, col("term"))).cast("long"))
      val sketch = terms.agg(
        expr("count_min_sketch(term, 0.001d, 0.99d, 42)").as("sk"))
      val total = terms.agg(count(lit(1)).as("n_total"))
      val ok = top.crossJoin(broadcast(sketch)).crossJoin(broadcast(total))
        .withColumn("est",
          graft.functions.CmsEstimate.cmsEstimateCol(col("sk"), col("term")))
        .agg(min(col("est") >= col("cnt") &&
          (col("est") - col("cnt")).cast("double") <=
            col("n_total").cast("double") * 0.001).as("cms_ok"))
      top.select(col("term"), col("cnt"), col("rnk"))
        .crossJoin(broadcast(ok))
    },

    // ---- temperature-based corpus mixing weights (d32): the
    // multilingual-pretraining resampling dial (XLM/mT5 recipe) —
    // sampling weight ∝ n^α with α < 1 upweights low-resource slices.
    // Emitted as ratios AGAINST THE LARGEST SLICE (n^α / max_n^α) in two
    // temperatures (α = 1/2 and 1/4), not as normalized shares: the
    // normalizer Σ n^α is an unordered float sum (engine-dependent last
    // bit — the r2 e05 hash lesson), while sqrt on exact integers is
    // correctly rounded IEEE on both engines, so every emitted double is
    // bit-stable by construction. One tiny aggregation (≤ lang-count
    // rows) + a 1-row broadcast max — nothing row-scale shuffles, and at
    // 100 TB this is a metadata-sized pass over partition counts. The
    // per-mille column is what a downstream sampler consumes (d15's
    // stratified machinery applies it). ----
    QueryDef("d32_temperature_mix",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |m AS (SELECT max(n) AS mx FROM c)
        |SELECT lang, CAST(n AS BIGINT) AS n_docs,
        |  sqrt(CAST(n AS DOUBLE)) / sqrt(CAST(mx AS DOUBLE)) AS w_half,
        |  sqrt(sqrt(CAST(n AS DOUBLE))) / sqrt(sqrt(CAST(mx AS DOUBLE))) AS w_quarter,
        |  CAST(trunc(1000 * sqrt(CAST(n AS DOUBLE)) / sqrt(CAST(mx AS DOUBLE))) AS BIGINT)
        |    AS per_mille_half
        |FROM c, m""".stripMargin) { (s, dir) =>
      val counts = Tables.load(s, dir, "documents")
        .groupBy("lang").agg(count(lit(1)).as("n"))
      val mx = counts.agg(max(col("n")).as("mx"))
      counts.crossJoin(broadcast(mx))
        .select(col("lang"), col("n").cast("long").as("n_docs"),
          (sqrt(col("n").cast("double")) / sqrt(col("mx").cast("double")))
            .as("w_half"),
          (sqrt(sqrt(col("n").cast("double"))) / sqrt(sqrt(col("mx").cast("double"))))
            .as("w_quarter"),
          floor(lit(1000) * sqrt(col("n").cast("double")) / sqrt(col("mx").cast("double")))
            .cast("long").as("per_mille_half"))
    },

    // ---- vocabulary-coverage (OOV-rate) quality filter (d33): score
    // each doc by the share of its tokens OUTSIDE the corpus top-K
    // vocabulary — the integer-exact stand-in for LM-perplexity
    // filtering (CCNet shape): rare-token-heavy docs score high and get
    // filtered, and unlike a real LM score every emitted value is an
    // integer (permille via int division), so the gate is bit-stable
    // with no float/log rounding contract. Scale shape: the token
    // explode hash-partitions on the token (Heaps'-law sublinear
    // distinct count); the top-K is TakeOrderedAndProject (per-partition
    // top-K then a K-row driver merge — NO global sort, NO
    // single-partition window); the K-row vocabulary broadcasts back
    // into a per-doc rollup. Tiebreak at the rank-K boundary is total
    // (count DESC, token ASC) so both engines cut identically. K=16
    // because the synthetic corpus draws from a 31-token vocabulary —
    // a production corpus would use 10^4-10^5; the plan shape is
    // K-independent. ----
    QueryDef("d33_oov_rate",
      """WITH tok AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
        |  FROM documents),
        |voc AS (
        |  SELECT w FROM tok GROUP BY w
        |  ORDER BY count(*) DESC, w LIMIT 16),
        |per AS (
        |  SELECT t.doc_id, count(*) AS n_tokens,
        |         count(*) FILTER (WHERE v.w IS NULL) AS n_oov
        |  FROM tok t LEFT JOIN voc v USING (w) GROUP BY t.doc_id)
        |SELECT d.doc_id,
        |  coalesce(n_tokens, 0) AS n_tokens,
        |  coalesce(n_oov, 0) AS n_oov,
        |  CASE WHEN coalesce(n_tokens, 0) = 0 THEN 1000
        |       ELSE (1000 * n_oov) // n_tokens END AS oov_permille
        |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      // persisted: feeds both the vocabulary ranking and the scoring
      // join (d16 convention — PinScope unpersists after materialization)
      val tok = docs.select(col("doc_id"), explode(tokensCol).as("w")).persist()
      val voc = tok.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w").asc).limit(16)
        .select(col("w"), lit(1).as("inv"))
      val per = tok.join(broadcast(voc), Seq("w"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("inv").isNull, lit(1))).as("n_oov"))
      docs.select("doc_id").join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("n_oov"), lit(0L)).as("n_oov"),
          when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(1000L))
            .otherwise(expr("(1000 * n_oov) div n_tokens")).cast("long")
            .as("oov_permille"))
    },

    // ---- hashed-feature importance voting (d34): the DSIR shape
    // (Data Selection via Importance Resampling, Xie et al. 2023) in
    // integer-exact form — score each document by how target-like its
    // hashed n-gram feature distribution is. Features are unigram FNV-1a
    // buckets (B = 64; unsigned mod is EXACT in signed long arithmetic
    // because 2^64 ≡ 0 mod 64); the target is the English slice; each
    // token votes +1/-1 by the sign of the cross-multiplied ratio test
    // t_n * r_tot <=> r_n * t_tot (the integer surrogate for
    // log p_target(b) - log p_raw(b), sign-exact, no float/log rounding
    // contract). Scale shape: the token explode is scan-bounded; bucket
    // stats are a 64-row aggregate broadcast back; the per-doc rollup is
    // the ONE row-scale shuffle (doc_id). On the synthetic corpus the
    // vote spread is real (-39..+11 at sf0.01) — stopword-heavy English
    // docs score highest, exactly DSIR's intent. ----
    QueryDef("d34_importance_votes",
      """WITH tok AS (
        |  SELECT d.doc_id, d.lang, unnest(regexp_extract_all(d.text, '\S+')) AS w
        |  FROM documents d),
        |voc AS (SELECT DISTINCT w FROM tok),
        |fp AS (
        |  SELECT w,
        |    CAST(list_reduce(
        |      list_prepend(14695981039346656037::HUGEINT,
        |        list_transform(range(1, octet_length(encode(w)) + 1), i ->
        |          CAST(16 * (strpos('0123456789ABCDEF', upper(substring(hex(encode(w)), CAST(2*i-1 AS INT), 1))) - 1)
        |             + (strpos('0123456789ABCDEF', upper(substring(hex(encode(w)), CAST(2*i AS INT), 1))) - 1) AS HUGEINT))),
        |      (h, b) -> (xor(h, b) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT)
        |      % 64 AS BIGINT) AS b
        |  FROM voc),
        |bt AS (
        |  SELECT fp.b, count(*) AS r_n,
        |    count(*) FILTER (WHERE tok.lang = 'en') AS t_n
        |  FROM tok JOIN fp USING (w) GROUP BY fp.b),
        |tot AS (SELECT CAST(sum(r_n) AS BIGINT) AS r_tot,
        |               CAST(sum(t_n) AS BIGINT) AS t_tot FROM bt),
        |scored AS (
        |  SELECT tok.doc_id, count(*) AS n_tokens,
        |    CAST(sum(CASE WHEN bt.t_n * tot.r_tot > bt.r_n * tot.t_tot THEN 1
        |             WHEN bt.t_n * tot.r_tot < bt.r_n * tot.t_tot THEN -1
        |             ELSE 0 END) AS BIGINT) AS votes
        |  FROM tok JOIN fp USING (w) JOIN bt USING (b) CROSS JOIN tot
        |  GROUP BY tok.doc_id)
        |SELECT d.doc_id, d.lang,
        |  coalesce(s.n_tokens, 0) AS n_tokens,
        |  coalesce(s.votes, 0) AS votes,
        |  coalesce(s.votes, 0) > 0 AS target_like
        |FROM documents d LEFT JOIN scored s USING (doc_id)""".stripMargin) { (s, dir) =>
      graft.functions.Fingerprint64.register(s)
      val docs = Tables.load(s, dir, "documents")
      // persisted: feeds the 64-row bucket stats AND the per-doc scoring
      // rollup (d33 convention — PinScope unpersists after materialization)
      val tok = docs.select(col("doc_id"), col("lang"), explode(tokensCol).as("w"))
        .withColumn("b",
          pmod(graft.functions.Fingerprint64.fingerprint64(col("w")), lit(64L)))
        .persist()
      val bt = tok.groupBy("b").agg(count(lit(1)).as("r_n"),
        count(when(col("lang") === "en", 1)).as("t_n"))
      val tot = bt.agg(sum("r_n").as("r_tot"), sum("t_n").as("t_tot"))
      val vote = when(col("t_n") * col("r_tot") > col("r_n") * col("t_tot"), 1L)
        .when(col("t_n") * col("r_tot") < col("r_n") * col("t_tot"), -1L)
        .otherwise(0L)
      val scored = tok.join(broadcast(bt), Seq("b")).crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum(vote).as("votes"))
      docs.select("doc_id", "lang").join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
          coalesce(col("votes"), lit(0L)).as("votes"),
          (coalesce(col("votes"), lit(0L)) > 0).as("target_like"))
    },

    // ---- URL canonicalization + URL-level dedup (d35): the web-crawl
    // frontier/dedup step (CommonCrawl shape) — raw URLs differ by
    // scheme/host case, a www. prefix, an explicit default port, a
    // trailing slash, or a #fragment while naming the same resource.
    // Canonical form: lowercase scheme+host, strip www. and :80/:443,
    // drop the fragment, strip one trailing slash; path case and query
    // are PRESERVED (case-sensitive server-side). Built by extraction +
    // concat, not replacement, so the regexes stay in the Java∩RE2
    // subset (d17's contract — no lookaheads, no group-ref replacement
    // syntax divergence). URLs are deterministically synthesized from
    // doc_id residues (d20's augmentation pattern) so both engines see
    // identical raw inputs with REAL cross-doc collision structure
    // (500 raw → 77 canonical at sf0.01). Dedup verdict = first
    // occurrence by min doc_id per canonical URL — ONE shuffle on the
    // canonical key; canonicalization itself is a zero-shuffle per-row
    // projection. ----
    QueryDef("d35_url_canonical",
      """WITH aug AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
        |    (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |    'Site' || (doc_id % 7) || '.Example.COM' ||
        |    (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END) ||
        |    '/p/' || (doc_id % 11) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END) ||
        |    (CASE WHEN doc_id % 3 = 1 THEN '#sec' || (doc_id % 6) ELSE '' END) AS url
        |  FROM documents),
        |parts AS (
        |  SELECT doc_id, url,
        |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
        |    lower(regexp_extract(regexp_extract(url, '^[A-Za-z]+://([^/#?]+)', 1),
        |                         '^([^:]+)', 1)) AS host,
        |    regexp_extract(url, '^[A-Za-z]+://[^/#?]+([^#]*)', 1) AS rest
        |  FROM aug),
        |canon AS (
        |  SELECT doc_id, url,
        |    scheme || '://' ||
        |    (CASE WHEN host LIKE 'www.%' THEN substring(host, 5) ELSE host END) ||
        |    (CASE WHEN rest LIKE '%/' THEN substring(rest, 1, length(rest) - 1)
        |          ELSE rest END) AS curl
        |  FROM parts)
        |SELECT c.doc_id, c.url, c.curl,
        |  c.doc_id = min(c.doc_id) OVER (PARTITION BY c.curl) AS keep,
        |  CAST(count(*) OVER (PARTITION BY c.curl) AS BIGINT) AS n_dups
        |FROM canon c""".stripMargin) { (s, dir) =>
      val aug = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 2 === 0, "HTTPS").otherwise("https"), lit("://"),
          when(col("doc_id") % 3 === 0, "WWW.").otherwise(""),
          lit("Site"), (col("doc_id") % 7).cast("string"), lit(".Example.COM"),
          when(col("doc_id") % 5 === 0, ":443").otherwise(""),
          lit("/p/"), (col("doc_id") % 11).cast("string"),
          when(col("doc_id") % 4 === 0, "/").otherwise(""),
          when(col("doc_id") % 3 === 1,
            concat(lit("#sec"), (col("doc_id") % 6).cast("string")))
            .otherwise("")).as("url"))
      val parts = aug.select(col("doc_id"), col("url"),
        lower(regexp_extract(col("url"), "^([A-Za-z]+)://", 1)).as("scheme"),
        lower(regexp_extract(
          regexp_extract(col("url"), "^[A-Za-z]+://([^/#?]+)", 1),
          "^([^:]+)", 1)).as("host"),
        regexp_extract(col("url"), "^[A-Za-z]+://[^/#?]+([^#]*)", 1).as("rest"))
      val canon = parts.select(col("doc_id"), col("url"),
        concat(col("scheme"), lit("://"),
          when(col("host").like("www.%"), expr("substring(host, 5)"))
            .otherwise(col("host")),
          when(col("rest").like("%/"),
            expr("substring(rest, 1, length(rest) - 1)"))
            .otherwise(col("rest"))).as("curl"))
      val w = Window.partitionBy("curl")
      canon.select(col("doc_id"), col("url"), col("curl"),
        (col("doc_id") === min("doc_id").over(w)).as("keep"),
        count(lit(1)).over(w).as("n_dups"))
    },

    // ---- contiguous sequence packing (d36): the GPT-style training-
    // stream step d24's sibling — instead of chunking WITHIN documents,
    // the whole corpus is laid out as one token stream in doc_id order
    // and cut into fixed 128-token sequences, documents straddling cut
    // points (the standard pretraining packing; the EOD token between
    // docs is the tokenizer's concern, not the layout's). Emitted per
    // doc: its exclusive token offset, the sequence it starts in, its
    // in-sequence offset, and how many sequences it touches. The
    // exclusive prefix sum over the global doc_id order is the same
    // single-partition-window trap as d29, solved the same way: doc_id
    // ranges bucket the corpus (monotone in the order), per-bucket
    // totals roll up to an aggregate-sized offset table (broadcast
    // back), and the within-bucket running sum is a bucket-PARTITIONED
    // window — nothing row-scale through one partition; at 100 TB the
    // fixed-width buckets become sampled range boundaries. ----
    QueryDef("d36_sequence_pack",
      """WITH t AS (SELECT doc_id,
        |             len(regexp_extract_all(text, '\S+')) AS n_tok
        |           FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |        coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_start
        |      FROM t)
        |SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
        |  CAST(tok_start AS BIGINT) AS token_start,
        |  CAST(tok_start // 128 AS BIGINT) AS seq_id,
        |  CAST(tok_start % 128 AS BIGINT) AS seq_offset,
        |  CAST(CASE WHEN n_tok = 0 THEN 0
        |       ELSE (tok_start + n_tok - 1) // 128 - tok_start // 128 + 1
        |       END AS BIGINT) AS n_seqs
        |FROM c""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), size(tokensCol).cast("long").as("n_tok"))
        // doc_id-range buckets: monotone in doc_id, so bucket-asc nests
        // the global order (d29's score-bucket trick on the id axis)
        .withColumn("bucket", expr("doc_id div 100L"))
        .persist() // two consumers: bucket totals + the main pass
      val totals = toks.groupBy("bucket").agg(sum("n_tok").as("btotal"))
      // exclusive prefix over the TINY per-bucket table (aggregate-sized)
      val offsets = totals.withColumn("off",
        coalesce(
          sum("btotal").over(w.orderBy(col("bucket").asc)
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val byBucket = w.partitionBy("bucket").orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      toks
        .join(broadcast(offsets.select(col("bucket"), col("off"))), Seq("bucket"))
        .withColumn("tok_start",
          (col("off") + coalesce(sum("n_tok").over(byBucket), lit(0L))).cast("long"))
        .select(col("doc_id"), col("n_tok").as("n_tokens"),
          col("tok_start").as("token_start"),
          expr("tok_start div 128L").as("seq_id"),
          pmod(col("tok_start"), lit(128L)).as("seq_offset"),
          when(col("n_tok") === 0, lit(0L))
            .otherwise(expr("(tok_start + n_tok - 1) div 128L - tok_start div 128L + 1"))
            .cast("long").as("n_seqs"))
    },

    // ---- pack MANIFEST (d51): d36's consumer — the per-(sequence, doc)
    // span table a dataloader's attention masking actually reads. For
    // every 128-token sequence a doc touches: its start offset and span
    // length inside that sequence, plus doc_head/doc_tail flags (the
    // cross-doc attention boundary markers). Row count = Σ n_seqs ≈
    // tokens/128 + docs. All-integer arithmetic off the same bucketed
    // exclusive prefix sum as d36 (aggregate-sized offset table
    // broadcast, bucket-partitioned running sum — PlanSpec pins d36's
    // shape; this is one more projection + a bounded sequence explode
    // of ≤ n_seqs elements per doc). A packing bug that d36's per-doc
    // offsets could hide (off-by-one at a cut point, a span that
    // over/underfills a sequence) shows here as a hash mismatch, and
    // PipelineSpec asserts every interior sequence fills to exactly
    // 128 tokens. ----
    QueryDef("d51_pack_manifest",
      """WITH t AS (SELECT doc_id,
        |             len(regexp_extract_all(text, '\S+')) AS n_tok
        |           FROM documents),
        |c AS (SELECT doc_id, n_tok,
        |        coalesce(sum(n_tok) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS tok_start
        |      FROM t),
        |e AS (SELECT doc_id, n_tok, tok_start,
        |        unnest(range(CAST(tok_start // 128 AS BIGINT),
        |                     CAST((tok_start + n_tok - 1) // 128 + 1 AS BIGINT)))
        |          AS seq_id
        |      FROM c WHERE n_tok > 0)
        |SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
        |  CAST(greatest(tok_start - seq_id*128, 0) AS BIGINT) AS start_in_seq,
        |  CAST(least(tok_start + n_tok - seq_id*128, 128)
        |    - greatest(tok_start - seq_id*128, 0) AS BIGINT) AS len_in_seq,
        |  seq_id = tok_start // 128 AS doc_head,
        |  seq_id = (tok_start + n_tok - 1) // 128 AS doc_tail
        |FROM e""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
      val toks = Tables.load(s, dir, "documents")
        .select(col("doc_id"), size(tokensCol).cast("long").as("n_tok"))
        .withColumn("bucket", expr("doc_id div 100L"))
        .persist()
      val totals = toks.groupBy("bucket").agg(sum("n_tok").as("btotal"))
      val offsets = totals.withColumn("off",
        coalesce(
          sum("btotal").over(w.orderBy(col("bucket").asc)
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      val byBucket = w.partitionBy("bucket").orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      toks
        .join(broadcast(offsets.select(col("bucket"), col("off"))), Seq("bucket"))
        .withColumn("tok_start",
          (col("off") + coalesce(sum("n_tok").over(byBucket), lit(0L))).cast("long"))
        .filter(col("n_tok") > 0)
        .select(col("doc_id"), col("n_tok"), col("tok_start"),
          explode(expr(
            "sequence(tok_start div 128L, (tok_start + n_tok - 1) div 128L)"))
            .as("seq_id"))
        .select(col("seq_id"), col("doc_id"),
          greatest(col("tok_start") - col("seq_id") * 128, lit(0L))
            .as("start_in_seq"),
          (least(col("tok_start") + col("n_tok") - col("seq_id") * 128, lit(128L)) -
            greatest(col("tok_start") - col("seq_id") * 128, lit(0L)))
            .as("len_in_seq"),
          (col("seq_id") === expr("tok_start div 128L")).as("doc_head"),
          (col("seq_id") === expr("(tok_start + n_tok - 1) div 128L")).as("doc_tail"))
    },

    // ---- sentence segmentation (d38): split on terminator+whitespace
    // boundaries, per-doc sentence stats in exact integers plus the
    // md5-pinned first sentence (d23's rewrite-evidence convention).
    // The d01 stats are token-axis; sequence packing and sentence-level
    // filtering both need the sentence axis. Both engines split with
    // the same regex and drop whitespace-only fragments, so counts are
    // engine-exact; per-sentence token mean rides as integer permille
    // (no float ratios). Zero shuffle: one projection over the corpus
    // scan — every column is a per-row expression. ----
    QueryDef("d38_sentences",
      "WITH " + sentenceAxisCte + "\n" +
      """SELECT doc_id, CAST(len(sents) AS BIGINT) AS n_sents,
        |  CAST(list_sum(list_transform(sents,
        |    x -> length(regexp_extract_all(x, '\S+')))) AS BIGINT) AS sent_tokens,
        |  CAST(CASE WHEN len(sents) = 0 THEN 0
        |       ELSE list_sum(list_transform(sents,
        |         x -> length(regexp_extract_all(x, '\S+')))) * 1000
        |            // len(sents) END AS BIGINT) AS toks_per_sent_permille,
        |  CAST(COALESCE(list_max(list_transform(sents,
        |    x -> length(regexp_extract_all(x, '\S+')))), 0) AS BIGINT) AS max_sent_toks,
        |  md5(COALESCE(sents[1], '')) AS first_md5
        |FROM s""".stripMargin) { (s, dir) =>
      Tables.load(s, dir, "documents")
        .withColumn("sents", sentencesCol)
        .withColumn("stoks", transform(col("sents"),
          x => size(graft.functions.TextStats.wsTokensCol(x)).cast("long")))
        .select(col("doc_id"),
          size(col("sents")).cast("long").as("n_sents"),
          coalesce(expr("aggregate(stoks, 0L, (a, x) -> a + x)"), lit(0L))
            .as("sent_tokens"),
          when(size(col("sents")) === 0, lit(0L))
            .otherwise(expr(
              "aggregate(stoks, 0L, (a, x) -> a + x) * 1000L div size(sents)"))
            .cast("long").as("toks_per_sent_permille"),
          coalesce(expr("array_max(stoks)"), lit(0L)).as("max_sent_toks"),
          md5(coalesce(expr("sents[0]"), lit(""))).as("first_md5"))
    },

    // ---- within-doc duplicate-sentence fraction (d44): the Gopher
    // duplicate-line rule at sentence granularity — the fraction of a
    // doc's sentences whose exact text appears more than once IN THAT
    // DOC (boilerplate/navigation repetition, distinct from d13's
    // shingle repetition and d21's CROSS-doc windows). Exact integers
    // throughout; keep = duplicate fraction < 30 %. Scale shape: ONE
    // shuffle keyed (doc_id, sentence) with map-side combine, one
    // doc_id rollup — never cross-doc, never pairwise. ----
    QueryDef("d44_dup_sentences",
      "WITH " + sentenceAxisCte + ",\n" +
      """u AS (SELECT doc_id, unnest(sents) AS sent FROM s),
        |c AS (SELECT doc_id, sent, count(*) AS k FROM u GROUP BY 1, 2),
        |p AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_sents,
        |        CAST(sum(CASE WHEN k > 1 THEN k ELSE 0 END) AS BIGINT) AS n_dup
        |      FROM c GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(p.n_sents, 0) AS n_sents, COALESCE(p.n_dup, 0) AS n_dup,
        |  CAST(COALESCE(p.n_dup, 0) * 1000 // greatest(COALESCE(p.n_sents, 0), 1)
        |    AS BIGINT) AS dup_permille,
        |  COALESCE(p.n_dup * 10 < p.n_sents * 3, true) AS keep
        |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin) { (s, dir) =>
      val sents = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(sentencesCol).as("sent"))
      val per = sents.groupBy("doc_id", "sent").agg(count(lit(1)).as("k"))
        .groupBy("doc_id")
        .agg(sum("k").cast("long").as("n_sents"),
          sum(when(col("k") > 1, col("k")).otherwise(0L)).cast("long").as("n_dup"))
      Tables.load(s, dir, "documents").select(col("doc_id"))
        .join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_sents"), lit(0L)).as("n_sents"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup"),
          expr("coalesce(n_dup, 0L) * 1000L div greatest(coalesce(n_sents, 0L), 1L)")
            .cast("long").as("dup_permille"),
          coalesce(col("n_dup") * 10 < col("n_sents") * 3, lit(true)).as("keep"))
    },

    // ---- adaptive per-slice quality cutoff (d39): each language slice
    // keeps documents at or above ITS OWN 25th-percentile token count —
    // per-slice adaptive thresholds instead of one global floor (the
    // CCNet practice: a cutoff tuned for English over-prunes low-resource
    // slices). The discrete percentile is the ceil(n/4)-th smallest
    // element, computed scalably: per-(lang, score) histogram counts
    // (ONE row-scale shuffle with map-side combine), then a running sum
    // over the aggregate-sized histogram — the per-lang window touches
    // score-cardinality rows, never corpus rows (d29's bucket pattern;
    // a naive per-lang sort of the corpus is exactly what the oracle
    // runs and what this plan avoids). Cutoffs broadcast back. ----
    QueryDef("d39_adaptive_cutoff",
      """WITH s AS (SELECT doc_id, lang,
        |    CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS score
        |  FROM documents),
        |r AS (SELECT lang, score,
        |    row_number() OVER (PARTITION BY lang ORDER BY score, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM s),
        |c AS (SELECT lang, score AS cutoff FROM r WHERE rn = (n + 3) // 4)
        |SELECT s.doc_id, s.lang, s.score, c.cutoff,
        |       s.score >= c.cutoff AS keep
        |FROM s JOIN c USING (lang)""".stripMargin) { (s, dir) =>
      val scored = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(tokensCol).cast("long").as("score"))
      val hist = scored.groupBy("lang", "score")
        .agg(count(lit(1)).as("cnt"))
      val wl = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy("score")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val tot = hist.groupBy("lang").agg(sum("cnt").as("n"))
      val cut = hist.withColumn("cum", sum("cnt").over(wl))
        .join(broadcast(tot), Seq("lang"))
        .filter(col("cum") >= expr("(n + 3) div 4"))
        .groupBy("lang").agg(min("score").as("cutoff"))
      scored.join(broadcast(cut), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("score"), col("cutoff"),
          (col("score") >= col("cutoff")).as("keep"))
    },

    // ---- code-switching detection (d40): d03's stopword lang-ID voted
    // PER SENTENCE (d38's split), rolled up to the dominant language,
    // the distinct-language count, and a mixed flag — the CCNet
    // practice of classifying at sub-document granularity, which
    // catches documents a whole-doc classifier mislabels. Deterministic
    // everywhere: d03's tie chain per sentence, (votes desc, fixed lang
    // order) for dominance. Scale shape: the explode is bounded by
    // sentences/doc; votes roll up on (doc_id, vote) with map-side
    // combine, then a doc_id window over the ≤4-votes-per-doc
    // aggregate — both exchanges carry aggregated rows, never raw
    // sentence text. ----
    QueryDef("d40_lang_segments",
      "WITH " + sentenceAxisCte + ",\n" +
      """u AS (SELECT doc_id, unnest(sents) AS sent FROM s),
        |v AS (SELECT doc_id,
        |    CASE WHEN en >= de AND en >= fr AND en >= es THEN 'en'
        |         WHEN de >= fr AND de >= es THEN 'de'
        |         WHEN fr >= es THEN 'fr' ELSE 'es' END AS vote
        |  FROM (SELECT doc_id,
        |      length(list_filter(regexp_extract_all(sent, '\S+'), t -> t IN ('the','a','and','of','is'))) AS en,
        |      length(list_filter(regexp_extract_all(sent, '\S+'), t -> t IN ('der','die','das','und','ist'))) AS de,
        |      length(list_filter(regexp_extract_all(sent, '\S+'), t -> t IN ('le','la','et','les','des'))) AS fr,
        |      length(list_filter(regexp_extract_all(sent, '\S+'), t -> t IN ('el','los','las','y','es'))) AS es
        |    FROM u) t),
        |c AS (SELECT doc_id, vote, count(*) AS n FROM v GROUP BY 1, 2),
        |r AS (SELECT doc_id, vote, n,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY n DESC,
        |      CASE vote WHEN 'en' THEN 0 WHEN 'de' THEN 1 WHEN 'fr' THEN 2 ELSE 3 END) AS rn,
        |    count(*) OVER (PARTITION BY doc_id) AS n_langs,
        |    sum(n) OVER (PARTITION BY doc_id) AS n_sents
        |  FROM c),
        |d AS (SELECT doc_id, vote AS dominant, n_langs, n_sents FROM r WHERE rn = 1)
        |SELECT doc.doc_id, COALESCE(d.dominant, 'none') AS dominant,
        |  CAST(COALESCE(d.n_langs, 0) AS BIGINT) AS n_langs,
        |  CAST(COALESCE(d.n_sents, 0) AS BIGINT) AS n_sents,
        |  COALESCE(d.n_langs, 0) > 1 AS mixed
        |FROM documents doc LEFT JOIN d USING (doc_id)""".stripMargin) { (s, dir) =>
      def cnt(words: Seq[String]) =
        graft.functions.TextStats.stopCountCol(
          graft.functions.TextStats.wsTokensCol(col("sent")), words)
      val docs = Tables.load(s, dir, "documents")
      val votes = docs
        .select(col("doc_id"), explode(sentencesCol).as("sent"))
        .select(col("doc_id"),
          cnt(Seq("the", "a", "and", "of", "is")).as("en"),
          cnt(Seq("der", "die", "das", "und", "ist")).as("de"),
          cnt(Seq("le", "la", "et", "les", "des")).as("fr"),
          cnt(Seq("el", "los", "las", "y", "es")).as("es"))
        .select(col("doc_id"),
          when(col("en") >= col("de") && col("en") >= col("fr") && col("en") >= col("es"), "en")
            .when(col("de") >= col("fr") && col("de") >= col("es"), "de")
            .when(col("fr") >= col("es"), "fr")
            .otherwise("es").as("vote"))
      val perDocW = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      val rankW = perDocW.orderBy(col("n").desc,
        when(col("vote") === "en", 0).when(col("vote") === "de", 1)
          .when(col("vote") === "fr", 2).otherwise(3))
      val dom = votes.groupBy("doc_id", "vote").agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(rankW))
        .withColumn("n_langs", count(lit(1)).over(perDocW))
        .withColumn("n_sents", sum("n").over(perDocW))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("vote").as("dominant"),
          col("n_langs"), col("n_sents"))
      docs.select(col("doc_id")).join(dom, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("dominant"), lit("none")).as("dominant"),
          coalesce(col("n_langs"), lit(0L)).cast("long").as("n_langs"),
          coalesce(col("n_sents"), lit(0L)).cast("long").as("n_sents"),
          (coalesce(col("n_langs"), lit(0L)) > 1).as("mixed"))
    },

    // ---- quota-mix EXECUTOR (d50): the selection step that turns d32's
    // temperature weights into an actual per-language document pick —
    // the DoReMi/Pile mixing execution. Per-lang quota = B·w_l / Σw
    // with B = 40% of the corpus and w_l = floor(sqrt(n_l · 10^6))
    // (α = 1/2 resampling; sqrt of an exact integer is correctly-
    // rounded IEEE and the floor makes the weight a BIGINT, so the
    // normalizer is an exact integer sum — no float Σ to disagree on,
    // the d32 lesson). Within each language keep the quota docs by
    // (n_chars DESC, doc_id ASC).
    //
    // Scale shape: the oracle's per-lang row_number runs every doc of a
    // language through one partition — the d29/d36 trap. The engine
    // instead selects via the d39 histogram discipline: a (lang,
    // n_chars) class-count table (one row-scale aggregate with map-side
    // combine), an exclusive running sum over that AGGREGATE-SIZED
    // table giving each class's start rank, a broadcast join back, and
    // a within-class doc_id rank whose window partitions on (lang,
    // n_chars) — bounded by the tie-class size, never a language. The
    // emitted rnk (class start + in-class rank) equals the oracle's
    // row_number exactly because in-class order is doc_id. ----
    QueryDef("d50_quota_mix",
      """WITH n AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |w AS (SELECT lang, n,
        |        CAST(floor(sqrt(n * 1000000)) AS BIGINT) AS w FROM n),
        |tot AS (SELECT sum(w) AS sw,
        |          (SELECT count(*) * 2 // 5 FROM documents) AS b FROM w),
        |q AS (SELECT lang, n, w, CAST(b * w // sw AS BIGINT) AS quota
        |      FROM w, tot),
        |r AS (SELECT d.doc_id, d.lang, d.n_chars,
        |        row_number() OVER (PARTITION BY d.lang
        |          ORDER BY d.n_chars DESC, d.doc_id) AS rnk
        |      FROM documents d)
        |SELECT r.doc_id, r.lang, CAST(r.rnk AS BIGINT) AS rnk,
        |  q.quota, r.rnk <= q.quota AS kept
        |FROM r JOIN q USING (lang)""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
        .select("doc_id", "lang", "n_chars")
      val perLang = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .withColumn("w", floor(sqrt(col("n") * lit(1000000L))).cast("long"))
      val tot = perLang.agg(sum("w").as("sw"))
        .crossJoin(broadcast(docs.agg(
          expr("count(1) * 2L div 5L").as("b"))))
      val quotas = perLang.crossJoin(broadcast(tot))
        .select(col("lang"), expr("b * w div sw").as("quota"))
      // aggregate-sized (lang, n_chars) class table + exclusive prefix
      val hist = docs.groupBy("lang", "n_chars").agg(count(lit(1)).as("cnt"))
      val byLangDesc = Window.partitionBy("lang")
        .orderBy(col("n_chars").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val classStart = hist.withColumn("above",
        coalesce(sum("cnt").over(byLangDesc), lit(0L)))
      // within-class rank: the window partitions on the TIE CLASS
      val inClass = Window.partitionBy("lang", "n_chars").orderBy("doc_id")
      docs
        .join(broadcast(classStart.select(col("lang"), col("n_chars"),
          col("above"))), Seq("lang", "n_chars"))
        .withColumn("rnk",
          (col("above") + row_number().over(inClass)).cast("long"))
        .join(broadcast(quotas), Seq("lang"))
        .select(col("doc_id"), col("lang"), col("rnk"), col("quota"),
          (col("rnk") <= col("quota")).as("kept"))
    },

    // ---- d53: Gopher-style within-document repetition signals — the
    // two repetition filters of Rae et al.'s quality suite re-expressed
    // on the word-bigram axis: top2_permille (the share of bigram
    // instances claimed by the single most frequent bigram) and
    // dup2_permille (the share of bigram instances whose bigram occurs
    // more than once in the doc). keep = both under corpus-calibrated
    // ceilings (50 / 120 permille — each independently fails ~20%/12%
    // of this corpus at every SF, so the gate has two-sided flow). The
    // threshold compare is exact integer cross-multiplication, not the
    // floored permille, so no div-rounding ambiguity rides the flag.
    // Scale shape: two doc-keyed row-scale aggregations with map-side
    // combine; zero cross-document interaction, zero joins beyond the
    // final doc-keyed stitch. ----
    QueryDef("d53_gopher_repetition",
      """WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tk
        |  FROM documents),
        |g AS (SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
        |  FROM t, unnest(range(1, greatest(len(tk)-1, 0)+1)) r(i)),
        |c AS (SELECT doc_id, g, count(*) AS k FROM g GROUP BY 1, 2),
        |agg AS (SELECT doc_id, CAST(max(k) AS BIGINT) AS top_k,
        |    CAST(sum(CASE WHEN k > 1 THEN k ELSE 0 END) AS BIGINT) AS dup_k,
        |    CAST(sum(k) AS BIGINT) AS n_grams
        |  FROM c GROUP BY doc_id)
        |SELECT d.doc_id,
        |  COALESCE(a.n_grams, 0) AS n_grams,
        |  CAST(COALESCE(a.top_k, 0) * 1000
        |    // greatest(COALESCE(a.n_grams, 0), 1) AS BIGINT) AS top2_permille,
        |  CAST(COALESCE(a.dup_k, 0) * 1000
        |    // greatest(COALESCE(a.n_grams, 0), 1) AS BIGINT) AS dup2_permille,
        |  COALESCE(a.top_k * 1000 <= 50 * a.n_grams
        |       AND a.dup_k * 1000 <= 120 * a.n_grams, true) AS keep
        |FROM documents d LEFT JOIN agg a USING (doc_id)""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val grams = docs.select(col("doc_id"), tokensCol.as("tk"))
        .select(col("doc_id"), explode(expr(
          """CASE WHEN size(tk) < 2 THEN array()
            |ELSE transform(sequence(1, size(tk) - 1),
            |  i -> concat(tk[i-1], ' ', tk[i])) END""".stripMargin)).as("g"))
      val per = grams.groupBy("doc_id", "g").agg(count(lit(1)).as("k"))
        .groupBy("doc_id").agg(max("k").as("top_k"),
          sum(when(col("k") > 1, col("k")).otherwise(0L)).as("dup_k"),
          sum("k").as("n_grams"))
      docs.select("doc_id").join(per, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_grams"), lit(0L)).cast("long").as("n_grams"),
          expr("coalesce(top_k, 0L) * 1000L div greatest(coalesce(n_grams, 0L), 1L)")
            .cast("long").as("top2_permille"),
          expr("coalesce(dup_k, 0L) * 1000L div greatest(coalesce(n_grams, 0L), 1L)")
            .cast("long").as("dup2_permille"),
          coalesce(col("top_k") * 1000 <= col("n_grams") * 50 &&
            col("dup_k") * 1000 <= col("n_grams") * 120, lit(true)).as("keep"))
    },

    // ---- BPE-TOKENIZED sequence packing (d54): d36's packing composed
    // with the REAL tokenizer chain the repo already owns — d22's
    // regex pre-tokenizer and the 4-EPOCH ITERATED merge table
    // (32 merges, bpeIterate; r13 — epoch e ranks pairs on the merged
    // sequences of epochs 1..e-1, so later merges contain earlier
    // merged tokens, PipelineSpec pins it), applied in order — so the
    // pack offsets are in BPE-token space, the unit a dataloader
    // actually consumes. Whitespace-token packing
    // (d36) produces sequence boundaries no dataloader would see:
    // merges shrink each doc by a content-dependent amount, so the two
    // packings diverge on almost every cut point. The merge-table md5
    // rides as data (d28's device): a ranking drift on either engine is
    // a hash mismatch, which pins that BOTH engines packed under the
    // SAME tokenizer. Scale shape: pair counting is one explode + one
    // bounded-vocabulary shuffle; merge application is a zero-shuffle
    // projection; packing is d36's bucketed exclusive prefix sum
    // (aggregate-sized offset table broadcast, bucket-partitioned
    // running sum — never a row-scale global window). ----
    QueryDef("d54_bpe_pack",
      bpeCountSql +
      """,
        |c AS (SELECT doc_id, n_bpe, mtm,
        |        coalesce(sum(n_bpe) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS tok_start
        |      FROM cnt)
        |SELECT doc_id, CAST(n_bpe AS BIGINT) AS n_bpe_tokens,
        |  CAST(tok_start AS BIGINT) AS token_start,
        |  CAST(tok_start // 128 AS BIGINT) AS seq_id,
        |  CAST(tok_start % 128 AS BIGINT) AS seq_offset,
        |  CAST((tok_start + n_bpe - 1) // 128 - tok_start // 128 + 1
        |    AS BIGINT) AS n_seqs,
        |  mtm AS merge_table_md5
        |FROM c""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
      val toks = bpeTokenCounts(s, dir)
        .withColumn("bucket", expr("doc_id div 100L"))
        .persist()
      val offsets = toks.groupBy("bucket").agg(sum("n_bpe").as("btotal"))
        .withColumn("off", coalesce(
          sum("btotal").over(w.orderBy(col("bucket").asc)
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      val byBucket = w.partitionBy("bucket").orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      toks
        .join(broadcast(offsets.select(col("bucket"), col("off"))), Seq("bucket"))
        .withColumn("tok_start",
          (col("off") + coalesce(sum("n_bpe").over(byBucket), lit(0L))).cast("long"))
        .select(col("doc_id"), col("n_bpe").cast("long").as("n_bpe_tokens"),
          col("tok_start").as("token_start"),
          expr("tok_start div 128L").as("seq_id"),
          pmod(col("tok_start"), lit(128L)).as("seq_offset"),
          expr("(tok_start + n_bpe - 1) div 128L - tok_start div 128L + 1")
            .cast("long").as("n_seqs"),
          col("mtm").as("merge_table_md5"))
    },

    // ---- BPE pack MANIFEST (d55): d51's per-(sequence, doc) span table
    // in BPE-token space — for every 128-BPE-token sequence a doc
    // touches, its start offset and span length inside that sequence
    // plus the doc_head/doc_tail attention-boundary flags. This is the
    // table a dataloader's attention masking reads, in the unit it
    // reads it in; PipelineSpec asserts every interior sequence fills
    // to exactly 128 BPE tokens and that spans tile each sequence.
    // Same scale shape as d51 (the manifest adds one bounded sequence
    // explode of <= n_seqs elements per doc). ----
    QueryDef("d55_bpe_manifest",
      bpeCountSql +
      """,
        |c AS (SELECT doc_id, n_bpe, tok_start FROM (
        |        SELECT doc_id, n_bpe,
        |          coalesce(sum(n_bpe) OVER (ORDER BY doc_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |            AS tok_start
        |        FROM cnt) WHERE n_bpe > 0),
        |e AS (SELECT doc_id, n_bpe, tok_start,
        |        unnest(range(CAST(tok_start // 128 AS BIGINT),
        |                     CAST((tok_start + n_bpe - 1) // 128 + 1 AS BIGINT)))
        |          AS seq_id
        |      FROM c)
        |SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
        |  CAST(greatest(tok_start - seq_id*128, 0) AS BIGINT) AS start_in_seq,
        |  CAST(least(tok_start + n_bpe - seq_id*128, 128)
        |    - greatest(tok_start - seq_id*128, 0) AS BIGINT) AS len_in_seq,
        |  seq_id = tok_start // 128 AS doc_head,
        |  seq_id = (tok_start + n_bpe - 1) // 128 AS doc_tail
        |FROM e""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
      val toks = bpeTokenCounts(s, dir)
        .withColumn("bucket", expr("doc_id div 100L"))
        .persist()
      val offsets = toks.groupBy("bucket").agg(sum("n_bpe").as("btotal"))
        .withColumn("off", coalesce(
          sum("btotal").over(w.orderBy(col("bucket").asc)
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
          lit(0L)))
      val byBucket = w.partitionBy("bucket").orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      toks
        .join(broadcast(offsets.select(col("bucket"), col("off"))), Seq("bucket"))
        .withColumn("tok_start",
          (col("off") + coalesce(sum("n_bpe").over(byBucket), lit(0L))).cast("long"))
        .filter(col("n_bpe") > 0)
        .select(col("doc_id"), col("n_bpe"), col("tok_start"),
          explode(expr(
            "sequence(tok_start div 128L, (tok_start + n_bpe - 1) div 128L)"))
            .as("seq_id"))
        .select(col("seq_id"), col("doc_id"),
          greatest(col("tok_start") - col("seq_id") * 128, lit(0L))
            .as("start_in_seq"),
          (least(col("tok_start") + col("n_bpe") - col("seq_id") * 128, lit(128L)) -
            greatest(col("tok_start") - col("seq_id") * 128, lit(0L)))
            .as("len_in_seq"),
          (col("seq_id") === expr("tok_start div 128L")).as("doc_head"),
          (col("seq_id") === expr("(tok_start + n_bpe - 1) div 128L")).as("doc_tail"))
    },

    // ---- d58: TRAINED discriminative-vocabulary language classifier —
    // the supervised counterpart of d03's heuristic lang-id and the
    // token-side counterpart of e21's embedding kNN. Train on
    // doc_id % 3 != 0: the model keeps only LANG-EXCLUSIVE tokens
    // (tokens whose training occurrences are confined to one language)
    // with their counts; classify doc_id % 3 == 0 by
    // argmax_l sum_w c_w(doc) * count(w | l), tie -> lang ascending; a
    // doc touching no discriminative token predicts 'unk'. The
    // restriction is load-bearing, measured: the synthetic corpus's
    // 31-token vocabulary is language-INDEPENDENT, so the unrestricted
    // dot product degenerates to the majority class ('en' on every doc,
    // accuracy = class share) — exclusive-vocab profiles are the
    // smallest trained model with real signal. Flow is PLANTED (the d07
    // device): docs with doc_id % 2 == 0 carry one ' langmark<lang>'
    // tail token, standing in for the lang-distinctive vocabulary a real
    // corpus has organically; marked test docs must classify correctly,
    // unmarked ones fall to 'unk' (both visible in the hashed output —
    // everything is integer counts, no contract flag needed). 100 TB
    // shape: the model is discriminative-vocabulary x languages
    // (aggregate-sized by construction) and BROADCASTS; scoring is one
    // map-side pass over exploded test tokens with partial aggregation —
    // the corpus never shuffles against itself. ----
    QueryDef("d58_centroid_classify",
      """WITH aug AS (
        |  SELECT doc_id, lang,
        |    text || CASE WHEN doc_id % 2 = 0 THEN ' langmark' || lang
        |                 ELSE '' END AS text
        |  FROM documents),
        |tok AS (
        |  SELECT doc_id, lang, unnest(regexp_extract_all(text, '\S+')) AS w
        |  FROM aug),
        |model0 AS (
        |  SELECT lang AS ml, w, count(*) AS cnt FROM tok
        |  WHERE doc_id % 3 <> 0 GROUP BY 1, 2),
        |excl AS (SELECT w FROM model0 GROUP BY w HAVING count(*) = 1),
        |model AS (SELECT ml, w, cnt FROM model0 JOIN excl USING (w)),
        |sc AS (
        |  SELECT t.doc_id, m.ml, sum(m.cnt) AS score
        |  FROM tok t JOIN model m USING (w)
        |  WHERE t.doc_id % 3 = 0 GROUP BY 1, 2),
        |best AS (
        |  SELECT doc_id, ml, score,
        |         row_number() OVER (PARTITION BY doc_id
        |                            ORDER BY score DESC, ml) AS rn
        |  FROM sc)
        |SELECT d.doc_id, d.lang,
        |  coalesce(b.ml, 'unk') AS pred_lang,
        |  CAST(coalesce(b.score, 0) AS BIGINT) AS score,
        |  (d.lang = coalesce(b.ml, 'unk')) AS correct
        |FROM documents d
        |  LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
        |WHERE d.doc_id % 3 = 0""".stripMargin) { (s, dir) =>
      val tok = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(2)) === 0,
              concat(lit(" langmark"), col("lang"))).otherwise(lit("")))
            .as("text"))
        .select(col("doc_id"), col("lang"), explode(tokensCol).as("w"))
      val model0 = tok.filter(pmod(col("doc_id"), lit(3)) =!= 0)
        .groupBy(col("lang").as("ml"), col("w"))
        .agg(count(lit(1)).as("cnt"))
      val excl = model0.groupBy("w").agg(count(lit(1)).as("nl"))
        .filter(col("nl") === 1).select("w")
      val model = model0.join(excl, Seq("w"))
      val sc = tok.filter(pmod(col("doc_id"), lit(3)) === 0)
        .join(broadcast(model), Seq("w"))
        .groupBy("doc_id", "ml").agg(sum("cnt").as("score"))
      val best = sc.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
            .orderBy(col("score").desc, col("ml").asc)))
        .filter(col("rn") === 1).select("doc_id", "ml", "score")
      Tables.load(s, dir, "documents")
        .filter(pmod(col("doc_id"), lit(3)) === 0)
        .select("doc_id", "lang")
        .join(best, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("ml"), lit("unk")).as("pred_lang"),
          coalesce(col("score"), lit(0L)).cast("long").as("score"),
          (col("lang") === coalesce(col("ml"), lit("unk"))).as("correct"))
    }
  )

  /** ITERATED BPE (r13, d28 v2): run the merge loop `epochs` rounds of 8
    * merges each, where round e counts adjacent pairs on the sequences
    * AFTER rounds 1..e-1's merges applied — so later rounds merge tokens
    * MADE by earlier rounds, the canonical-BPE property a single-epoch
    * table lacks (packed boundaries converge toward a real tokenizer's).
    * Ranking stays (count DESC, pair ASC), unique, so both engines build
    * the SAME table; a pair left unmerged by the non-overlapping replace
    * may legitimately re-rank in a later round. Each round's sequences
    * are EAGERLY localCheckpointed (the d10 fixpoint discipline — an
    * unsevered 4-round replace chain re-analyzes per consumer). Returns
    * (per-doc boundary-marked sequences after all rounds, per-round
    * 1-row merge-list frames). Scale shape per round: one explode + one
    * bounded-vocabulary shuffle + a zero-shuffle replace projection. */
  private[operators] def bpeIterate(s: SparkSession, dir: String,
      epochs: Int): (DataFrame, Seq[DataFrame]) = {
    val tok = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        concat(col("text"), lit(" It's v"),
          (col("doc_id") % 10).cast("string"), lit(".2, don't-stop #"),
          col("doc_id").cast("string"), lit(" (you'll see 42%)!")).as("t"))
      .select(col("doc_id"),
        graft.functions.TextStats.bpePreTokensCol(col("t")).as("bt"))
    // r19: the pair extraction and the merge application are native
    // expressions (bpe_seq_pairs / bpe_apply_merges == the split+slice+
    // transform and aggregate/replace HOF chains, NativeExprParitySpec),
    // and the per-round checkpoints are LAZY — the plan truncation that
    // motivated them (d10 discipline) is identical, but materialization
    // folds into the next round's pair-count job instead of a dedicated
    // sequential driver-sync job per round.
    var seqs = tok.select(col("doc_id"),
      expr("concat(chr(1), concat_ws(chr(1), bt), chr(1))").as("ms"))
      .localCheckpoint(false)
    val ems = (1 to epochs).map { _ =>
      val top8 = seqs
        .select(explode(
          graft.functions.TextStats.bpeSeqPairsCol(col("ms"))).as("m"))
        .groupBy("m").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("m"))
        .limit(8)
      val em = top8.agg(expr(
        "transform(sort_array(collect_list(struct(-cnt AS nc, m AS m))), p -> p.m)")
        .as("em")).localCheckpoint(false)
      seqs = seqs.crossJoin(broadcast(em))
        .withColumn("ms", graft.functions.TextStats.bpeApplyMergesCol(
          col("ms"), col("em")))
        .select(col("doc_id"), col("ms"))
        .localCheckpoint(false)
      em
    }
    (seqs, ems)
  }

  /** Per-doc BPE token counts under the 4-epoch ITERATED merge table
    * (32 merges, [[bpeIterate]]) over d22's pre-tokenizer. Returns
    * (doc_id, n_bpe, mtm) where mtm is the md5 of the full 32-entry
    * table in application order (the tokenizer identity riding as
    * data). The merge lists reach each row as 1-row broadcasts (d16
    * pattern). */
  private def bpeTokenCounts(s: SparkSession, dir: String): DataFrame = {
    val (seqs, ems) = bpeIterate(s, dir, 4)
    val mergesAll = ems.zipWithIndex
      .map { case (df, i) => df.select(col("em").as(s"em$i")) }
      .reduce(_.crossJoin(_))
      .select(expr(s"concat(${ems.indices.map("em" + _).mkString(",")})")
        .as("merges"))
    seqs.crossJoin(broadcast(mergesAll))
      .select(col("doc_id"),
        (graft.functions.TextStats.asciiSetCountCol(col("ms"), "\u0001")
          - 1).cast("long").as("n_bpe"),
        md5(concat_ws("\u0002", col("merges"))).as("mtm"))
  }

  /** One iterated-BPE epoch's oracle CTEs: adjacent-pair counts on the
    * PREVIOUS epoch's merged sequences, the top-8 merge list, and the
    * sequences after applying it — the DuckDB replay of one
    * [[bpeIterate]] round. Unrolled + MATERIALIZED per the bounded-
    * recursion discipline (plain CTEs inline exponentially). */
  private def bpeEpochSql(e: Int): String = {
    val prev = s"s${e - 1}"
    s"""
       |p$e AS MATERIALIZED (
       |  SELECT unnest(list_transform(
       |           range(2, len(string_split(ms, chr(1))) - 1),
       |           i -> string_split(ms, chr(1))[CAST(i AS INT)] || chr(1) ||
       |                string_split(ms, chr(1))[CAST(i+1 AS INT)])) AS m
       |  FROM $prev),
       |t$e AS MATERIALIZED (
       |  SELECT m, count(*) AS cnt FROM p$e GROUP BY m
       |  ORDER BY cnt DESC, m LIMIT 8),
       |m$e AS MATERIALIZED (SELECT list(m ORDER BY cnt DESC, m) AS em FROM t$e),
       |s$e AS MATERIALIZED (
       |  SELECT doc_id, list_reduce(list_prepend(ms, em),
       |    (acc, mm) -> replace(acc, chr(1) || mm || chr(1),
       |                 chr(1) || replace(mm, chr(1), '') || chr(1))) AS ms
       |  FROM $prev, m$e)""".stripMargin
  }

  /** Shared oracle prefix for d54/d55: d22's aug/tok CTEs + the FOUR
    * unrolled iterated-BPE epochs + the per-doc merged count under the
    * full 32-merge table. MATERIALIZED where referenced via multiple
    * downstream CTEs (DuckDB inlines plain CTEs). */
  // lazy: referenced by `defs` above, which initializes first
  private lazy val bpeCountSql: String =
    """WITH aug AS MATERIALIZED (
      |  SELECT doc_id,
      |    text || ' It''s v' || (doc_id % 10) || '.2, don''t-stop #' ||
      |      doc_id || ' (you''ll see 42%)!' AS t
      |  FROM documents),
      |tok AS MATERIALIZED (
      |  SELECT doc_id,
      |    regexp_extract_all(t,
      |      '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s'']+|\s+') AS bt
      |  FROM aug),
      |s0 AS MATERIALIZED (
      |  SELECT doc_id, chr(1) || array_to_string(bt, chr(1)) || chr(1) AS ms
      |  FROM tok),""".stripMargin +
    (1 to 4).map(bpeEpochSql).mkString(",") +
    """,
      |mall AS MATERIALIZED (
      |  SELECT a.em || b.em || c.em || d.em AS merges
      |  FROM m1 a, m2 b, m3 c, m4 d),
      |cnt AS MATERIALIZED (
      |  SELECT doc_id, len(string_split(ms, chr(1))) - 2 AS n_bpe,
      |    (SELECT md5(array_to_string(merges, chr(2))) FROM mall) AS mtm
      |  FROM s4)""".stripMargin
}
