package graft.operators

import org.apache.spark.sql.functions._

/** Gate entries for the near-dup operators. The signatures themselves are
  * not SQL-expressible in the oracle dialect, so the emitted rows follow
  * the q31/q39 contract: every emitted CELL is something DuckDB computes
  * independently (exact shingle-Jaccard pairs, planted-twin pair lists),
  * and the engine-specific sketch results ride as in-band columns the
  * oracle states the expected value of — the hash gate then fails on any
  * recall/precision/estimate defect. Deeper engine-side exactness
  * (banded == exhaustive, est-vs-exact distributions) stays in
  * DedupSpec/PipelineSpec. */
object DedupQueries {

  val defs: Seq[QueryDef] = Seq(

    // MinHash+LSH over the same-(lang,source) co-shingle pair universe
    // (the d05 oracle set — DuckDB recomputes it exactly). For each pair,
    // `lsh_candidate` is the ACTUAL banded-join membership; the oracle
    // asserts it equals `jaccard >= 0.5` — on this corpus the Jaccard
    // distribution is bimodal (<0.1 / >=0.8), the 16x4 banding catches
    // every >=0.8 pair and none below 0.1 (verified at sf0.001/0.01/0.1),
    // so both recall misses AND band-collision false positives
    // hash-mismatch. `est_in_band` pins |signature estimate - exact| <=
    // 0.15 on candidates (observed max 0.03; ~4 sigma for 64 perms).
    QueryDef("d06_dedup_minhash_lsh", TextQueries.jaccardOracle(
      """SELECT doc_a, doc_b, jaccard,
        | jaccard >= 0.5 AS lsh_candidate,
        | true AS est_in_band
        |FROM pairs""".stripMargin)) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val cands = Dedup.lshCandidates(Dedup.signatures(docs))
      TextQueries.jaccardPairs(s, dir)
        .join(cands, Seq("doc_a", "doc_b"), "left")
        .select(col("doc_a"), col("doc_b"), col("jaccard"),
          col("est_jaccard").isNotNull.as("lsh_candidate"),
          coalesce(abs(col("est_jaccard") - col("jaccard")) <= 0.15, lit(true))
            .as("est_in_band"))
    },

    // SimHash via planted twins: union the corpus with an id-shifted copy
    // of itself, run the full pigeonhole-banded candidate join, and emit
    // one row per planted (doc, twin) pair with the ACTUAL hamming the
    // engine measured (-1 if the pair was missed). Identical token
    // streams give identical fingerprints, so hamming is 0 and pigeonhole
    // capture is guaranteed by construction — the oracle's literal 0
    // makes any banding/fingerprint defect a hash mismatch. Token-less
    // docs produce no fingerprint on either side. Near-dup (hamming 1-8)
    // behavior over the real corpus is covered by DedupSpec's
    // banded == exhaustive sweep, which no SQL oracle can express.
    QueryDef("d07_dedup_simhash",
      """WITH d AS (SELECT doc_id, lang FROM documents
        |           WHERE len(regexp_extract_all(text, '\S+')) > 0)
        |SELECT CAST(doc_id AS BIGINT) AS doc_a,
        |  CAST(doc_id + 1000000 AS BIGINT) AS doc_b, lang,
        |  CAST(0 AS BIGINT) AS hamming
        |FROM d""".stripMargin) { (s, dir) =>
      val offset = 1000000L
      val docs = Tables.load(s, dir, "documents")
        .select("doc_id", "lang", "text")
      val twins = docs.withColumn("doc_id", col("doc_id") + offset)
      val cands = Dedup.simhashCandidates(docs.unionByName(twins))
      docs
        .filter(size(expr("regexp_extract_all(text, '\\\\S+', 0)")) > 0)
        .select(col("doc_id").cast("long").as("doc_a"),
          (col("doc_id") + offset).cast("long").as("doc_b"), col("lang"))
        .join(cands, Seq("doc_a", "doc_b"), "left")
        .select(col("doc_a"), col("doc_b"), col("lang"),
          coalesce(col("hamming"), lit(-1)).cast("long").as("hamming"))
    },

    // ---- substring/rolling-window dedup (the Lee et al. "Deduplicating
    // Training Data Makes Language Models Better" shape, approximated at
    // window granularity): every doc is decomposed into its distinct
    // 8-token sliding windows (stride 1) by the same one-loop-per-doc
    // codegen expression the shingle ops use — zero shuffle to produce,
    // no gram strings materialized. A window is "duplicated" if the same
    // 8-token substring first occurs in a lower doc_id (first-occurrence
    // keep). Per doc we emit window counts, the duplication fraction in
    // exact integer permille (n_dup*1000 div n_win — no double ratio, no
    // rounding-boundary flips), and the keep decision (< 50% duplicated).
    //
    // Scale shape: ONE shuffle on the 8-byte window hash (min-over-window
    // computes first occurrence without a groupBy+self-join re-shuffle),
    // one on doc_id for the per-doc rollup. Never pairwise: a window
    // shared by a million docs costs one hot hash partition, not 10^12
    // pairs. The oracle recomputes everything from the window STRINGS in
    // DuckDB — the equi-join on xxhash64(window) is equivalent to string
    // equality modulo 64-bit collisions (the d05 precedent). ----
    QueryDef("d21_window_dedup",
      """WITH t AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS tk FROM documents),
        |w AS (SELECT doc_id,
        |   list_distinct(list_transform(range(1, greatest(len(tk)-7, 0)+1),
        |     i -> concat_ws(' ', tk[i],tk[i+1],tk[i+2],tk[i+3],tk[i+4],tk[i+5],tk[i+6],tk[i+7]))) AS wins
        | FROM t),
        |e AS (SELECT doc_id, unnest(wins) AS win FROM w),
        |k AS (SELECT win, min(doc_id) AS first_doc FROM e GROUP BY win),
        |p AS (SELECT e.doc_id, count(*) AS n_win,
        |        sum(CASE WHEN e.doc_id > k.first_doc THEN 1 ELSE 0 END) AS n_dup
        |      FROM e JOIN k USING (win) GROUP BY e.doc_id)
        |SELECT d.doc_id,
        |  CAST(COALESCE(p.n_win, 0) AS BIGINT) AS n_win,
        |  CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup,
        |  CAST(COALESCE(p.n_dup, 0) * 1000 // greatest(COALESCE(p.n_win, 0), 1) AS BIGINT)
        |    AS dup_permille,
        |  COALESCE(p.n_dup * 2 < p.n_win, true) AS keep
        |FROM documents d LEFT JOIN p USING (doc_id)""".stripMargin) { (s, dir) =>
      val W = 8
      val docs = Tables.load(s, dir, "documents")
      val exploded = docs
        .withColumn("__tok", Dedup.tokenCol)
        .select(col("doc_id"),
          explode(graft.functions.TextHashes.shingleHash64Col(
            col("text"), col("__tok"), W, emptyIfShort = true)).as("wh"))
      val byHash = org.apache.spark.sql.expressions.Window.partitionBy("wh")
      val perDoc = exploded
        .withColumn("first_doc", min("doc_id").over(byHash))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_win"),
          sum(when(col("doc_id") > col("first_doc"), 1L).otherwise(0L)).as("n_dup"))
      docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_win"), lit(0L)).cast("long").as("n_win"),
          coalesce(col("n_dup"), lit(0L)).cast("long").as("n_dup"))
        .withColumn("dup_permille",
          expr("n_dup * 1000L div greatest(n_win, 1L)").cast("long"))
        .withColumn("keep",
          when(col("n_win") === 0L, lit(true))
            .otherwise(col("n_dup") * 2 < col("n_win")))
    },

    // ---- embedding-cosine near-dup: EXACT pairs above a cosine
    // threshold within a label block (the d05 blocked-join pattern: the
    // closed label vocabulary bounds each quadratic block). This is the
    // exact/oracle-checkable variant; at open-domain scale the candidate
    // generator swaps to the SRP-LSH (e04) or IVF (e06) bucket join with
    // the same cosine verify. Cosine is the native codegen expression —
    // identical fold order to the oracle's list_sum. ----
    QueryDef("d09_embed_neardup",
      """WITH s AS (
        |  SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
        |    list_sum(list_transform(range(1, 65),
        |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT label, id_a, id_b, round(cos, 4) AS cos_sim
        |FROM s WHERE cos >= 0.35""".stripMargin) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
        .select(col("label"), col("vec_id"), col("embedding"))
      val a = e.select(col("label"), col("vec_id").as("id_a"),
        col("embedding").as("emb_a"))
      val b = e.select(col("label").as("label_b"), col("vec_id").as("id_b"),
        col("embedding").as("emb_b"))
      a.join(b, col("label") === col("label_b") && col("id_a") < col("id_b"))
        .withColumn("cos",
          graft.functions.VectorOps.cosineSim(col("emb_a"), col("emb_b")))
        .filter(col("cos") >= 0.35)
        .select(col("label"), col("id_a"), col("id_b"),
          round(col("cos"), 4).as("cos_sim"))
    }
  )
}
