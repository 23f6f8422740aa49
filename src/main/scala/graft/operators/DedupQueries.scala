package graft.operators

import org.apache.spark.sql.functions._

/** Gate entries for the near-dup operators (not SQL-expressible in the
  * oracle dialect — LSH banding and bit-vote fingerprints — so they get
  * rows-only driver checks; exactness is covered by DedupSpec, which
  * cross-checks the MinHash estimate against exact shingle Jaccard). */
object DedupQueries {

  val defs: Seq[QueryDef] = Seq(

    QueryDef.noOracle("d06_dedup_minhash_lsh") { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      Dedup.lshCandidates(Dedup.signatures(docs))
        .filter(col("est_jaccard") >= 0.2)
        .orderBy(col("doc_a"), col("doc_b"))
    },

    QueryDef.noOracle("d07_dedup_simhash") { (s, dir) =>
      // near-dup candidates: same lang, hamming <= 8, via pigeonhole
      // banding (equi-join on (lang, band, band_value), never n²/lang)
      Dedup.simhashCandidates(Tables.load(s, dir, "documents"))
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
