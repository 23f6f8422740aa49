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
    }
  )
}
