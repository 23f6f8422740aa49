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
      val docs = Dedup.simhashTable(
        Tables.load(s, dir, "documents"), carry = Seq("lang"))
      // near-dup candidates: same lang block, hamming <= 8
      val a = docs.select(col("lang"), col("doc_id").as("doc_a"), col("fp").as("fp_a"))
      val b = docs.select(col("lang").as("lang_b"), col("doc_id").as("doc_b"), col("fp").as("fp_b"))
      a.join(b, col("lang") === col("lang_b") && col("doc_a") < col("doc_b"))
        .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)"))
        .filter(col("hamming") <= 8)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    }
  )
}
