package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection at scale: MinHash + LSH banding and SimHash.
  *
  * Design point (100 TB): never compare all pairs. Each document maps to a
  * fixed-width signature with per-row expressions (codegen'd, no UDF, no
  * shuffle); candidate generation is an equi-join on (band, bandHash) —
  * a hash-partitioned shuffle whose fan-in is the collision rate, not n².
  * Verification (signature agreement / hamming distance) runs only on
  * candidates.
  *
  * MinHash math: permutation i is h_i(x) = xxhash64(i, x) — a full-
  * avalanche rehash per permutation index. (A linear (a*x+b) mod p map is
  * NOT enough here: with p = 2^61-1 and 63-bit products the map wraps only
  * a few times, stays piecewise monotonic, and every "permutation" picks
  * the same minimal shingle — signatures then collide for any two docs
  * sharing their smallest-hash shingle.) The permutation index is a plain
  * literal, so every executor agrees without broadcasting state.
  */
object Dedup {
  val NumPerms = 64
  val Bands = 16
  val RowsPerBand: Int = NumPerms / Bands // 4

  private val tokens = "regexp_extract_all(text, '\\\\S+', 0)"

  /** Word 3-gram shingles, 64-bit hashed; empty/short-doc safe. */
  def shingleHashes: Column = expr(
    s"""CASE WHEN size($tokens) < 3 THEN array(xxhash64(text))
       |ELSE array_distinct(transform(sequence(1, size($tokens) - 2),
       |  i -> xxhash64(concat(element_at($tokens, i), ' ',
       |                       element_at($tokens, i + 1), ' ',
       |                       element_at($tokens, i + 2))))) END""".stripMargin)

  /** documents(doc_id, text) -> (doc_id, sig array<long>[NumPerms]). */
  def signatures(docs: DataFrame): DataFrame = {
    val sigExprs = (0 until NumPerms).map { i =>
      expr(s"array_min(transform(__sh, h -> xxhash64(${i}L, h)))")
    }
    docs.withColumn("__sh", shingleHashes)
      .select(col("doc_id"), array(sigExprs: _*).as("sig"))
  }

  /** LSH candidate pairs: explode signatures into (band, bandHash) keys,
    * equi-join per bucket, dedupe pairs, attach the signature-agreement
    * Jaccard estimate. */
  def lshCandidates(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map { bIdx =>
      struct(lit(bIdx).as("band"),
        xxhash64(concat_ws(",",
          (0 until RowsPerBand).map(r =>
            col("sig").getItem(bIdx * RowsPerBand + r)): _*)).as("bh"))
    }
    val banded = sigs
      .select(col("doc_id"), col("sig"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("sig"), col("b.band").as("band"), col("b.bh").as("bh"))
    val a = banded.select(col("band"), col("bh"), col("doc_id").as("doc_a"),
      col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bh"), col("doc_id").as("doc_b"),
      col("sig").as("sig_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("est_jaccard",
        round(expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, " +
          s"(acc, v) -> acc + v) / ${NumPerms}.0D"), 3))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
  }

  /** SimHash 64-bit fingerprint: per-token hashes vote ±1 on each bit;
    * the sign of each tally becomes that bit. Pure expressions. */
  def simhash(textCol: String = "text"): Column = {
    val toks = s"regexp_extract_all($textCol, '\\\\S+', 0)"
    expr(
      s"""aggregate(
         |  transform(sequence(0, 63), bit ->
         |    IF(aggregate(transform($toks, t -> xxhash64(t)), 0L,
         |         (acc, h) -> acc + IF((h >> bit) & 1 = 1, 1L, -1L)) > 0, 1L, 0L)
         |  ),
         |  named_struct('acc', 0L, 'i', 0),
         |  (s, bit) -> named_struct('acc', s.acc | shiftleft(bit, s.i), 'i', s.i + 1),
         |  s -> s.acc)""".stripMargin)
  }
}
