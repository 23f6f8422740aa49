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


  /** Word 3-gram shingles, 64-bit hashed; empty/short-doc safe. Native
    * codegen expression (one loop per doc); bit-identical to the HOF
    * formulation xxhash64(concat(t_i, ' ', t_i+1, ' ', t_i+2)) over
    * array_distinct (NativeExprParitySpec). The token array must be
    * pre-materialized in column `__tok` — inlining the regexp would
    * re-run it per sequence element (O(tokens^2) parses). */
  def shingleHashes: Column =
    graft.functions.TextHashes.shingleHash64Col(col("text"), col("__tok"), 3)

  /** Tokenization column for [[shingleHashes]] — the native byte-scan
    * loop, row-identical to regexp_extract_all(text,'\S+',0)
    * (NativeExprParitySpec). */
  def tokenCol: Column = graft.functions.TextStats.wsTokensCol(col("text"))

  /** documents(doc_id, text) -> (doc_id, sig array<long>[NumPerms]).
    *
    * Shape: a pure per-row projection — the native [[graft.functions
    * .TextHashes.MinHashSig]] expression loops the shingle array once and
    * emits all NumPerms minima inside whole-stage codegen. Zero shuffle
    * (the round-1 explode + 64 min-aggregates shape was map-side combined
    * but still paid an exchange + hash-aggregation pass per doc); values
    * are bit-identical because the expression reuses Spark's XXH64 fold.
    * At 100 TB signature generation is now bounded by the scan. */
  def signatures(docs: DataFrame): DataFrame =
    docs
      .withColumn("__tok", tokenCol)
      .select(col("doc_id"),
        graft.functions.TextHashes.minhashSigCol(shingleHashes, NumPerms).as("sig"))

  /** LSH candidate pairs: explode signatures into (band, bandHash) keys,
    * equi-join per bucket, dedupe pairs, attach the signature-agreement
    * Jaccard estimate.
    *
    * Scale shape: the signature table is persisted so the expensive
    * explode + 64-min pipeline runs exactly once (both join branches and
    * both re-attach probes read the cache). The band join and the pair
    * dedup carry only 8-byte ids — the 512-byte signature arrays are
    * re-attached AFTER dedup, so candidate-join shuffle volume is
    * ~Bands×24 B/doc instead of ~Bands×550 B/doc. */
  /** (doc_id, band, bh) band-key table — the LSH blocking axis, shared
    * by the symmetric candidate join and d49's asymmetric incremental
    * probe (new-side keys against a stored band index). */
  def bandedKeys(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map { bIdx =>
      struct(lit(bIdx).as("band"),
        xxhash64(concat_ws(",",
          (0 until RowsPerBand).map(r =>
            col("sig").getItem(bIdx * RowsPerBand + r)): _*)).as("bh"))
    }
    sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.bh").as("bh"))
  }

  def lshCandidates(sigs: DataFrame): DataFrame = {
    val s = sigs.persist()
    val banded = bandedKeys(s)
    val a = banded.select(col("band"), col("bh"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("bh"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .join(s.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(s.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est_jaccard",
        round(expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, " +
          s"(acc, v) -> acc + v) / ${NumPerms}.0D"), 3))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
  }

  /** SimHash table: docs(doc_id, text, carry...) -> (doc_id, carry..., fp).
    * Per-token 64-bit hashes vote ±1 on each of 64 bits; the sign of each
    * tally becomes that bit — computed per-row by the native
    * [[graft.functions.TextHashes.SimHash64]] expression (one loop over
    * the token array inside codegen; no explode, no aggregation, no
    * shuffle — the round-1 64-conditional-sum shape is gone). Token-less
    * docs are filtered out, matching the old groupBy-over-exploded
    * semantics where they produced no row. */
  def simhashTable(docs: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val keys = col("doc_id") +: carry.map(col)
    docs
      .withColumn("__tok", tokenCol)
      .filter(size(col("__tok")) > 0)
      .select(keys :+ graft.functions.TextHashes.simhash64Col(col("__tok")).as("fp"): _*)
  }

  /** SimHash near-dup search radius (max hamming distance). */
  val MaxHamming = 8

  /** Pigeonhole band count: with `MaxHamming + 1` disjoint bands, any two
    * fingerprints within hamming `MaxHamming` agree exactly on at least one
    * band (8 differing bits can touch at most 8 of the 9 bands). */
  val SimHashBands: Int = MaxHamming + 1

  /** Bit layout of the 9 pigeonhole bands over the 64-bit fingerprint:
    * (offset, width) — one 8-bit band plus eight 7-bit bands. */
  val simhashBandLayout: Seq[(Int, Int)] = {
    val widths = 8 +: Seq.fill(SimHashBands - 1)(7) // 8 + 8*7 = 64
    widths.scanLeft(0)(_ + _).zip(widths)
  }

  /** SimHash candidate pairs within hamming <= [[MaxHamming]], same-lang.
    *
    * Scale shape (the 100 TB fix for the naive same-lang self-join, which
    * is n²/|langs| with a maximally skewed 4-value shuffle key): explode
    * each fingerprint into its 9 pigeonhole bands and equi-join on
    * (lang, band, band_value) — a hash-partitioned join whose fan-in is
    * the band collision rate. The exact `bit_count(fp_a ^ fp_b)` test then
    * runs on candidates only; the pigeonhole guarantee makes the result
    * identical to the exhaustive comparison. The fingerprint table is
    * persisted so the explode + 64-sum vote pipeline runs once. */
  def simhashCandidates(docs: DataFrame): DataFrame = {
    val t = simhashTable(docs, carry = Seq("lang")).persist()
    val bandCols = simhashBandLayout.zipWithIndex.map { case ((off, width), i) =>
      struct(lit(i).as("band"),
        expr(s"shiftrightunsigned(fp, $off) & ${(1L << width) - 1}L").as("bv"))
    }
    val banded = t
      .select(col("lang"), col("doc_id"), col("fp"),
        explode(array(bandCols: _*)).as("b"))
      .select(col("lang"), col("doc_id"), col("fp"),
        col("b.band").as("band"), col("b.bv").as("bv"))
    val a = banded.select(col("lang"), col("band"), col("bv"),
      col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = banded.select(col("lang"), col("band"), col("bv"),
      col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    a.join(b, Seq("lang", "band", "bv"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("bit_count(fp_a ^ fp_b)").cast("int"))
      .filter(col("hamming") <= MaxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .dropDuplicates("doc_a", "doc_b")
  }
}
