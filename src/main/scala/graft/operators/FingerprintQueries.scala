package graft.operators

import org.apache.spark.sql.functions._
import graft.functions.Fingerprint64

/** Gate entries for the native fingerprint expression and the salted
  * (skew-resistant) aggregation pattern. */
object FingerprintQueries {

  val defs: Seq[QueryDef] = Seq(

    // Native codegen'd FNV-1a fingerprint over documents (rows-only: the
    // hash is our own spec; Fingerprint64Spec pins it against a reference
    // implementation and DuckDB can't express the byte loop).
    QueryDef.noOracle("d08_fingerprint64") { (s, dir) =>
      Fingerprint64.register(s)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          Fingerprint64.fingerprint64(col("text")).as("fp"),
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy(Fingerprint64.fingerprint64(col("text"))))
            .as("n_same_fp"))
    },

    // Salted two-phase aggregation: the skew pattern for hot keys at
    // scale. l_returnflag has only 3 values — a direct groupBy lands all
    // 600k rows on 3 reducers; salting fans the partial aggregation over
    // salt*keys reducers, then the cheap final phase merges 16 rows/key.
    // Semantically identical to a plain GROUP BY, which is the oracle.
    QueryDef("q34_salted_agg",
      """SELECT l_returnflag, round(sum(l_extendedprice),3) AS total,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val salted = Tables.load(s, dir, "lineitem")
        .withColumn("__salt", (rand(seed = 42) * 16).cast("int"))
        .groupBy(col("l_returnflag"), col("__salt"))
        .agg(sum("l_extendedprice").as("partial_total"),
          count(lit(1)).as("partial_n"))
      salted.groupBy("l_returnflag")
        .agg(round(sum("partial_total"), 3).as("total"),
          sum("partial_n").as("n"))
    }
  )
}
