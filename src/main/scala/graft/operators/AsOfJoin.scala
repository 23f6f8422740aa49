package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, attach the latest right row with
  * `right.ts <= left.ts` within the same partition key.
  *
  * Implemented the shuffle-minimal Spark way: tag both sides, union, and
  * compute `last(right_payload, ignoreNulls) OVER (PARTITION BY key ORDER BY
  * ts, side)` — a single shuffle on the key instead of a quadratic
  * inequality join. At equal timestamps the right row sorts first (side 0 <
  * side 1), giving inclusive at-or-before semantics, which matches DuckDB's
  * `ASOF JOIN ... ON l.ts >= r.ts`.
  *
  * Scale note: one hash-partition shuffle by key + an in-partition sort.
  * At 100 TB this is the same cost shape as any windowed aggregation; skewed
  * keys can be salted upstream because correctness only needs per-key order.
  */
object AsOfJoin {

  /** @param left        probe side
    * @param right       reference side (its payload columns get attached)
    * @param key         equality key column name (same name on both sides)
    * @param ts          event-time column name (same name on both sides)
    * @param rightPayload right-side columns to carry (renamed as given)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      rightPayload: Seq[(String, String)]): DataFrame = {
    val payloadStruct = struct(
      col(ts).as("__r_ts") +: rightPayload.map { case (c, a) => col(c).as(a) }: _*)
    val rTagged = right.select(
      col(key), col(ts), payloadStruct.as("__r"), lit(0).as("__side"))
    val leftCols = left.columns.toSeq
    val lTagged = left.select(
      (col(key) +: col(ts) +: lit(null).cast(rTagged.schema("__r").dataType).as("__r")
        +: lit(1).as("__side") +: leftCols.filterNot(c => c == key || c == ts)
        .map(col): _*))
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.union(
      rTagged.select(lTagged.columns.toIndexedSeq.map(c =>
        if (rTagged.columns.contains(c)) col(c)
        else lit(null).cast(lTagged.schema(c).dataType).as(c)): _*))
      .withColumn("__matched", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__r", "__side")
  }
}
