package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator/query in the engine's correctness inventory (SURVEY.md §2).
  *
  * @param name   stable key, used by Verify/Bench and the driver gate
  * @param fn     Spark-side implementation (session, sf-dir) => result
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables (bare table names); None for ops that are
  *               not SQL-expressible (driver falls back to rows-only check)
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
