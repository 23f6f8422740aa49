package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in the SURVEY.md §2 inventory is declared here as a named
  * query over the testdata tables, each (where SQL-expressible) paired with
  * a DuckDB oracle the driver uses as the correctness gate.
  */
object SparkEntry {

  /** All operator definitions, in gate order. */
  def allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ EventQueries.defs ++ CacheQueries.defs ++
      TextQueries.defs ++ DedupQueries.defs ++ PipelineQueries.defs ++
      VectorQueries.defs ++
      MultimodalQueries.defs ++ StreamingQueries.defs ++
      FingerprintQueries.defs ++ GraphQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
