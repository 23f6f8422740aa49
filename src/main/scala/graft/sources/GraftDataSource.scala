package graft.sources

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.FileFormat
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.FileDataSourceV2
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder, ParquetTable}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 caching parquet source — `spark.read.format("graft")` —
  * the idiomatic Spark path of SURVEY §7 phase 7 (the FS-wrapper under
  * `graft://` paths remains for engine parity). Delegates all scan
  * machinery to Spark's ParquetTable/ParquetScanBuilder (vectorized reader,
  * filter + aggregate pushdown, nested-schema pruning all intact) while:
  *
  *  - rewriting table paths onto the `graft://` scheme so every read goes
  *    through the executor block cache;
  *  - applying projected-column cache-admission control: the reference
  *    only caches scans that select at least N columns
  *    (CacheUtil.minColumnsSelected, rubix-spi CacheUtil.java:385-388) —
  *    here the pruned schema width is known exactly at build() time, and
  *    the decision ships to executors inside the scan's broadcast Hadoop
  *    conf (`graft.cache.enabled=false`), cluster-correct with
  *    `fs.graft.impl.disable.cache=true`.
  */
class GraftDataSource extends FileDataSourceV2 {
  override def fallbackFileFormat: Class[_ <: FileFormat] =
    classOf[ParquetFileFormat]
  override def shortName(): String = "graft"

  private def toGraft(p: String): String = {
    val u = java.net.URI.create(p.replace(" ", "%20"))
    val scheme = Option(u.getScheme).getOrElse("file")
    if (scheme == "graft") p
    else s"graft://${Option(u.getPath).getOrElse(p)}"
  }

  private def makeTable(options: CaseInsensitiveStringMap,
      userSchema: Option[StructType]): Table = {
    val paths = getPaths(options).map(toGraft)
    val tableName = "graft " + paths.mkString(",")
    val delegate = ParquetTable(tableName, sparkSession,
      getOptionsWithoutPaths(options), paths, userSchema,
      classOf[ParquetFileFormat])
    val minCols = options.getInt("graft.cache.min.projected.columns",
      sparkSession.sessionState.newHadoopConf()
        .getInt(graft.cache.CacheConfig.MinColumnsKey, 0))
    new GraftTable(delegate, minCols)
  }

  override def getTable(options: CaseInsensitiveStringMap): Table =
    makeTable(options, None)

  override def getTable(options: CaseInsensitiveStringMap,
      schema: StructType): Table = makeTable(options, Some(schema))
}

/** Read-side table wrapper; writes go through `df.write.parquet("graft://…")`
  * (pure FS delegation), so only read capabilities are advertised. */
final class GraftTable(delegate: ParquetTable, minCols: Int)
    extends Table with SupportsRead {
  override def name(): String = delegate.name
  override def schema(): StructType = delegate.schema
  override def partitioning(): Array[Transform] = delegate.partitioning
  override def properties(): java.util.Map[String, String] = delegate.properties
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(delegate, minCols, options)
}

/** ParquetScanBuilder with cache-admission control at build() time, when
  * the pruned projection width is final. */
final class GraftScanBuilder(delegate: ParquetTable, minCols: Int,
    options: CaseInsensitiveStringMap)
  extends ParquetScanBuilder(delegate.sparkSession, delegate.fileIndex,
    delegate.schema, delegate.dataSchema, options) {

  override def build(): ParquetScan = {
    val scan = super.build()
    val projectedCols = scan.readDataSchema.fields.length
    if (minCols > 0 && projectedCols < minCols) {
      // narrow projection: not worth caching (reference's
      // minColumnsSelected admission rule) — disable the cache for this
      // scan only, via its broadcast Hadoop conf
      val conf2 = new org.apache.hadoop.conf.Configuration(scan.hadoopConf)
      conf2.setBoolean(graft.cache.CacheConfig.EnabledKey, false)
      conf2.setBoolean("fs.graft.impl.disable.cache", true)
      scan.copy(hadoopConf = conf2)
    } else scan
  }
}
