package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** c07's scale claim, measured at the parquet footers: sorting by the
  * Morton value of (l_partkey, l_suppkey) must leave far fewer row
  * groups whose min/max stats intersect a 2-D box predicate than a
  * layout sorted by an unrelated key — row-group skipping is exactly
  * the reader consulting those stats, so the footer count IS the number
  * of row groups a scan decodes. */
class ZOrderSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.01"
  private val base = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
    "/graft-zorder-spec"
  // the c07 box: ~5% of the partkey range x ~4% of the suppkey range
  private val (pLo, pHi, sLo, sHi) = (100L, 199L, 2L, 5L)

  override def beforeAll(): Unit = {
    spark = graft.GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def write(df: DataFrame, sub: String): Unit =
      df.write.mode("overwrite")
        .option("parquet.block.size", "16384")
        .option("parquet.page.size", "4096")
        .parquet(s"$base/$sub")
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    write(li.withColumn("zv", graft.functions.ZOrder
        .zvalue2(col("l_partkey"), col("l_suppkey")))
      .repartitionByRange(32, col("zv")).sortWithinPartitions("zv").drop("zv"),
      "zorder")
    write(li.repartitionByRange(32, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey"), "linear")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** (surviving, total) row groups whose [min,max] on BOTH key columns
    * intersects the box — i.e. the groups a stats-consulting reader
    * cannot skip. */
  private def boxRowGroups(sub: String): (Int, Int) = {
    val files = Option(new java.io.File(s"$base/$sub").listFiles())
      .getOrElse(Array.empty).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    var hit = 0; var total = 0
    files.foreach { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(f.getAbsolutePath), spark.sparkContext.hadoopConfiguration))
      try reader.getFooter.getBlocks.asScala.foreach { block =>
        def range(name: String): (Long, Long) = {
          val st = block.getColumns.asScala
            .find(_.getPath.toDotString == name).get.getStatistics
          (st.genericGetMin.asInstanceOf[java.lang.Long],
            st.genericGetMax.asInstanceOf[java.lang.Long])
        }
        val (pMin, pMax) = range("l_partkey")
        val (sMin, sMax) = range("l_suppkey")
        total += 1
        if (pMax >= pLo && pMin <= pHi && sMax >= sLo && sMin <= sHi) hit += 1
      } finally reader.close()
    }
    (hit, total)
  }

  test("z-ordered layout prunes row groups the linear sort cannot") {
    val (zHit, zTotal) = boxRowGroups("zorder")
    val (lHit, lTotal) = boxRowGroups("linear")
    assert(zTotal >= 20, s"layout too coarse to measure skipping: $zTotal groups")
    // the linear layout's row groups span the full (partkey, suppkey)
    // space, so essentially none are skippable for a 2-D box...
    assert(lHit.toDouble / lTotal >= 0.9, s"linear: $lHit/$lTotal")
    // ...while the z-ordered layout localizes the box to a small slice
    assert(zHit.toDouble / zTotal <= 0.4, s"zorder: $zHit/$zTotal")
  }

  test("out-of-range keys raise instead of silently folding the curve") {
    val s = spark
    import s.implicits._
    val bad = Seq((1L << 32, 1L), (-1L, 1L)).toDF("a", "b")
    val ok = Seq((0L, (1L << 32) - 1)).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(graft.functions.ZOrder.zvalue2(col("a"), col("b"))).collect()
    }
    def rootMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" ")
    assert(rootMsg(e).contains("zvalue2"), s"unexpected error: $e")
    // boundary values pass
    assert(ok.select(graft.functions.ZOrder.zvalue2(col("a"), col("b")))
      .collect().length == 1)
  }

  test("both layouts return identical box-query results") {
    def agg(sub: String): Long = spark.read.parquet(s"$base/$sub")
      .filter(col("l_partkey").between(pLo, pHi) &&
        col("l_suppkey").between(sLo, sHi))
      .count()
    val direct = Tables.load(spark, dir, "lineitem")
      .filter(col("l_partkey").between(pLo, pHi) &&
        col("l_suppkey").between(sLo, sHi))
      .count()
    assert(agg("zorder") == direct)
    assert(agg("linear") == direct)
  }
}
