package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** c06's non-SQL half: compaction must actually reduce the file count
  * (the oracle only proves content preservation), and the output file
  * count/size must be derived from input BYTES over a target size — at
  * two different input scales the same target must yield proportionally
  * different layouts, with mean output file size inside a band around
  * the target. */
class CompactionSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = graft.GraftSession.builder(master = "local[4]", shufflePartitions = 4)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def parquetFiles(p: String): Array[java.io.File] =
    Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet"))

  test("compaction collapses the shattered layout bytes-proportionally") {
    graft.SparkEntry.queries("c06_compaction")(spark, dir).collect()
    // scratch dirs carry a per-JVM -j<tag> plus per-execution -e<N>
    // suffix (r10 concurrency isolation; r14 cross-JVM uniqueness):
    // inspect the newest execution of this run
    val root = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-compact")
    val sfName = new java.io.File(dir).getName
    val base = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(sfName + "-"))
      .maxBy(_.lastModified).getPath
    val before = parquetFiles(s"$base/shattered").length
    val after = parquetFiles(s"$base/compacted").length
    assert(before == 64, s"expected 64 shattered files, got $before")
    // sf0.001 events is far below one 128 MB target file → exactly 1
    assert(after == 1, s"expected 1 compacted file, got $after")
  }

  test("output file sizes land in the target band at two input scales") {
    val tmp = java.nio.file.Files.createTempDirectory("compact-band").toString
    // Two shattered inputs of the same shape, one 4x the rows of the other.
    val small = spark.range(20000).select(col("id"),
      concat(lit("payload-"), col("id")).as("s"))
    val large = spark.range(80000).select(col("id"),
      concat(lit("payload-"), col("id")).as("s"))
    small.repartition(32).write.mode("overwrite").parquet(s"$tmp/small")
    large.repartition(32).write.mode("overwrite").parquet(s"$tmp/large")

    val target = 64L * 1024 // 64 KiB target: both inputs span several files
    val nSmall = Compaction.compact(spark, s"$tmp/small", s"$tmp/small_c", target)
    val nLarge = Compaction.compact(spark, s"$tmp/large", s"$tmp/large_c", target)

    // File count tracks bytes: the 4x input must compact to ~4x the files.
    assert(nLarge >= 3 * nSmall && nLarge <= 5 * nSmall,
      s"expected ~4x file count, got small=$nSmall large=$nLarge")
    for ((out, n) <- Seq(s"$tmp/small_c" -> nSmall, s"$tmp/large_c" -> nLarge)) {
      val files = parquetFiles(out)
      assert(files.length == n, s"$out: ${files.length} files, planned $n")
      val mean = files.map(_.length).sum.toDouble / files.length
      // Band is generous: compacting removes per-file footer overhead and
      // improves encoding, so outputs run smaller than the listed input
      // bytes — but they must stay the same order of magnitude.
      assert(mean > target * 0.25 && mean < target * 1.5,
        s"$out: mean file size $mean outside band around $target")
    }
    // content preserved
    val a = spark.read.parquet(s"$tmp/large").agg(sum("id")).head.getLong(0)
    val b = spark.read.parquet(s"$tmp/large_c").agg(sum("id")).head.getLong(0)
    assert(a == b)
  }
}
