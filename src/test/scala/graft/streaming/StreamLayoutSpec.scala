package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The streaming sources must read BOTH events layouts: the driver
  * corpus's single `events.parquet` FILE and the directory-of-part-files
  * layout every Spark-written corpus has. The r10 scale probe caught the
  * directory layout reading as a silently EMPTY stream (the literal
  * file-name glob matches no part files); this spec pins the fix by
  * running the same gate query against both layouts and requiring
  * identical results. */
class StreamLayoutSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("s01 windowed counts: directory-layout events == single-file layout") {
    val alt = java.nio.file.Files.createTempDirectory("graft-layout").toString
    // mirror the corpus, but write events as a Spark DIRECTORY (2 parts)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/$t.parquet"),
        java.nio.file.Paths.get(s"$alt/$t.parquet"))
    }
    spark.read.parquet(s"$dir/events.parquet").repartition(2)
      .write.parquet(s"$alt/events.parquet")
    assert(new java.io.File(s"$alt/events.parquet").isDirectory)

    val q = graft.SparkEntry.queries("s01_stream_window")
    def rows(d: String): Seq[String] = graft.PinScope.run(spark)(
      q(spark, d).collect().map(_.toString).sorted.toSeq)
    val single = rows(dir)
    val multi = rows(alt)
    assert(single.nonEmpty, "vacuous: the single-file run produced no rows")
    assert(multi == single,
      s"directory layout diverged: ${multi.size} vs ${single.size} rows")
  }
}
