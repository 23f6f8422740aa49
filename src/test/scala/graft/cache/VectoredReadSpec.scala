package graft.cache

import org.apache.hadoop.fs.{FileRange, FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

import java.nio.ByteBuffer
import java.util.concurrent.TimeUnit
import scala.jdk.CollectionConverters._

/** The Hadoop 3.3+ vectored-read API through graft://: ranges must be
  * byte-exact against direct reads, warm ranges must be served from the
  * cache (zero remote bytes), direct buffers must work, and out-of-file
  * ranges must be rejected eagerly. */
class VectoredReadSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var cacheDir: String = _
  private var fs: FileSystem = _
  private val srcPath = "/root/testdata/sf0.001/lineitem.parquet"

  override def beforeAll(): Unit = {
    cacheDir = java.nio.file.Files.createTempDirectory("graft-vread").toString
    FileSystem.closeAll()
    CacheManager.resetForTest()
    spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4,
      cacheDir = Some(cacheDir)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    fs = FileSystem.get(java.net.URI.create("graft:///"),
      spark.sessionState.newHadoopConf())
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    CacheManager.resetForTest()
  }

  private def direct(at: Long, len: Int): Array[Byte] = {
    val in = java.nio.file.Files.newByteChannel(java.nio.file.Paths.get(srcPath))
    try {
      in.position(at)
      val bb = ByteBuffer.allocate(len)
      while (bb.hasRemaining) assert(in.read(bb) >= 0)
      bb.array()
    } finally in.close()
  }

  private def got(r: FileRange): Array[Byte] = {
    val bb = r.getData.get(30, TimeUnit.SECONDS)
    val out = new Array[Byte](bb.remaining())
    bb.get(out)
    out
  }

  test("vectored ranges are byte-exact and warm ranges stay off the source") {
    val in = fs.open(new Path(s"graft://$srcPath"))
    val ranges = Seq(
      FileRange.createFileRange(0L, 1024),
      FileRange.createFileRange(100000L, 4096),
      FileRange.createFileRange(77L, 333)).asJava
    in.readVectored(ranges, (n: Int) => ByteBuffer.allocate(n))
    ranges.asScala.foreach { r =>
      assert(got(r).sameElements(direct(r.getOffset, r.getLength)),
        s"range at ${r.getOffset}")
    }
    // the same ranges again: fully cached now, zero new remote bytes
    val mgr = CacheManager.current.get
    val remoteBefore = mgr.metrics.bytesFromRemote.get
    val warm = Seq(
      FileRange.createFileRange(0L, 1024),
      FileRange.createFileRange(100000L, 4096)).asJava
    in.readVectored(warm, (n: Int) => ByteBuffer.allocate(n))
    warm.asScala.foreach { r =>
      assert(got(r).sameElements(direct(r.getOffset, r.getLength)))
    }
    assert(mgr.metrics.bytesFromRemote.get == remoteBefore,
      "warm vectored ranges must be served from cache")
    in.close()
  }

  test("direct (off-heap) buffers work") {
    val in = fs.open(new Path(s"graft://$srcPath"))
    val ranges = Seq(FileRange.createFileRange(512L, 2048)).asJava
    in.readVectored(ranges, (n: Int) => ByteBuffer.allocateDirect(n))
    assert(got(ranges.get(0)).sameElements(direct(512L, 2048)))
    in.close()
  }

  test("out-of-file range is rejected eagerly") {
    val in = fs.open(new Path(s"graft://$srcPath"))
    val len = fs.getFileStatus(new Path(s"graft://$srcPath")).getLen
    assertThrows[java.io.EOFException] {
      in.readVectored(
        Seq(FileRange.createFileRange(len - 10, 100)).asJava,
        (n: Int) => ByteBuffer.allocate(n))
    }
    in.close()
  }

  test("a real parquet scan through graft:// drives the vectored path") {
    val mgr = CacheManager.current.get
    val before = mgr.metrics.vectoredRanges.get
    // a wide-enough projection: the c11 admission gate refuses narrow
    // scans (cache bypass => the inner FS serves the vectored read)
    val n = spark.read.parquet(s"graft://$srcPath")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax")
      .groupBy().sum().collect().length
    assert(n > 0)
    assert(mgr.metrics.vectoredRanges.get > before,
      "parquet reader (vectored IO enabled in GraftSession) must call readVectored")
  }

  test("positioned read is exact and leaves the cursor untouched") {
    val in = fs.open(new Path(s"graft://$srcPath"))
    in.seek(42L)
    val buf = new Array[Byte](256)
    val n = in.read(9000L, buf, 0, 256)
    assert(n == 256)
    assert(buf.sameElements(direct(9000L, 256)))
    assert(in.getPos == 42L, "positioned read must not move the cursor")
    in.close()
  }
}
