package graft.cache

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import graft.GraftSession

/** Per-scheme take-over shims (reference rubix-hadoop2
  * CachingS3AFileSystem.java:23-42 parity): setting ONE config key
  * (`fs.s3a.impl = graft.cache.GraftS3AFileSystem`) routes every existing
  * `s3a://...` URI through the block cache — no graft:// path rewriting.
  *
  * The suite exercises the s3a shim with the underlying client swapped to
  * the local FS (`graft.s3a.underlying.impl`, the same knob a deployment
  * would use for a custom S3 client build; the real default is
  * org.apache.hadoop.fs.s3a.S3AFileSystem, which isn't on this test
  * classpath). What's under test is the whole shim path: scheme take-over,
  * direct (non-recursing) construction of the inner FS, identity path
  * translation up to the scheme swap, and cache engagement.
  */
/** Local FS variant whose close() is observable (see the shim-close test). */
class CloseProbeFileSystem extends org.apache.hadoop.fs.LocalFileSystem {
  override def close(): Unit = {
    CloseProbeFileSystem.closed.set(true)
    super.close()
  }
}
object CloseProbeFileSystem {
  val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
}

class SchemeShimSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private var cacheDir: String = _
  private val sfDir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    cacheDir = java.nio.file.Files.createTempDirectory("graft-shim-spec").toString
    org.apache.hadoop.fs.FileSystem.closeAll()
    CacheManager.resetForTest()
    spark = GraftSession.builder(master = "local[4]", shufflePartitions = 4,
        cacheDir = Some(cacheDir))
      .config("spark.hadoop.fs.s3a.impl", "graft.cache.GraftS3AFileSystem")
      .config("spark.hadoop.graft.s3a.underlying.impl",
        "org.apache.hadoop.fs.LocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = {
    if (spark != null) spark.stop()
    org.apache.hadoop.fs.FileSystem.closeAll()
    CacheManager.resetForTest()
  }

  test("fs.s3a.impl shim: existing s3a:// URIs read through the cache") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create("s3a:///"), spark.sessionState.newHadoopConf())
    assert(fs.isInstanceOf[GraftS3AFileSystem],
      s"fs.s3a.impl must resolve to the shim, got ${fs.getClass}")
    assert(fs.getScheme == "s3a")
    val m = fs.asInstanceOf[GraftFileSystem].cacheManager.metrics

    val direct = spark.read.parquet(s"$sfDir/part.parquet")
      .groupBy("p_brand").count()
      .collect().map(_.toString).sorted

    val cold = spark.read.parquet(s"s3a://$sfDir/part.parquet")
      .groupBy("p_brand").count()
      .collect().map(_.toString).sorted
    assert(cold.sameElements(direct),
      "s3a-shimmed scan must be byte-equivalent to the direct scan")

    // warm re-read must be served from the cache, not the source
    val cachedBefore = m.bytesFromCache.get
    val warm = spark.read.parquet(s"s3a://$sfDir/part.parquet")
      .groupBy("p_brand").count()
      .collect().map(_.toString).sorted
    assert(warm.sameElements(direct))
    assert(m.bytesFromCache.get > cachedBefore,
      "warm s3a scan must hit the block cache")
  }

  test("listStatus/getFileStatus surface shim-scheme paths") {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      java.net.URI.create("s3a:///"), spark.sessionState.newHadoopConf())
    val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(s"s3a://$sfDir/part.parquet"))
    assert(st.getPath.toUri.getScheme == "s3a",
      s"status paths must keep the taken-over scheme, got ${st.getPath}")
    val ls = fs.listStatus(new org.apache.hadoop.fs.Path(s"s3a://$sfDir"))
    assert(ls.nonEmpty && ls.forall(_.getPath.toUri.getScheme == "s3a"))
  }

  test("closing the shim closes its directly-constructed inner client") {
    // a fresh (uncached) shim instance with a close-observable inner
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sessionState.newHadoopConf())
    conf.set("graft.s3a.underlying.impl",
      classOf[CloseProbeFileSystem].getName)
    CloseProbeFileSystem.closed.set(false)
    val shim = new GraftS3AFileSystem
    shim.initialize(java.net.URI.create("s3a:///"), conf)
    shim.close()
    assert(CloseProbeFileSystem.closed.get,
      "shim.close() must close the directly-built inner FS " +
        "(an S3AFileSystem's connection/thread pools would leak)")
  }

  test("shim registry covers the reference's per-scheme plugin set") {
    // one concrete class per reference shim; construction must not require
    // the (absent) cloud client jars
    val shims = Seq(new GraftS3AFileSystem, new GraftGoogleHadoopFileSystem,
      new GraftAbfsFileSystem, new GraftNativeAzureFileSystem,
      new GraftDistributedFileSystem)
    assert(shims.map(_.getScheme) == Seq("s3a", "gs", "abfs", "wasb", "hdfs"))
  }
}
