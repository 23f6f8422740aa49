package graft.cache

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Caching Hadoop FileSystem under the `graft://` scheme — the Spark-native
  * analog of the reference's engine plugins (rubix-hadoop2
  * CachingS3AFileSystem.java / CachingFileSystem.java): register
  *   spark.hadoop.fs.graft.impl = graft.cache.GraftFileSystem
  * and ANY Spark scan of `graft://<path>` transparently reads through the
  * executor-local block cache with zero planner changes.
  *
  * `graft://` wraps an underlying scheme (default `file`, configurable via
  * `graft.underlying.scheme` — `s3a`/`gs`/`abfs` in a real deployment).
  * Mutations are pure delegation; staleness is caught lazily by
  * lastModified compare, exactly like the reference
  * (CachingFileSystem.java:263-306).
  */
class GraftFileSystem extends FileSystem {
  private var myUri: URI = _
  private var inner: FileSystem = _
  private var cacheConf: CacheConfig = _
  private var manager: CacheManager = _
  private var workingDir: Path = _
  private var enabled: Boolean = true
  private var hintsEnabled: Boolean = false
  /** True when `createInner` constructed the underlying client directly
    * (take-over shims) rather than borrowing a FileSystem.get-cached
    * instance: a directly-built S3AFileSystem owns connection/thread
    * pools that leak unless this wrapper closes it with itself. */
  protected var ownsInner: Boolean = false

  /** Scheme this caching FS answers for. The base class claims `graft`
    * (wrap-a-scheme mode); the per-scheme shims below claim the native
    * scheme itself (take-over mode, reference
    * hadoop2/CachingS3AFileSystem.java:23-42 parity). */
  protected def outerScheme: String = "graft"

  /** Underlying FS construction. Wrap-a-scheme mode dispatches through
    * FileSystem.get on `graft.underlying.scheme`; take-over shims MUST
    * instantiate the concrete class directly instead (fs.<scheme>.impl
    * now names the shim, so FileSystem.get would recurse). */
  protected def createInner(name: URI, conf: Configuration): FileSystem = {
    val underScheme = conf.get("graft.underlying.scheme", "file")
    FileSystem.get(URI.create(s"$underScheme:///"), conf)
  }

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    myUri = URI.create(s"$outerScheme://${Option(name.getAuthority).getOrElse("")}/")
    inner = createInner(name, conf)
    cacheConf = CacheConfig.from(conf)
    hintsEnabled = conf.getBoolean(CacheConfig.AdmissionHintsKey, false)
    enabled = conf.getBoolean(CacheConfig.EnabledKey, true) &&
      projectionAdmitted(conf)
    manager = CacheManager.getOrInit(cacheConf)
    if (conf.getBoolean("graft.cache.metrics.enabled", true))
      CacheMetricsSource.register(manager)
    if (cacheConf.parallelWarmup && manager.warmup.isEmpty) manager.synchronized {
      if (manager.warmup.isEmpty) {
        val svc = new WarmupService(manager,
          p => inner.open(new Path(stripScheme(p))))
        svc.start()
        manager.warmup = Some(svc)
      }
    }
    workingDir = new Path("/")
  }

  private def stripScheme(p: String): String = {
    // tolerant split (never URI.create: object-store keys legally hold
    // unescaped %, +, spaces — see CacheFileLayout.splitAuthorityPath)
    val path = CacheFileLayout.splitAuthorityPath(p)._2
    if (path.nonEmpty) path else p
  }

  override def getUri: URI = myUri
  override def getScheme: String = outerScheme

  /** Close the directly-constructed inner client with the wrapper;
    * FileSystem.get-cached inners are shared and stay open (Hadoop's
    * cache closes them). */
  override def close(): Unit =
    try super.close()
    finally if (ownsInner && inner != null) inner.close()

  // ---- path translation ----
  private def toInner(p: Path): Path = {
    val u = p.toUri
    new Path(inner.getUri.getScheme, inner.getUri.getAuthority,
      Option(u.getPath).filter(_.nonEmpty).getOrElse("/"))
  }
  private def toOuter(p: Path): Path = {
    val u = p.toUri
    new Path(outerScheme, Option(myUri.getAuthority).getOrElse(""),
      Option(u.getPath).filter(_.nonEmpty).getOrElse("/"))
  }
  private def translate(st: FileStatus): FileStatus = {
    // COPY, never mutate: some inner statuses resolve fields lazily from
    // their own path (RawLocalFileSystem's permission loader does
    // `new File(getPath().toUri())`) — rewriting the path in place makes
    // that later load explode on the outer scheme. The copy is built from
    // the scan-relevant fields only and deliberately does NOT read the
    // owner/group/permission triple: on RawLocal statuses each of those
    // getters forces the lazy per-file permission load (a stat/exec per
    // file — measured 2x on the listing-heavy compaction query when the
    // full copy constructor ran it), planners never consult them, and
    // object-store statuses carry static defaults anyway.
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      null, null, null, toOuter(st.getPath))
  }

  // ---- admission control (CacheUtil.skipCache:203-222 analog) ----
  // Three gates, all reference-paralleled: (1) enabled flag — per-scan
  // confs from GraftScanBuilder land here via fs.graft.impl.disable.cache;
  // (2) path skip/allow regexes; (3) projection width (below,
  // CacheUtil.java:385-388 minColumnsSelected).
  private[cache] def admitted(path: Path): Boolean = {
    if (!enabled || cacheConf == null) return false
    val s = path.toUri.getPath
    val skip = cacheConf.skipCachePattern
    val allow = cacheConf.allowPattern
    (skip.isEmpty || !s.matches(skip)) && (allow.isEmpty || s.matches(allow))
  }

  /** Projection-width admission (reference `minColumnsSelected`,
    * rubix-spi CacheUtil.java:385-388, knobs CacheConfig.java:136-141):
    * a scan that selects fewer than `graft.cache.min.projected.columns`
    * top-level columns is not worth caching — it would pin whole blocks
    * of a wide table for bytes it mostly skips. The pushed projection is
    * read from Spark's parquet requested-schema key in the conf this FS
    * instance was initialized with. On the DSv2 path GraftScanBuilder
    * decides at build() time and ships `graft.cache.enabled=false` in the
    * scan's broadcast conf (gate 1); this FS-side gate additionally
    * covers the raw `graft://` path when per-scan FS instances are in
    * play (`fs.graft.impl.disable.cache=true`), where each task's conf —
    * carrying the scan's own requested schema — initializes a fresh
    * instance. With the default JVM-cached FS the session-level conf has
    * no requested schema, so this gate stays open (width unknown ≠
    * refused), exactly like the reference when the engine passes no
    * column hint. */
  private def projectionAdmitted(conf: Configuration): Boolean = {
    if (cacheConf.minProjectedColumns <= 0) return true
    val json = conf.get("org.apache.spark.sql.parquet.row.requested_schema")
    if (json == null) return true
    val width = scala.util.Try(
      org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType].fields.length)
    width.toOption.forall(_ >= cacheConf.minProjectedColumns)
  }

  // TTL'd (size, mtime) lookup cache — the reference's getFileInfo path
  // (BookKeeper.java:536-546, rubix.cache.stale.fileinfo.expiry.period):
  // avoids a remote HEAD per stream open; staleness detection weakens to
  // the TTL window, the same documented trade the reference makes.
  private lazy val fileInfoCache: com.google.common.cache.LoadingCache[Path, FileStatus] =
    com.google.common.cache.CacheBuilder.newBuilder()
      .maximumSize(100000)
      .expireAfterWrite(java.time.Duration.ofMillis(
        getConf.getLong("graft.cache.fileinfo.ttl.ms", 60000L)))
      .build(new com.google.common.cache.CacheLoader[Path, FileStatus] {
        override def load(p: Path): FileStatus = inner.getFileStatus(p)
      })

  // ---- reads ----
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val ip = toInner(f)
    val st = fileInfoCache.get(ip)
    // Plan-time width hint (r16, AdmissionHints scaladoc): covers
    // stock-format scans over graft:// under the JVM-cached FS, where
    // projectionAdmitted above sees no requested schema. Unknown width
    // admits. OPT-IN (graft.cache.admission.hints, default off): the
    // registry is path-keyed and latest-wins, so a narrow stock scan's
    // hint would also veto a CONCURRENT wide DSv2 scan's opens on the
    // same table — a workload that interleaves both shapes on one table
    // should leave this off and rely on the per-scan conf channel.
    val admit = admitted(f) && st.isFile &&
      (!hintsEnabled || AdmissionHints.admittedWidth(
        AdmissionHints.keyOf(ip.toUri), cacheConf.minProjectedColumns))
    if (!admit) return inner.open(ip, bufferSize)
    val stream = new CachingInputStream(
      () => inner.open(ip, bufferSize),
      ip.toString, st.getLen, st.getModificationTime, manager, true)
    new FSDataInputStream(new BufferedFSInputStream(stream,
      math.max(bufferSize, 4096)))
  }

  // ---- metadata (translated) ----
  override def getFileStatus(f: Path): FileStatus =
    translate(inner.getFileStatus(toInner(f)))

  override def listStatus(f: Path): Array[FileStatus] =
    inner.listStatus(toInner(f)).map(translate)

  override def getFileBlockLocations(file: FileStatus, start: Long,
      len: Long): Array[BlockLocation] =
    // Locality hook: per-split cache-affinity owners are fabricated here
    // (CachingFileSystem.getFileBlockLocations:393-437 analog). Single-JVM
    // local mode: delegate; the ring feeds this on a real cluster.
    CacheAffinity.blockLocations(file, start, len, cacheConf)

  // ---- mutations: pure delegation (reference parity) ----
  /** Eager invalidation on OUR mutation path — deliberately beyond the
    * reference, whose create/append/rename/delete carry commented-out
    * invalidation TODOs (CachingFileSystem.java:263-306) and rely purely
    * on the lazy lastModified compare. Lazy-only is unsafe here because
    * the TTL'd fileInfoCache can serve a pre-overwrite (size, mtime) for
    * up to the TTL window, making a read-after-overwrite through the SAME
    * filesystem return stale cached bytes. Mutations that bypass this FS
    * (another writer on the object store) remain lazy, exactly the
    * reference's documented trade. Directory deletes/renames only drop
    * the exact path entry; children are caught by the mtime compare once
    * their fileInfo TTL lapses. */
  private def invalidateLocal(paths: Path*): Unit = paths.foreach { ip =>
    fileInfoCache.invalidate(ip)
    if (manager != null) manager.invalidate(ip.toString)
  }

  /** Invalidate both at open AND at close of a write stream: a reader
    * interleaving between create() and close() re-primes fileInfoCache
    * with the mid-write (size, mtime), which would otherwise serve
    * TTL-stale bytes after the writer finishes. */
  private def invalidatingOnClose(ip: Path,
      out: FSDataOutputStream): FSDataOutputStream =
    new FSDataOutputStream(out, null, out.getPos) {
      override def close(): Unit = {
        try super.close() finally invalidateLocal(ip)
      }
    }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val ip = toInner(f)
    invalidateLocal(ip)
    invalidatingOnClose(ip, inner.create(ip, permission, overwrite, bufferSize,
      replication, blockSize, progress))
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = {
    val ip = toInner(f)
    invalidateLocal(ip)
    invalidatingOnClose(ip, inner.append(ip, bufferSize, progress))
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val (is, id) = (toInner(src), toInner(dst))
    val ok = inner.rename(is, id)
    if (ok) invalidateLocal(is, id)
    ok
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val ip = toInner(f)
    val ok = inner.delete(ip, recursive)
    if (ok) invalidateLocal(ip)
    ok
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    inner.mkdirs(toInner(f), permission)

  override def setWorkingDirectory(dir: Path): Unit = { workingDir = dir }
  override def getWorkingDirectory: Path = workingDir

  /** Executor-local cache manager backing this FS (tests/metrics). */
  def cacheManager: CacheManager = manager
}

/** Cache-affinity locality: one BlockLocation per ownership split, host =
  * consistent-hash owner of `path:start:end` (reference:
  * CachingFileSystem.getFileBlockLocations:393-437). The scheduler then
  * lands scan tasks where the cached blocks (will) live. Ownership is a
  * HINT — correctness never depends on it (dynamic-allocation churn just
  * degrades locality). Falls back to localhost when no ring is known
  * (local mode). */
object CacheAffinity {
  def blockLocations(file: FileStatus, start: Long, len: Long,
      conf: CacheConfig): Array[BlockLocation] = {
    if (file == null || len <= 0) return Array.empty
    val split = if (conf != null) conf.splitSize else 256L << 20
    val path = file.getPath.toUri.getPath
    val end = math.min(file.getLen, start + len)
    val out = scala.collection.mutable.ArrayBuffer.empty[BlockLocation]
    var s = (start / split) * split
    while (s < end) {
      val e = math.min(s + split, file.getLen)
      val host = ClusterState.ring
        .flatMap(_.locateKey(s"$path:$s:${s + split}"))
        .getOrElse("localhost")
      out += new BlockLocation(Array(s"$host:9867"), Array(host), s, e - s)
      s += split
    }
    out.toArray
  }
}

/** Per-scheme take-over shims (reference parity: rubix-hadoop2 ships
  * concrete CachingS3AFileSystem / CachingGoogleHadoopFileSystem /
  * CachingNativeAzureFileSystem / CachingDistributedFileSystem,
  * CachingS3AFileSystem.java:23-42, so an engine enables the cache with
  * ONE config key and zero path rewriting). Same contract here:
  *
  *   spark.hadoop.fs.s3a.impl = graft.cache.GraftS3AFileSystem
  *
  * and every existing `s3a://bucket/...` URI in every job reads through
  * the block cache — no graft:// prefixing. The real underlying client is
  * instantiated DIRECTLY from `graft.<scheme>.underlying.impl` (default:
  * the stock Hadoop implementation class) because `fs.<scheme>.impl` now
  * names the shim and FileSystem.get would recurse; this is exactly the
  * reference's `new S3AFileSystem()` inside its shim. The underlying FS
  * is initialized with the SAME URI (scheme + bucket authority), so path
  * translation is identity up to the scheme swap and all cache-key /
  * locality / admission logic is inherited unchanged. */
abstract class GraftSchemeFileSystem(scheme: String,
    defaultImpl: String) extends GraftFileSystem {
  override protected def outerScheme: String = scheme
  override protected def createInner(name: URI,
      conf: Configuration): FileSystem = {
    val implName = conf.get(s"graft.$scheme.underlying.impl", defaultImpl)
    val fs = Class.forName(implName).getDeclaredConstructor()
      .newInstance().asInstanceOf[FileSystem]
    // the real client (S3AFileSystem etc.) declares the taken-over scheme
    // and gets the original URI (bucket authority intact); a swapped-in
    // client of a DIFFERENT scheme (tests use LocalFileSystem) is
    // initialized under its own scheme so its path handling stays sane
    val innerScheme = scala.util.Try(fs.getScheme).getOrElse(scheme)
    val innerUri = if (innerScheme == scheme) name
      else URI.create(s"$innerScheme://${Option(name.getAuthority).getOrElse("")}/")
    fs.initialize(innerUri, conf)
    ownsInner = true // directly built, so this wrapper must close it
    fs
  }
}

/** fs.s3a.impl shim (reference CachingS3AFileSystem). */
class GraftS3AFileSystem extends GraftSchemeFileSystem("s3a",
  "org.apache.hadoop.fs.s3a.S3AFileSystem")

/** fs.gs.impl shim (reference CachingGoogleHadoopFileSystem). */
class GraftGoogleHadoopFileSystem extends GraftSchemeFileSystem("gs",
  "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem")

/** fs.abfs.impl shim (reference CachingAzureBlobFileSystem analog). */
class GraftAbfsFileSystem extends GraftSchemeFileSystem("abfs",
  "org.apache.hadoop.fs.azurebfs.AzureBlobFileSystem")

/** fs.wasb.impl shim (reference CachingNativeAzureFileSystem). */
class GraftNativeAzureFileSystem extends GraftSchemeFileSystem("wasb",
  "org.apache.hadoop.fs.azure.NativeAzureFileSystem")

/** fs.hdfs.impl shim (reference CachingDistributedFileSystem). */
class GraftDistributedFileSystem extends GraftSchemeFileSystem("hdfs",
  "org.apache.hadoop.hdfs.DistributedFileSystem")
