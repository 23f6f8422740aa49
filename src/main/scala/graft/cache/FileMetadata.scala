package graft.cache

import java.io.{File, RandomAccessFile}
import java.nio.file.{Files, StandardCopyOption}

/** Mutable per-file cache state: block bitmap + accounting, backed by an
  * mdfile on disk (reference: rubix-bookkeeper FileMetadata.java).
  *
  * Thread-safety: all mutation goes through `synchronized` on this object;
  * the manager additionally stripes access per path. The reference uses
  * Striped.lock(20000) (FileMetadata.java:58) for the same reason —
  * concurrent tasks warm disjoint ranges of one file.
  */
final class FileMetadata(
    val remotePath: String,
    val fileLen: Long,
    val lastModified: Long,
    val generation: Int,
    conf: CacheConfig) {

  val blockCount: Long = BlockMath.blockCount(fileLen, conf.blockSize)
  private val md = CacheFileLayout.mdFile(conf.cacheDir, remotePath, generation)
  private var deleted = false

  /** Restore the persisted bitmap ONLY when its 16-byte header proves it
    * describes THIS file version. Without the header (r10 format), a
    * fresh JVM adopted any same-generation bitmap by length alone — so a
    * remote file overwritten with equal length but different content
    * between JVMs was served from the stale data file: the in-memory
    * mtime-mismatch invalidation in CacheManager.metadata only fires for
    * entries already in the registry, which a restart empties. (Found by
    * c13: a repeated scratch path made the previous JVM's cache poison
    * the next run's peer-read contract.) Headerless/mismatched md files
    * restore empty — the cache re-warms, which is always safe. */
  private val bitmap: BlockBitmap = {
    val expected = FileMetadata.HeaderLen + BlockBitmap.byteLength(blockCount)
    if (md.exists() && md.length() == expected) {
      val bytes = Files.readAllBytes(md.toPath)
      val bb = java.nio.ByteBuffer.wrap(bytes, 0, FileMetadata.HeaderLen)
      val hLen = bb.getLong
      val hMtime = bb.getLong
      if (hLen == fileLen && (!conf.stalenessCheck || hMtime == lastModified))
        BlockBitmap.fromBytes(blockCount, java.util.Arrays.copyOfRange(
          bytes, FileMetadata.HeaderLen, bytes.length))
      else BlockBitmap.empty(blockCount)
    } else BlockBitmap.empty(blockCount)
  }

  def isBlockCached(b: Long): Boolean = synchronized {
    !deleted && bitmap.isSet(b)
  }

  def allCached(startBlock: Long, endBlock: Long): Boolean = synchronized {
    !deleted && bitmap.allSet(startBlock, endBlock)
  }

  /** Mark [startBlock, endBlock) cached; persist mdfile; returns the
    * count of NEWLY cached blocks (eviction weight itself always comes
    * from [[weightKB]] — callers only need the did-anything-change flag
    * to decide whether to re-weigh the registry entry). */
  def setBlocksCached(startBlock: Long, endBlock: Long): Long = synchronized {
    if (deleted) return 0L
    val newly = bitmap.set(startBlock, endBlock)
    if (newly > 0) persist()
    newly.toLong
  }

  def cachedBlockCount: Int = synchronized(bitmap.cardinality)

  /** Weight in KB of cached data (Guava weigher unit, reference
    * FileMetadata.getWeight:375-378). */
  def weightKB: Int = synchronized {
    math.max(1, (cachedBlockCount.toLong * conf.blockSize / 1024).toInt)
  }

  private def persist(): Unit = {
    CacheFileLayout.ensureParent(md)
    val tmp = new File(md.getPath + ".tmp")
    val body = bitmap.toBytes
    val out = java.nio.ByteBuffer.allocate(FileMetadata.HeaderLen + body.length)
    out.putLong(fileLen).putLong(lastModified).put(body)
    Files.write(tmp.toPath, out.array())
    Files.move(tmp.toPath, md.toPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def dataFile: File = CacheFileLayout.dataFile(conf.cacheDir, remotePath, generation)

  /** Ensure the sparse data file exists with full logical length. A
    * retired instance must never re-create files its deletion already
    * unlinked (the r14 stress-gate corruption vector: a fresh sparse
    * file under a bitmap that still claims blocks cached). */
  def ensureDataFile(): File = synchronized {
    if (deleted)
      throw new java.io.IOException(s"cache entry deleted for $remotePath")
    val f = dataFile
    if (!f.exists() || f.length() != fileLen) {
      CacheFileLayout.ensureParent(f)
      val raf = new RandomAccessFile(f, "rw")
      try raf.setLength(fileLen) finally raf.close()
    }
    f
  }

  /** Delete data + md files (eviction/invalidation removal listener). */
  def deleteFiles(): Unit = synchronized {
    deleted = true
    CacheFileLayout.deleteGenerations(conf.cacheDir, remotePath, generation)
  }

  def isDeleted: Boolean = synchronized(deleted)
}

object FileMetadata {
  /** mdfile header: [fileLen: Long][lastModified: Long] before the
    * bitmap bytes — the file-version pin the restore path validates. */
  val HeaderLen: Int = 16
}
