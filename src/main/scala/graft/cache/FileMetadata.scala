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

  private val bitmap: BlockBitmap = {
    if (md.exists() && md.length() == BlockBitmap.byteLength(blockCount)) {
      BlockBitmap.fromBytes(blockCount, Files.readAllBytes(md.toPath))
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
    Files.write(tmp.toPath, bitmap.toBytes)
    Files.move(tmp.toPath, md.toPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def dataFile: File = CacheFileLayout.dataFile(conf.cacheDir, remotePath, generation)

  /** Ensure the sparse data file exists with full logical length. */
  def ensureDataFile(): File = synchronized {
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
