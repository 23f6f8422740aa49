package graft.cache

import java.io.{EOFException, IOException, RandomAccessFile}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.StandardOpenOption
import org.apache.hadoop.fs.{FSDataInputStream, FSInputStream}

/** Read plan node: a group of collated ranges served by one strategy
  * (the reference's ReadRequestChain family, rubix-core *RequestChain.java).
  */
sealed trait PlannedChain { def ranges: Vector[ReadRange] }
final case class CachedChain(ranges: Vector[ReadRange]) extends PlannedChain
final case class RemoteChain(ranges: Vector[ReadRange]) extends PlannedChain
final case class DirectChain(ranges: Vector[ReadRange]) extends PlannedChain
/** Peer-cache read from the split owner's disk (NonLocalReadRequestChain). */
final case class NonLocalChain(owner: String, ranges: Vector[ReadRange]) extends PlannedChain

object ReadPlanner {

  /** Pure chain planner (port of CachingInputStream.setupReadRequestChains,
    * rubix-core CachingInputStream.java:315-500, single-node branches):
    * classify each block against cache state, emit block-aligned warmup
    * ranges for misses (affix over-read) and exact ranges for hits, then
    * collate adjacent ranges per strategy and chunk oversized ones.
    */
  def plan(pos: Long, len: Int, fileLen: Long, blockSize: Int,
      maxReadRequestSize: Int, status: CacheStatus,
      startBlock: Long): Seq[PlannedChain] = {
    val end = pos + len
    var cached = Vector.empty[ReadRange]
    var remote = Vector.empty[ReadRange]
    var nonLocal = Vector.empty[(String, ReadRange)]
    var b = startBlock
    val endBlock = BlockMath.endBlock(pos, len, blockSize)
    while (b < endBlock) {
      val bs = BlockMath.blockStart(b, blockSize)
      val be = BlockMath.blockEnd(b, blockSize, fileLen)
      val aStart = math.max(pos, bs)
      val aEnd = math.min(end, be)
      val dest = (aStart - pos).toInt
      status.blocks((b - startBlock).toInt) match {
        case BlockState.Cached =>
          cached :+= ReadRange(aStart, aEnd, aStart, aEnd, dest)
        case BlockState.NonLocal(owner) =>
          // exact range from the owner's cache; never warmed locally —
          // the owner's disk IS the cache for this split
          nonLocal :+= (owner -> ReadRange(aStart, aEnd, aStart, aEnd, dest))
        case _ =>
          // warmup: read the whole block (affix bytes beyond the request)
          remote :+= ReadRange(bs, be, aStart, aEnd, dest)
      }
      b += 1
    }
    val chains = Seq.newBuilder[PlannedChain]
    if (cached.nonEmpty)
      ReadRange.collate(cached).foreach(g => chains += CachedChain(g))
    if (remote.nonEmpty)
      ReadRange.collate(remote)
        .flatMap(g => splitGroup(g, maxReadRequestSize))
        .foreach(g => chains += RemoteChain(g))
    nonLocal.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (owner, rs) =>
      ReadRange.collate(rs.map(_._2))
        .foreach(g => chains += NonLocalChain(owner, g))
    }
    chains.result()
  }

  /** Re-chunk a collated group so no single backend read exceeds max. */
  private def splitGroup(g: Vector[ReadRange], maxSize: Int): Seq[Vector[ReadRange]] = {
    val out = Seq.newBuilder[Vector[ReadRange]]
    var cur = Vector.empty[ReadRange]
    var curLen = 0L
    for (r <- g) {
      if (cur.nonEmpty && curLen + r.backendLen > maxSize) {
        out += cur; cur = Vector.empty; curLen = 0
      }
      cur :+= r; curLen += r.backendLen
    }
    if (cur.nonEmpty) out += cur
    out.result()
  }
}

/** Read-through caching stream over one remote file — the client half of
  * the reference (rubix-core CachingInputStream.java) re-expressed for
  * in-process use on Spark executors. Strategies:
  *
  *  - Cached: positioned FileChannel reads from the local generation file;
  *    any failure invalidates the entry and falls back to a direct read
  *    (CachedReadRequestChain.java:149-223 fallback lattice).
  *  - Remote (read-through warmup): reads block-aligned spans from the
  *    source, returns the requested window, writes whole blocks into the
  *    sparse cache file and marks them cached
  *    (RemoteReadRequestChain.java:41-214 incl. affix accounting).
  *  - Direct: pass-through, used for skip-cache paths, dummy mode and
  *    fallbacks (DirectReadRequestChain.java).
  */
final class CachingInputStream(
    openRemote: () => FSDataInputStream,
    val path: String,
    fileLen: Long,
    mtime: Long,
    manager: CacheManager,
    cacheAdmitted: Boolean) extends FSInputStream
    with org.apache.hadoop.fs.StreamCapabilities {

  /** Advertise vectored-read support so capability probes (parquet's
    * VectorIoBridge checks `in:readvectored` before handing over the
    * column-chunk ranges) route through [[readVectored]] instead of the
    * seek+read fallback. */
  override def hasCapability(capability: String): Boolean =
    org.apache.hadoop.fs.StreamCapabilities.VECTOREDIO
      .equalsIgnoreCase(capability)

  private val conf = manager.conf
  private var pos: Long = 0L
  private var closed = false
  @volatile private var remoteStream: FSDataInputStream = _

  private def remote: FSDataInputStream = {
    if (remoteStream == null) synchronized {
      if (remoteStream == null) remoteStream = openRemote()
    }
    remoteStream
  }

  // ---- FSInputStream contract ----
  override def seek(newPos: Long): Unit = {
    if (newPos < 0 || newPos > fileLen)
      throw new EOFException(s"seek $newPos out of [0,$fileLen] for $path")
    pos = newPos
  }
  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(): Int = {
    val one = new Array[Byte](1)
    val n = read(one, 0, 1)
    if (n <= 0) -1 else one(0) & 0xff
  }

  override def read(buf: Array[Byte], off: Int, len: Int): Int = {
    if (closed) throw new IOException(s"stream closed: $path")
    if (off < 0 || len < 0 || off + len > buf.length)
      throw new IndexOutOfBoundsException(
        s"read(off=$off, len=$len) into buf[${buf.length}]")
    if (len == 0) return 0
    if (pos >= fileLen) return -1
    val n = math.min(len.toLong, fileLen - pos).toInt
    readInternal(pos, buf, off, n)
    pos += n
    n
  }

  override def available(): Int =
    math.min(Int.MaxValue.toLong, fileLen - pos).toInt

  // ---- positioned + vectored reads (the Hadoop 3.3+ cloud-IO API the
  // reference predates). readInternal is stateless w.r.t. the stream
  // cursor, so positioned reads skip FSInputStream's default
  // synchronized(seek; read; seek-back) dance entirely — concurrent
  // positioned readers on one handle never contend, and the footer+
  // column-chunk pattern of a parquet reader stays lock-free. ----
  override def read(position: Long, buffer: Array[Byte], offset: Int,
      length: Int): Int = {
    if (closed) throw new IOException(s"stream closed: $path")
    if (offset < 0 || length < 0 || offset + length > buffer.length)
      throw new IndexOutOfBoundsException(
        s"read(pos=$position, off=$offset, len=$length) into buf[${buffer.length}]")
    if (position < 0) throw new EOFException(s"negative position $position")
    if (length == 0) return 0
    if (position >= fileLen) return -1
    val n = math.min(length.toLong, fileLen - position).toInt
    readInternal(position, buffer, offset, n)
    n
  }

  /** Vectored read: every range runs through the SAME chain planner as a
    * sequential read (cached blocks from disk, misses read-through +
    * warmed), so a vectored-IO parquet reader gets cache semantics for
    * free. Ranges are filled asynchronously on the shared chain pool
    * (completing each future as its range lands — the overlap with
    * caller-side decode is the point of the API); with the pool disabled
    * (readThreads=0) they fill inline before returning. */
  override def readVectored(
      ranges: java.util.List[_ <: org.apache.hadoop.fs.FileRange],
      allocate: java.util.function.IntFunction[java.nio.ByteBuffer]): Unit = {
    import scala.jdk.CollectionConverters._
    if (closed) throw new IOException(s"stream closed: $path")
    val rs = ranges.asScala.toVector
    rs.foreach { r =>
      if (r.getOffset < 0 || r.getLength < 0 ||
          r.getOffset + r.getLength > fileLen)
        throw new EOFException(
          s"vectored range [${r.getOffset}, +${r.getLength}) outside [0,$fileLen) for $path")
    }
    manager.metrics.vectoredRanges.addAndGet(rs.size.toLong)
    val futs = rs.map { r =>
      val f = new java.util.concurrent.CompletableFuture[java.nio.ByteBuffer]()
      r.setData(f)
      f
    }
    def fill(r: org.apache.hadoop.fs.FileRange,
        f: java.util.concurrent.CompletableFuture[java.nio.ByteBuffer]): Unit =
      try {
        val len = r.getLength
        val bb = allocate.apply(len)
        if (bb.hasArray) {
          readInternal(r.getOffset, bb.array(), bb.arrayOffset(), len)
          bb.limit(len); bb.position(0)
        } else {
          val tmp = new Array[Byte](len)
          readInternal(r.getOffset, tmp, 0, len)
          bb.put(tmp); bb.flip()
        }
        f.complete(bb)
      } catch { case e: Throwable => f.completeExceptionally(e) }
    if (conf.readThreads > 0 && rs.size > 1) {
      val pool = CachingInputStream.sharedPool(conf.readThreads)
      rs.zip(futs).foreach { case (r, f) =>
        pool.execute(() => fill(r, f))
      }
    } else rs.zip(futs).foreach { case (r, f) => fill(r, f) }
  }

  override def close(): Unit = {
    closed = true
    if (remoteStream != null) remoteStream.close()
    super.close()
  }

  // ---- core ----
  private def readInternal(at: Long, buf: Array[Byte], off: Int, len: Int): Unit = {
    if (!cacheAdmitted) { directRead(at, buf, off, len); return }
    if (conf.dummyMode) {
      // shadow mode: account cache state, store nothing
      val sb = BlockMath.startBlock(at, conf.blockSize)
      val eb = BlockMath.endBlock(at, len, conf.blockSize)
      val st = manager.getCacheStatus(path, fileLen, mtime, sb, eb)
      manager.setAllCached(path, fileLen, mtime, st.generation, sb, eb)
      directRead(at, buf, off, len)
      return
    }
    val sb = BlockMath.startBlock(at, conf.blockSize)
    val eb = BlockMath.endBlock(at, len, conf.blockSize)
    val status =
      try manager.getCacheStatus(path, fileLen, mtime, sb, eb)
      catch {
        case e: Throwable if !conf.strict =>
          directRead(at, buf, off, len); return
      }
    val chains = ReadPlanner.plan(at, len, fileLen, conf.blockSize,
      conf.maxReadRequestSize, status, sb)
    def runChain(chain: PlannedChain, ownStream: Boolean): Unit = chain match {
      case NonLocalChain(owner, rs) => executeNonLocal(owner, rs, buf, off, ownStream)
      case CachedChain(rs) => executeCached(rs, at, buf, off)
      case RemoteChain(rs)
        if conf.parallelWarmup && manager.warmup.isDefined =>
        // parallel-warmup routing (NonLocalRequestChain/RemoteFetch
        // analog): serve the caller via direct reads NOW, warm async
        readGroupRemote(rs, buf, off, ownStream)
        manager.warmup.get.enqueue(path, rs.head.backendStart,
          rs.last.backendEnd, fileLen, mtime)
      case RemoteChain(rs) =>
        executeRemote(rs, at, buf, off, status.generation, ownStream)
      case DirectChain(rs) => readGroupRemote(rs, buf, off, ownStream)
    }
    if (conf.readThreads > 0 && chains.size > 1) {
      // intra-read fan-out on the shared executor pool (reference: the
      // 100-thread readService, CachingInputStream.java:67-76 — sized
      // down per SURVEY risk 5). Chains touch disjoint buffer slices;
      // each chain doing source IO opens its own stream (parallel GETs
      // against an object store; positioned reads on one stream are not
      // reliably thread-safe on every FS).
      val pool = CachingInputStream.sharedPool(conf.readThreads)
      val futures = chains.map(c => pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = runChain(c, ownStream = true)
      }))
      var failure: Throwable = null
      futures.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (failure == null) failure = e.getCause
        }
      }
      if (failure != null) throw failure
    } else chains.foreach(runChain(_, ownStream = false))
  }

  private def directRead(at: Long, buf: Array[Byte], off: Int, len: Int): Unit =
    readFullyRemote(at, buf, off, len)

  /** Serve a COLLATED group's user windows with ONE source read: ranges
    * in a collated group are contiguous by construction
    * (ReadRange.collate merges on adjacency), so per-range reads would
    * multiply object-store round-trips by the block count — exactly on
    * the paths that open a dedicated stream per call. */
  private def readGroupRemote(rs: Vector[ReadRange], buf: Array[Byte],
      bufOff: Int, ownStream: Boolean): Unit = {
    if (rs.isEmpty) return
    val start = rs.head.actualStart
    val span = (rs.last.actualEnd - start).toInt
    readFullyRemote(start, buf, bufOff + rs.head.destOffset, span, ownStream)
  }

  private def readFullyRemote(at: Long, buf: Array[Byte], off: Int, len: Int,
      ownStream: Boolean = false): Unit = {
    if (len <= 0) return
    if (ownStream) {
      // dedicated stream per concurrent chain: parallel ranged reads
      val s = openRemote()
      try s.readFully(at, buf, off, len) finally s.close()
    } else remote.readFully(at, buf, off, len)
    manager.metrics.bytesFromRemote.addAndGet(len.toLong)
  }

  private def executeCached(rs: Vector[ReadRange], reqPos: Long,
      buf: Array[Byte], bufOff: Int): Unit = {
    val m = manager.metadataFor(path).orNull
    val file = if (m != null) m.dataFile else null
    // TOCTOU guard (r10 triple-stressor finding): between the planner's
    // getCacheStatus and this read, eviction can delete the entry and a
    // concurrent miss re-create it as a fresh SPARSE file at the same
    // generation path — and reading a hole "succeeds" with zeros, the
    // one failure mode the truncation/missing-file checks can't see.
    // deleteFiles() sets the deleted flag under the instance lock BEFORE
    // unlinking, so the optimistic read-validate below is race-free:
    // validate the CURRENT instance's bitmap covers every block (pre —
    // avoids wasted IO; a re-created sparse instance fails here), read,
    // then re-validate (post — if no deletion started during the reads,
    // the bytes came from a consistent file; otherwise re-serve direct).
    def covers: Boolean = rs.forall { r =>
      m.allCached(BlockMath.startBlock(r.actualStart, conf.blockSize),
        BlockMath.endBlock(r.actualStart, r.actualLen, conf.blockSize))
    }
    try {
      if (m == null || m.isDeleted || !file.exists())
        throw new IOException(s"cache entry missing for $path")
      if (!covers)
        throw new IOException(s"cache entry no longer covers read for $path")
      val ch = FileChannel.open(file.toPath, StandardOpenOption.READ)
      try {
        rs.foreach { r =>
          val bb = ByteBuffer.wrap(buf, bufOff + r.destOffset, r.actualLen)
          var p = r.actualStart
          while (bb.hasRemaining) {
            val n = ch.read(bb, p)
            if (n < 0) throw new EOFException(
              s"cached file truncated at $p (${file.getPath})")
            p += n
          }
        }
      } finally ch.close()
      if (!covers)
        throw new IOException(s"cache entry deleted during read of $path")
      rs.foreach(r =>
        manager.metrics.bytesFromCache.addAndGet(r.actualLen.toLong))
    } catch {
      case e: Exception =>
        // corruption fallback: invalidate and serve direct
        manager.metrics.corruptionFallbacks.incrementAndGet()
        manager.invalidate(path)
        if (conf.strict) throw e
        rs.foreach(r => readFullyRemote(r.actualStart, buf,
          bufOff + r.destOffset, r.actualLen))
    }
  }

  /** Peer-cache read (NonLocalReadRequestChain.java:107-146): one socket
    * round-trip for the collated contiguous span, straight into the user
    * buffer. Never warms the local cache — the owner's disk is the cache
    * for this split. Any failure (no registered peer, refused status,
    * socket error) falls back to a direct remote read; strict mode throws
    * (NonLocalReadRequestChain.java:147-157 fallback lattice).
    *
    * When the owner REFUSES (alive but range not cached / stale), also
    * ask it to warm its own cache for this range — the reference's
    * readData semantics (BookKeeper.java:514-617): without it a
    * locality-missed read never warms the owner, so repeated misses on a
    * split scheduled off its owner stay on the slow path forever. Warm is
    * fire-and-forget on the already-slow fallback path; transport errors
    * (owner down) send nothing. */
  private def executeNonLocal(owner: String, rs: Vector[ReadRange],
      buf: Array[Byte], bufOff: Int, ownStream: Boolean): Unit = {
    val start = rs.head.actualStart
    val span = (rs.last.actualEnd - start).toInt
    val dest = bufOff + rs.head.destOffset
    val addrOpt = PeerRegistry.lookup(owner)
    try {
      val addr = addrOpt.getOrElse(
        throw new IOException(s"no peer endpoint registered for $owner"))
      PeerTransferClient.read(addr, path, start, span, fileLen, mtime, buf, dest)
      manager.metrics.bytesFromPeers.addAndGet(span.toLong)
    } catch {
      case e: Exception =>
        manager.metrics.peerFallbacks.incrementAndGet()
        e match {
          case r: PeerRefusedException if r.status != PeerTransfer.StatusError =>
            try {
              manager.metrics.peerWarmsSent.incrementAndGet()
              PeerTransferClient.warm(addrOpt.get, path, start, span, fileLen, mtime)
            } catch { case _: Exception => /* hint only */ }
          case _ =>
        }
        if (conf.strict) throw e
        readGroupRemote(rs, buf, bufOff, ownStream)
    }
  }

  private def executeRemote(rs: Vector[ReadRange], reqPos: Long,
      buf: Array[Byte], bufOff: Int, generation: Int,
      ownStream: Boolean = false): Unit = {
    // one collated group = one contiguous backend span
    val backendStart = rs.head.backendStart
    val backendEnd = rs.last.backendEnd
    val span = (backendEnd - backendStart).toInt
    val scratch = CachingInputStream.scratchBuffer(span)
    readFullyRemote(backendStart, scratch, 0, span, ownStream)
    // hand the caller their windows
    rs.foreach { r =>
      System.arraycopy(scratch, (r.actualStart - backendStart).toInt,
        buf, bufOff + r.destOffset, r.actualLen)
      manager.metrics.extraReadBytes.addAndGet(r.extraBytes)
    }
    // write whole blocks into the sparse cache file + mark cached
    try {
      val m = manager.metadataFor(path).orNull
      if (m != null && m.generation == generation && !m.isDeleted) {
        val f = m.ensureDataFile()
        val ch = FileChannel.open(f.toPath, StandardOpenOption.WRITE)
        try {
          // bound the wrap: the pooled scratch may be longer than span
          val bb = ByteBuffer.wrap(scratch, 0, span)
          var written = 0
          while (bb.hasRemaining) {
            val n = ch.write(bb, backendStart + written)
            written += n
          }
        } finally ch.close()
        val sb = BlockMath.startBlock(backendStart, conf.blockSize)
        val eb = BlockMath.endBlock(backendStart, span.toLong, conf.blockSize)
        manager.setAllCached(path, fileLen, mtime, generation, sb, eb)
        manager.metrics.warmupBytes.addAndGet(span.toLong)
      }
    } catch {
      // the entry was retired between the guard and the write (eviction/
      // invalidation): a lost warm, never an error — the user's data was
      // already delivered from the source, strict or not
      case _: Exception if {
          val cur = manager.metadataFor(path)
          cur.isEmpty || cur.exists(x => x.isDeleted || x.generation != generation)
        } => // benign: cache miss persists
      case e: Exception if !conf.strict => // data already delivered; cache miss persists
      case e: Exception => throw e
    }
  }
}

object CachingInputStream {

  /** Per-thread reusable scratch for remote warmup spans (the reference
    * pools direct buffers for the same reason — per-read allocation churns
    * GC at high read concurrency, CachedReadRequestChain.java:109-134).
    * Spans are bounded by maxReadRequestSize; a SoftReference lets the GC
    * reclaim idle buffers under pressure. Thread-confined: chains run
    * either inline or on a dedicated pool thread, never sharing a span. */
  private val scratchRef = new ThreadLocal[java.lang.ref.SoftReference[Array[Byte]]]

  private[cache] def scratchBuffer(span: Int): Array[Byte] = {
    val ref = scratchRef.get()
    val cur = if (ref == null) null else ref.get()
    if (cur != null && cur.length >= span) cur
    else {
      val fresh = new Array[Byte](span)
      scratchRef.set(new java.lang.ref.SoftReference(fresh))
      fresh
    }
  }

  @volatile private var pool: java.util.concurrent.ExecutorService = _
  /** Shared bounded executor for intra-read chain fan-out (one per JVM —
    * NOT per stream: the reference's per-client 100-thread pool would
    * multiply across Spark task slots, SURVEY risk 5). */
  private[cache] def sharedPool(threads: Int): java.util.concurrent.ExecutorService = {
    if (pool == null) synchronized {
      if (pool == null) {
        val n = math.min(math.max(1, threads),
          Runtime.getRuntime.availableProcessors() * 2)
        pool = java.util.concurrent.Executors.newFixedThreadPool(n, r => {
          val t = new Thread(r, "graft-read-chain"); t.setDaemon(true); t
        })
      }
    }
    pool
  }
}
