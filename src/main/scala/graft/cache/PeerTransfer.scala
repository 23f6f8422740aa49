package graft.cache

import java.io.{EOFException, IOException}
import java.net.{InetSocketAddress, StandardSocketOptions}
import java.nio.ByteBuffer
import java.nio.channels.{FileChannel, ServerSocketChannel, SocketChannel}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.StandardOpenOption
import java.util.concurrent.{ConcurrentHashMap, Executors}

/** Peer-to-peer cache transfer — the reference's LocalDataTransferServer
  * (rubix-bookkeeper LocalDataTransferServer.java:159-374) plus the client
  * half of NonLocalReadRequestChain (rubix-core
  * NonLocalReadRequestChain.java:107-146), re-expressed for Spark
  * executors. When the locality ring says another executor owns a split
  * and the scheduler could not honor the placement hint, the task fetches
  * the bytes from the owner's local disk cache over a raw socket instead
  * of re-reading the remote object store.
  *
  * Wire protocol (binary, one request per connection, mirroring
  * DataTransferHeader): request = [pathLen:Int][path UTF-8][offset:Long]
  * [length:Int][fileLen:Long][mtime:Long]; response = [status:Int] then,
  * iff status==0, exactly `length` payload bytes streamed zero-copy via
  * FileChannel.transferTo (LocalDataTransferServer.java:347-353).
  * Non-zero status means the server cannot serve (blocks not fully
  * cached, stale mtime, unknown file) and the caller must fall back.
  */
object PeerTransfer {
  val StatusOk = 0
  val StatusNotCached = 1
  val StatusStale = 2
  val StatusError = 3

  /** First-int sentinel selecting the warm-on-behalf-of-peer op (the
    * reference's BookKeeper.readData, BookKeeper.java:514-617): the
    * requester asks the OWNER to warm the owner's own cache for a range
    * the owner refused to serve. Read requests start with pathLen > 0,
    * so a negative sentinel is unambiguous on the wire. */
  val OpWarm: Int = -2
}

/** Owner refused the range (not cached / stale / error status) — the peer
  * is alive and reachable, as opposed to transport failures. Callers use
  * this to decide a warm request is worth sending. */
final class PeerRefusedException(msg: String, val status: Int)
  extends IOException(msg)

/** Executor-local socket server streaming cached byte ranges to peers.
  * Serves only ranges whose blocks are fully cached here — it never
  * triggers remote reads on behalf of a peer (the requester warms its own
  * owner-side cache via the normal warmup path). */
final class PeerTransferServer(manager: CacheManager,
    bindHost: String = "127.0.0.1", handlerThreads: Int = 4) {

  private val server = ServerSocketChannel.open()
  server.bind(new InetSocketAddress(bindHost, 0))
  @volatile private var running = true

  private val handlers = Executors.newFixedThreadPool(handlerThreads, r => {
    val t = new Thread(r, "graft-peer-handler"); t.setDaemon(true); t
  })
  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val ch = server.accept()
        try handlers.submit(new Runnable { override def run(): Unit = handle(ch) })
        catch { case t: Throwable => // pool rejected: don't leak the fd
          try ch.close() catch { case _: Throwable => }
          if (!running) throw t
        }
      } catch { case _: Throwable if !running => /* closed */
                case _: Throwable =>
                  // persistent failure (e.g. fd exhaustion): back off
                  // instead of spinning a hot loop
                  try Thread.sleep(50) catch { case _: InterruptedException => } }
    }
  }, "graft-peer-acceptor")
  acceptor.setDaemon(true)
  acceptor.start()

  def port: Int = server.socket().getLocalPort
  def address: InetSocketAddress = new InetSocketAddress(bindHost, port)

  private def handle(ch: SocketChannel): Unit = {
    // once StatusOk is on the wire, NEVER write again: a late error
    // status would be consumed by the client's payload loop as file
    // bytes (silent corruption). Closing mid-payload instead makes the
    // client hit EOF and take its fallback.
    var okSent = false
    try {
      ch.setOption[java.lang.Boolean](StandardSocketOptions.TCP_NODELAY, true)
      val head = ByteBuffer.allocate(4)
      readFully(ch, head)
      val first = head.getInt(0)
      if (first == PeerTransfer.OpWarm) { handleWarm(ch); return }
      val pathLen = first
      if (pathLen <= 0 || pathLen > (1 << 16)) { reply(ch, PeerTransfer.StatusError); return }
      val rest = ByteBuffer.allocate(pathLen + 8 + 4 + 8 + 8)
      readFully(ch, rest)
      rest.flip()
      val pathBytes = new Array[Byte](pathLen)
      rest.get(pathBytes)
      val path = new String(pathBytes, UTF_8)
      val offset = rest.getLong
      val length = rest.getInt
      val fileLen = rest.getLong
      val mtime = rest.getLong

      val m = manager.metadataFor(path).orNull
      if (m == null || m.isDeleted) { reply(ch, PeerTransfer.StatusNotCached); return }
      if (m.fileLen != fileLen ||
        (manager.conf.stalenessCheck && m.lastModified != mtime)) {
        reply(ch, PeerTransfer.StatusStale); return
      }
      val sb = BlockMath.startBlock(offset, manager.conf.blockSize)
      val eb = BlockMath.endBlock(offset, length.toLong, manager.conf.blockSize)
      if (!m.allCached(sb, eb)) { reply(ch, PeerTransfer.StatusNotCached); return }
      val file = m.dataFile
      if (!file.exists()) { reply(ch, PeerTransfer.StatusNotCached); return }

      reply(ch, PeerTransfer.StatusOk)
      okSent = true
      val fc = FileChannel.open(file.toPath, StandardOpenOption.READ)
      try {
        var sent = 0L
        while (sent < length) {
          val n = fc.transferTo(offset + sent, length - sent, ch)
          if (n <= 0) throw new IOException(s"transferTo stalled at $sent")
          sent += n
        }
      } finally fc.close()
      manager.metrics.bytesToPeers.addAndGet(length.toLong)
    } catch {
      case _: Throwable if !okSent =>
        try reply(ch, PeerTransfer.StatusError) catch { case _: Throwable => }
      case _: Throwable => // mid-payload failure: close only (see above)
    } finally {
      try ch.close() catch { case _: Throwable => }
    }
  }

  /** Warm-on-behalf-of-peer: same header layout as a read request after
    * the sentinel. The range is ENQUEUED on this node's WarmupService (the
    * delay-window merge dedups storms of warm requests for a hot split);
    * StatusOk means accepted, not yet warm — the requester keeps serving
    * itself via direct reads until a later locality-missed read hits. */
  private def handleWarm(ch: SocketChannel): Unit = {
    val lenBuf = ByteBuffer.allocate(4)
    readFully(ch, lenBuf)
    val pathLen = lenBuf.getInt(0)
    if (pathLen <= 0 || pathLen > (1 << 16)) { reply(ch, PeerTransfer.StatusError); return }
    val rest = ByteBuffer.allocate(pathLen + 8 + 4 + 8 + 8)
    readFully(ch, rest)
    rest.flip()
    val pathBytes = new Array[Byte](pathLen)
    rest.get(pathBytes)
    val path = new String(pathBytes, UTF_8)
    val offset = rest.getLong
    val length = rest.getInt
    val fileLen = rest.getLong
    val mtime = rest.getLong
    // validate BEFORE enqueue: this is the only wire input that reaches a
    // shared scheduled task, and a degenerate range would throw inside
    // the drainer (killing all future drains for the JVM lifetime)
    if (offset < 0 || length <= 0 || fileLen <= 0 || offset >= fileLen) {
      reply(ch, PeerTransfer.StatusError); return
    }
    manager.warmup match {
      case Some(w) =>
        w.enqueue(path, offset, math.min(offset + length, fileLen), fileLen, mtime)
        manager.metrics.peerWarmsAccepted.incrementAndGet()
        reply(ch, PeerTransfer.StatusOk)
      case None => reply(ch, PeerTransfer.StatusNotCached)
    }
  }

  private def reply(ch: SocketChannel, status: Int): Unit = {
    val b = ByteBuffer.allocate(4).putInt(status)
    b.flip()
    while (b.hasRemaining) ch.write(b)
  }

  private def readFully(ch: SocketChannel, b: ByteBuffer): Unit = {
    while (b.hasRemaining)
      if (ch.read(b) < 0) throw new EOFException("peer closed mid-header")
  }

  def close(): Unit = {
    running = false
    try server.close() catch { case _: Throwable => }
    handlers.shutdownNow()
  }
}

/** Client half: fetch one byte range from a peer's disk cache. Throws on
  * any non-OK status; the caller (NonLocal chain) owns the fallback.
  * Uses plain Socket streams so `soTimeout` bounds EVERY read — a hung
  * peer (GC pause, partition after connect) must surface as an exception
  * the caller can fall back from, never an indefinitely blocked task
  * (blocking SocketChannel reads ignore soTimeout). */
object PeerTransferClient {
  def read(addr: InetSocketAddress, path: String, offset: Long, length: Int,
      fileLen: Long, mtime: Long, buf: Array[Byte], bufOff: Int,
      connectTimeoutMs: Int = 2000, readTimeoutMs: Int = 10000): Unit = {
    val sock = new java.net.Socket()
    try {
      sock.connect(addr, connectTimeoutMs)
      sock.setSoTimeout(readTimeoutMs)
      sock.setTcpNoDelay(true)
      val pathBytes = path.getBytes(UTF_8)
      val req = ByteBuffer.allocate(4 + pathBytes.length + 8 + 4 + 8 + 8)
      req.putInt(pathBytes.length).put(pathBytes)
        .putLong(offset).putInt(length).putLong(fileLen).putLong(mtime)
      val out = sock.getOutputStream
      out.write(req.array(), 0, req.position())
      out.flush()

      val in = sock.getInputStream
      val head = new Array[Byte](4)
      readFully(in, head, 0, 4, s"peer closed on header ($path@$offset)")
      val status = ByteBuffer.wrap(head).getInt
      if (status != PeerTransfer.StatusOk)
        throw new PeerRefusedException(
          s"peer refused range ($path@$offset+$length): status $status", status)
      readFully(in, buf, bufOff, length, s"peer closed mid-payload ($path@$offset)")
    } finally sock.close()
  }

  /** Ask the owner to warm ITS cache for [offset, offset+length) — the
    * reference's readData RPC (BookKeeper.java:514-617). Returns true iff
    * the owner accepted the request (it warms asynchronously). Short
    * timeouts: this is an optimization hint on the miss path, never worth
    * stalling the caller's direct read for. */
  def warm(addr: InetSocketAddress, path: String, offset: Long, length: Int,
      fileLen: Long, mtime: Long,
      connectTimeoutMs: Int = 1000, readTimeoutMs: Int = 2000): Boolean = {
    val sock = new java.net.Socket()
    try {
      sock.connect(addr, connectTimeoutMs)
      sock.setSoTimeout(readTimeoutMs)
      sock.setTcpNoDelay(true)
      val pathBytes = path.getBytes(UTF_8)
      val req = ByteBuffer.allocate(4 + 4 + pathBytes.length + 8 + 4 + 8 + 8)
      req.putInt(PeerTransfer.OpWarm)
        .putInt(pathBytes.length).put(pathBytes)
        .putLong(offset).putInt(length).putLong(fileLen).putLong(mtime)
      val out = sock.getOutputStream
      out.write(req.array(), 0, req.position())
      out.flush()
      val head = new Array[Byte](4)
      readFully(sock.getInputStream, head, 0, 4, s"peer closed on warm ack ($path@$offset)")
      ByteBuffer.wrap(head).getInt == PeerTransfer.StatusOk
    } finally sock.close()
  }

  private def readFully(in: java.io.InputStream, buf: Array[Byte],
      off: Int, len: Int, eofMsg: String): Unit = {
    var done = 0
    while (done < len) {
      val n = in.read(buf, off + done, len - done)
      if (n < 0) throw new EOFException(eofMsg)
      done += n
    }
  }
}

/** Node-id -> peer-server address map. On a real cluster each executor
  * registers its server's port with the driver CacheCoordinator heartbeat
  * and the map is broadcast back (the analog of the reference's
  * ClusterManager node list + fixed LDTS port 8898); in local/test mode
  * entries are registered directly. Missing entries simply disable the
  * peer path for that owner — locality stays a hint, never correctness. */
object PeerRegistry {
  private val peers = new ConcurrentHashMap[String, InetSocketAddress]()
  def register(node: String, addr: InetSocketAddress): Unit = peers.put(node, addr)
  def lookup(node: String): Option[InetSocketAddress] = Option(peers.get(node))
  def unregister(node: String): Unit = peers.remove(node)
  def clear(): Unit = peers.clear()
}

/** Split-ownership resolver feeding getCacheStatus: which node owns the
  * split containing a byte offset, and who am I (reference
  * BookKeeper.java:321-341 ring consultation). */
final case class SplitOwnership(selfNode: String,
    resolve: (String, Long) => Option[String])

object SplitOwnership {
  /** Ring-backed resolver over the live ClusterState membership. */
  def fromClusterState(selfNode: String, splitSize: Long): SplitOwnership =
    SplitOwnership(selfNode,
      (path, off) => ClusterState.ring.flatMap(_.locateSplit(path, off, splitSize)))
}
