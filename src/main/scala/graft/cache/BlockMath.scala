package graft.cache

/** Block arithmetic for fixed-size cache blocks (reference:
  * rubix-spi CommonUtilities.java:29-76 semantics).
  *
  * Blocks are numbered from 0; a file of length L has
  * ceil(L / blockSize) blocks, the last possibly partial.
  */
object BlockMath {

  /** First block touched by byte offset `pos`. */
  def startBlock(pos: Long, blockSize: Int): Long = pos / blockSize

  /** Exclusive end block for range [pos, pos+len). len must be > 0. */
  def endBlock(pos: Long, len: Long, blockSize: Int): Long =
    (pos + len - 1) / blockSize + 1

  /** Number of blocks in a file of length `fileLen`. */
  def blockCount(fileLen: Long, blockSize: Int): Long =
    if (fileLen <= 0) 0 else (fileLen - 1) / blockSize + 1

  /** Byte offset where `block` starts. */
  def blockStart(block: Long, blockSize: Int): Long = block * blockSize

  /** Exclusive byte end of `block`, clamped to fileLen. */
  def blockEnd(block: Long, blockSize: Int, fileLen: Long): Long =
    math.min((block + 1) * blockSize, fileLen)

  /** Round `pos` down to its block boundary. */
  def alignDown(pos: Long, blockSize: Int): Long = (pos / blockSize) * blockSize

  /** Round `pos` up to the next block boundary (identity if aligned). */
  def alignUp(pos: Long, blockSize: Int): Long =
    ((pos + blockSize - 1) / blockSize) * blockSize
}
