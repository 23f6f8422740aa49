package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction sized by bytes, not a constant.
  *
  * The output file count is `ceil(input data bytes / targetFileBytes)` —
  * the number a table-maintenance service would pick (reference caches
  * whatever layout it is given; the 100 TB pipeline wants ~one block-sized
  * file per output task, independent of how shattered the input arrived).
  * Input bytes come from the FileSystem listing of the source directory
  * (compressed parquet bytes — the output is the same format, so the
  * compressed-size estimate is the right currency; per-file footer
  * overhead makes the compacted copy slightly smaller, never larger).
  */
object Compaction {

  /** Total bytes of data files under `path` (skips _SUCCESS etc.).
    * Recurses via listStatus rather than listFiles(recursive): the
    * LocatedFileStatus path eagerly loads POSIX permissions through the
    * raw URI, which a wrapping scheme like graft:// can't satisfy. */
  def dataBytes(spark: SparkSession, path: String): Long = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def walk(dir: Path): Long =
      fs.listStatus(dir).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.startsWith("_") ||
                 st.getPath.getName.startsWith(".")) 0L
        else st.getLen
      }.sum
    walk(p)
  }

  /** Rewrite `src` into `dst` as `ceil(bytes/targetFileBytes)` files.
    * Returns the chosen file count. */
  def compact(spark: SparkSession, src: String, dst: String,
              targetFileBytes: Long): Int = {
    val bytes = dataBytes(spark, src)
    val n = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(src).repartition(n)
      .write.mode("overwrite").parquet(dst)
    n
  }
}
