package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Degradation-proof layout (r18, from the r17 postmortem — a driver-side
  * kill of this run zeroed the entire round's correctness to `{}`):
  *   1. oracle_sql.json is written FIRST — it is a pure function of the
  *      SparkEntry definitions, so a verify run killed mid-dump still
  *      yields a partial CORRECTNESS table instead of an empty one;
  *   2. queries dump in ASCENDING quiet-cost order (cheap scans first,
  *      the composed d47/d57/s15 chains last), so a timeout preserves
  *      maximal evidence;
  *   3. one stdout+stderr progress line per query, so a killed run's log
  *      says exactly where the wall-clock went. */
object Verify {
  /** Quiet-window per-query cold costs (short-id keyed) from the bench's
    * committed reference — relative order is SF-independent. Queries
    * missing from the file fall back to a prefix-class heuristic. */
  private def costOf: String => Double = {
    val ref: Map[String, Double] =
      try {
        val t = new String(java.nio.file.Files.readAllBytes(
          Paths.get("tools/bench_quiet_reference.json")), "UTF-8")
        "\"cold_queries\":\\{([^{}]*)\\}".r.findFirstMatchIn(t)
          .map(_.group(1)).map { frag =>
            "\"([A-Za-z][A-Za-z0-9]*)\":([0-9.]+)".r.findAllMatchIn(frag)
              .map(m => m.group(1) -> m.group(2).toDouble).toMap
          }.getOrElse(Map.empty)
      } catch { case _: Exception => Map.empty[String, Double] }
    val classDefault = Map('q' -> 2.0, 'c' -> 3.0, 'm' -> 1.0, 'e' -> 2.0,
      'd' -> 5.0, 's' -> 20.0)
    name => ref.getOrElse(name.takeWhile(_ != '_'),
      classDefault.getOrElse(name.head, 10.0))
  }

  private[graft] def orderedNames(names: Seq[String]): Seq[String] = {
    val cost = costOf
    names.sortBy(cost) // stable: ties keep gate order
  }

  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val (sfDir, outDir, only) = args match {
      case Array(a, b)    => (a, b, None)
      case Array(a, b, c) => (a, b, Some(c.split(',').toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // static output FIRST (r18): nothing before this point touches the
    // data, so the oracle side of the compare survives any later kill
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val t0 = System.nanoTime()
    val todo = orderedNames(SparkEntry.allDefs.map(_.name))
      .filter(name => only.forall(_.contains(name)))
    todo.zipWithIndex.foreach { case (name, i) =>
      // PinScope: persisted intermediates must not accumulate across the
      // 185-query dump (same leak the bench guards against).
      val tq = System.nanoTime()
      val status =
        try {
          PinScope.run(spark) {
            SparkEntry.queries(name)(spark, sfDir).coalesce(1)
              .write.mode("overwrite").parquet(s"$outDir/$name")
          }
          "ok"
        } catch { case e: Throwable =>
          s"FAILED: ${String.valueOf(e.getMessage).take(200)}"
        }
      val line = f"[verify] ${i + 1}%3d/${todo.size} $name%-28s " +
        f"${(System.nanoTime() - tq) / 1e9}%6.1fs  " +
        f"(total ${(System.nanoTime() - t0) / 1e9}%7.1fs)  $status"
      println(line)
      if (status != "ok") System.err.println(line)
    }
    spark.stop()
  }
}

/** Time-pressure fallback (r17 verdict #7): the 15 cache-critical c*
  * queries plus a representative cross-section of every other family,
  * dumped through the same machinery — partial evidence beats `{}`.
  * Usage: runMain graft.VerifyLite <sfDir> <outDir> */
object VerifyLite {
  private val Representatives = Seq(
    "q01_pricing_summary", "q03_top_revenue", "q14_window_rank",
    "q52_recursive_cte", "d04_dedup_exact", "d06_dedup_minhash_lsh",
    "d47_pipeline_pack", "e07_ann_rerank", "e16_ivfpq", "m12_png_decode",
    "s01_stream_window", "s13_stream_ingest_dedup")
  def main(args: Array[String]): Unit = {
    val names = SparkEntry.allDefs.map(_.name)
    val lite = names.filter(n =>
      n.startsWith("c") || Representatives.contains(n))
    Verify.main(Array(args(0), args(1), lite.mkString(",")))
  }
}
