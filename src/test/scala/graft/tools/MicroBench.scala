package graft.tools

/** Ad-hoc repeated timing of individual gate queries (not a test; run via
  * `sbt "Test/runMain graft.tools.MicroBench q21_string_funcs q31_approx_distinct"`).
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "4").toInt
    val spark = graft.GraftSession.builder(master = "local[32]",
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same warmup as Bench
    Seq("q01_pricing_summary", "q05_region_revenue", "q14_window_rank").foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    args.foreach { name =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
