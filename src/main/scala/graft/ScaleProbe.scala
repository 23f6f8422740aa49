package graft

import org.apache.spark.sql.SparkSession

/** Scale step-up probe runner (SCALE.md): times a subset of
  * SparkEntry.queries against an arbitrary (possibly ScaleGen-tiled)
  * table dir — Bench's methodology (noop sink, PinScope per rep, cold
  * discarded, median of 3 warm) without dragging the full 157-query
  * suite through every scale point.
  *
  * Usage: runMain graft.ScaleProbe <sfDir> <q1,q2,...> [reps=3]
  * Prints one JSON line: {"metric":"scale_probe","sf":...,"queries":{...}}
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(',').toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // scale arms: operator bodies whose GATE entry caps its input for
    // oracle tractability — a capped input measures constant work at
    // every SF, so the probe needs the uncapped body
    val scaleArms: Map[String, (SparkSession, String) =>
        org.apache.spark.sql.DataFrame] = Map(
      "d42_uncapped" -> ((s, d) =>
        operators.DedupQueries.setSimJoin(s, d, cap = None)),
      // d26's PRODUCTION arm with the documented 100 TB discipline: the
      // IVF cell count grows with the corpus (k ∝ n, cells stay ~125
      // vectors) so cell-blocked candidate volume stays linear — the
      // gate query's k=16 toy constant is for the sf-pinned recall
      // contract, not the scale path
      "d26_quant_scaledk" -> { (s, d) =>
        val e = operators.Tables.load(s, d, "embeddings")
        val n = e.count()
        val k = math.max(16, (n / 125).toInt)
        operators.DedupQueries.quantSemanticPairs(s, e, 0.35, k = k, nprobe = 8)
      },
      // d56's PRODUCTION path: the deterministic 1/4 edge sample +
      // degree-ordered count, WITHOUT the exact arm (the gate runs both
      // for the in-band error contract; a real corpus runs only this)
      "d56_estimator_only" -> { (s, d) =>
        import org.apache.spark.sql.functions._
        val es = operators.GraphQueries.canonicalEdges(s, d)
          .filter(expr("(a * 100003L + b * 7919L) % 1000000L") < 250000L)
          .persist()
        operators.GraphQueries.trianglesOf(es)
          .agg((count(lit(1)) * 64).as("est_triangles"))
      },
      // e22's PRODUCTION shape: benchmark suites are fixed-size while
      // the train corpus grows, so the probe caps the bench side to the
      // source tile's rows (vec_id < 2000). The gate's uncapped formula
      // on a ScaleGen corpus grows BOTH sides (bench ∝ n → quadratic
      // work) — that regime is the tiling artifact, not the operator.
      // e24's PRODUCTION day job: assign the batch to the existing
      // centroids, probe the merged index, compute the drift contract —
      // WITHOUT the exact arm (gate-only truth target). Store-side
      // terms (training sample, store assignment for the merged index
      // and drift baseline) are reconstructed in-run, the d57-class
      // honesty cost; a deployment reads them from bootstrap artifacts.
      "e24_maintenance_only" -> { (s, d) =>
        import org.apache.spark.sql.functions._
        val (_, ivf, _, drift) = operators.VectorQueries.incIvfArms(s, d)
        ivf.crossJoin(broadcast(drift))
      },
      "e22_fixed_bench" -> { (s, d) =>
        import org.apache.spark.sql.functions._
        val e = operators.Tables.load(s, d, "embeddings")
        val bench = broadcast(
          e.filter(pmod(col("vec_id"), lit(50)) === 0 && col("vec_id") < 2000)
            .select(col("vec_id").as("bid"), col("embedding").as("be")))
        e.filter(pmod(col("vec_id"), lit(50)) =!= 0)
          .select(col("vec_id").as("tid"), col("embedding").as("te"))
          .join(bench)
          .withColumn("cos",
            graft.functions.VectorOps.cosineSim(col("te"), col("be")))
          .groupBy("tid").agg(max("cos").as("mc"))
          .select(col("tid"), (col("mc") >= 0.92).as("contaminated"))
      })

    def once(n: String): Double = PinScope.run(spark) {
      val t0 = System.nanoTime()
      scaleArms.getOrElse(n, SparkEntry.queries(n))(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    val med = names.map { n =>
      once(n) // cold: codegen + JIT, discarded
      val ts = Seq.fill(reps)(once(n)).sorted
      val m = ts(ts.size / 2)
      println(f"""{"q":"$n","med":$m%.3f,"min":${ts.head}%.3f,"max":${ts.last}%.3f}""")
      n -> m
    }
    val qs = med.map { case (n, m) => f""""$n":$m%.3f""" }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_probe","sf":"$dir","queries":$qs}""")
    spark.stop()
  }
}
