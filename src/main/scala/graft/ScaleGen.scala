package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale step-up corpus generator (SCALE.md): tiles the read-only
  * driver corpus T× by disjoint key translation — the TPC-H scaling
  * model (fact/entity row counts grow linearly, the fixed dims
  * region/nation stay fixed, per-key degree distributions stay
  * constant, so a T× corpus means T× work for linear operators and
  * T^e× for superlinear ones, which is exactly what the probe wants to
  * measure).
  *
  * Two columns need more than a key offset, because naive replication
  * would PLANT cross-tile near-duplicate structure the original recipe
  * doesn't have (every doc would gain T-1 twins, inflating dedup truth
  * sets quadratically in T):
  *
  *  - `documents.text`: per-tile bijective VOCABULARY substitution —
  *    token w is renamed w~t iff xxhash64(w, t) is even (~half the
  *    vocabulary per tile, tile 0 untouched). A position-free bijection
  *    on the vocabulary commutes with `\S+` tokenization and with
  *    shingling, so every intra-tile token-set / shingle-set Jaccard is
  *    EXACTLY the source corpus value (d06/d10/d42 workload per tile is
  *    byte-for-byte the sf0.1 workload), while two tiles' copies of the
  *    same doc share only the tokens renamed in neither tile (~1/4 of
  *    the vocab → Jaccard ≈ 1/7, far below every dedup threshold).
  *    The corpus has single-space token separators only (verified), so
  *    split-on-space == `\S+` tokenization.
  *  - `embeddings.embedding`: per-tile random ORTHOGONAL ROTATION
  *    (seeded Gram-Schmidt, tile 0 = identity). A rotation preserves
  *    every intra-tile cosine exactly (d09/d26/e* workload per tile ==
  *    source workload) while cross-tile cosines drop to ~N(0, 1/√64)
  *    (|cos| ≲ 0.3) — below the d09/d26 0.35 dup threshold.
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <outDir> <tiles> [parts]
  *
  * `parts` (default 16) is the number of part files per table: the
  * r10 corpora were single files, which STARVES scan parallelism (one
  * input split per table until maxPartitionBytes kicks in) and made
  * absolute sf1 numbers conservative. Tables are now written as
  * `<table>.parquet/` DIRECTORIES of `parts` files — the layout a real
  * warehouse has — which both the batch readers (spark.read.parquet
  * handles directories natively) and the streaming sources (directory
  * layout support, d0612e0) accept. The tiny fixed dims region/nation
  * stay single-part.
  */
object ScaleGen {

  /** Deterministic orthogonal 64×64 matrix: Gram-Schmidt over a seeded
    * Gaussian matrix. Tile 0 is the identity (source rows unchanged). */
  def rotation(dim: Int, seed: Long): Array[Array[Float]] = {
    if (seed == 0) return Array.tabulate(dim, dim)((i, j) => if (i == j) 1f else 0f)
    val rnd = new java.util.Random(seed)
    val m = Array.fill(dim, dim)(rnd.nextGaussian())
    for (i <- 0 until dim) {
      for (j <- 0 until i) {
        val d = (0 until dim).map(k => m(i)(k) * m(j)(k)).sum
        for (k <- 0 until dim) m(i)(k) -= d * m(j)(k)
      }
      val n = math.sqrt((0 until dim).map(k => m(i)(k) * m(i)(k)).sum)
      require(n > 1e-9, s"degenerate Gram-Schmidt row $i at seed $seed")
      for (k <- 0 until dim) m(i)(k) /= n
    }
    m.map(_.map(_.toFloat))
  }

  def main(args: Array[String]): Unit = {
    val (src, out, tiles, parts, embMult) = args match {
      case Array(s, o, t) => (s, o, t.toInt, 16, 1)
      case Array(s, o, t, p) => (s, o, t.toInt, p.toInt, 1)
      case Array(s, o, t, p, em) => (s, o, t.toInt, p.toInt, em.toInt)
      case _ => sys.error(
        "usage: ScaleGen <srcSfDir> <outDir> <tiles> [parts] [embMult]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def load(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")
    // <table>.parquet as a DIRECTORY of `parts` files (real-warehouse
    // layout; scans get `parts` input splits). nParts = 1 keeps the tiny
    // fixed dims compact.
    def save(df: DataFrame, t: String, nParts: Int = parts): Unit = {
      val dest = s"$out/$t.parquet"
      df.repartition(nParts).write.mode("overwrite").parquet(dest)
      println(s"[scalegen] $t -> $dest ($nParts part files)")
    }

    // key strides = max(key)+1 of the SOURCE, so tiles never collide
    def stride(t: String, k: String): Long =
      load(t).agg(max(col(k))).head.getLong(0) + 1L

    val oStride = stride("orders", "o_orderkey")
    val cStride = stride("customer", "c_custkey")
    val sStride = stride("supplier", "s_suppkey")
    val pStride = stride("part", "p_partkey")
    val dStride = stride("documents", "doc_id")
    val vStride = stride("embeddings", "vec_id")
    val eStride = stride("events", "event_id")
    val uStride = stride("events", "user_id")

    def tiled(t: String)(tf: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until tiles).map(i => tf(load(t), i)).reduce(_ unionAll _)

    // fixed dims: TPC-H keeps region/nation constant across SFs
    save(load("region"), "region", nParts = 1)
    save(load("nation"), "nation", nParts = 1)

    save(tiled("customer") { (df, t) =>
      df.withColumn("c_custkey", col("c_custkey") + lit(t * cStride))
    }, "customer")
    save(tiled("supplier") { (df, t) =>
      df.withColumn("s_suppkey", col("s_suppkey") + lit(t * sStride))
    }, "supplier")
    save(tiled("part") { (df, t) =>
      df.withColumn("p_partkey", col("p_partkey") + lit(t * pStride))
    }, "part")
    save(tiled("orders") { (df, t) =>
      df.withColumn("o_orderkey", col("o_orderkey") + lit(t * oStride))
        .withColumn("o_custkey", col("o_custkey") + lit(t * cStride))
    }, "orders")
    save(tiled("lineitem") { (df, t) =>
      df.withColumn("l_orderkey", col("l_orderkey") + lit(t * oStride))
        .withColumn("l_partkey", col("l_partkey") + lit(t * pStride))
        .withColumn("l_suppkey", col("l_suppkey") + lit(t * sStride))
    }, "lineitem")
    save(tiled("events") { (df, t) =>
      df.withColumn("event_id", col("event_id") + lit(t * eStride))
        .withColumn("user_id", col("user_id") + lit(t * uStride))
    }, "events")

    // documents: key offset + the per-tile vocabulary substitution
    save(tiled("documents") { (df, t) =>
      val text =
        if (t == 0) col("text")
        else array_join(
          transform(split(col("text"), " "), w =>
            when(length(w) > 0 && pmod(xxhash64(w, lit(t)), lit(2)) === 0,
              concat(w, lit("~" + t))).otherwise(w)),
          " ")
      df.withColumn("doc_id", col("doc_id") + lit(t * dStride))
        .withColumn("text", text)
        .withColumn("n_chars", length(col("text")).cast("long"))
    }, "documents")

    // embeddings: key offset + the per-tile orthogonal rotation.
    // `embMult` multiplies the embeddings row count INDEPENDENTLY of the
    // table tiling (r12): the driver corpus has a fixed ~2k-row
    // embeddings table at every SF, so a 1× probe point is dominated by
    // fixed per-query overhead and e-tier exponents read ~0 for the
    // wrong reason (SCALE.md r11). With embMult=M, every tile carries M
    // distinct sub-rotations — effectively M·tiles disjoint tiles of the
    // source table — so the 1× absolute is non-degenerate and step-ups
    // measure real variable cost. Same no-planted-similarity argument:
    // intra-sub-tile cosines are exactly the source values, cross pairs
    // land at ~N(0, 1/√64).
    val embTiles = (0 until tiles * embMult).map { t =>
      val q = rotation(64, seed = if (t == 0) 0L else 42L + t)
      val off = t * vStride
      load("embeddings")
        .select(col("vec_id"), col("embedding"), col("label"))
        .as[(Long, Array[Float], Int)]
        .map { case (id, v, lbl) =>
          val r = Array.tabulate(64) { i =>
            var s = 0.0
            var k = 0
            while (k < 64) { s += q(i)(k) * v(k); k += 1 }
            s.toFloat
          }
          (id + off, r, lbl)
        }
        .toDF("vec_id", "embedding", "label")
        .withColumn("label", col("label").cast("int"))
    }
    save(embTiles.reduce(_ unionAll _), "embeddings")

    println(s"[scalegen] done: $tiles tiles of $src -> $out")
    spark.stop()
  }
}
