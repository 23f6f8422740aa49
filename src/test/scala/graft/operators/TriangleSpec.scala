package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d41's degree-ordered orientation: the whole point is that a hub's
  * oriented out-degree is far below its raw degree (wedge work is
  * sum(outdeg²), so this is the difference between linear-ish and
  * quadratic hub cost). Measured on the real co-purchase graph, plus a
  * total-count cross-check against the naive a<b<c enumeration. */
class TriangleSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _
  private val dir = "/root/testdata/sf0.001"

  override def beforeAll(): Unit = {
    spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def edges = {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    li.as("x").join(li.as("y"),
        col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b")).distinct()
  }

  test("orientation bounds the hub: max oriented out-degree obeys the sqrt(2m) law") {
    val e = edges.persist()
    val m = e.count()
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    val maxRaw = deg.agg(max("d")).head().getLong(0)
    val oriented = e
      .join(deg.select(col("node").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("d").as("db")), Seq("b"))
      .select(when(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")), col("a"))
        .otherwise(col("b")).as("src"))
    val maxOut = oriented.groupBy("src").agg(count(lit(1)).as("od"))
      .agg(max("od")).head().getLong(0)
    e.unpersist()
    // the classic guarantee: under degree ordering, out-degree <= sqrt(2m)
    // REGARDLESS of the raw hub degree (which is unbounded at scale) —
    // this is what turns sum(outdeg^2) wedge work from quadratic-in-hub
    // to linear-ish in m. Raw max degree here: 138 on 73-capped out-deg.
    val bound = math.ceil(math.sqrt(2.0 * m)).toLong
    assert(maxOut <= bound,
      s"sqrt(2m) violated: max out-degree $maxOut > $bound (m=$m, raw max degree $maxRaw)")
  }

  test("per-part counts sum to 3x the naive triangle enumeration") {
    val naive = edges.as("e1")
      .join(edges.as("e2"), col("e1.b") === col("e2.a"))
      .join(edges.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .count()
    val perPart = graft.SparkEntry.queries("d41_triangles")(spark, dir)
    val sum = perPart.agg(org.apache.spark.sql.functions.sum("n_tri"))
      .head().getLong(0)
    assert(sum === naive * 3,
      s"oriented enumeration disagrees: $sum vs 3 x $naive")
  }
}
