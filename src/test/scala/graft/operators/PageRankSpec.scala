package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** d30's integer PageRank: the DataFrame iteration must agree node-for-
  * node with an independent in-memory implementation of the same
  * recurrence over the same derived edge list, and the recurrence's
  * structural invariants must hold. */
class PageRankSpec extends AnyFunSuite with BeforeAndAfterAll {
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

  test("DataFrame iteration matches an in-memory run of the recurrence") {
    val pairs = Tables.load(spark, dir, "lineitem")
      .select(col("l_suppkey").cast("long"), col("l_partkey").cast("long"))
      .distinct().collect()
      .map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val edges = pairs.flatMap { case (s, p) => Seq((s, p), (p, s)) }
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    var rank: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }.toMap
    (0 until GraphQueries.Iters).foreach { _ =>
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => rank(src) / deg(src) }.sum
      }
      rank = contrib.map { case (n, c) => n -> (150000L + 85L * c / 100L) }.toMap
    }
    val got = graft.SparkEntry.queries("d30_pagerank")(spark, dir).collect()
      .map(r => r.getAs[Long]("node") ->
        (r.getAs[Long]("degree"), r.getAs[Long]("rank_scaled"))).toMap
    assert(got.keySet == rank.keySet)
    got.foreach { case (n, (d, r)) =>
      assert(d == deg(n), s"degree of node $n")
      assert(r == rank(n), s"rank of node $n")
    }
  }

  test("structural invariants: floor rank, scale conservation band") {
    val rows = graft.SparkEntry.queries("d30_pagerank")(spark, dir).collect()
    assert(rows.nonEmpty)
    // every node keeps at least the damping floor
    assert(rows.forall(_.getAs[Long]("rank_scaled") >= 150000L))
    // integer-division leakage only shrinks total mass, never grows it
    val total = rows.map(_.getAs[Long]("rank_scaled")).sum
    assert(total <= rows.length * 1000000L)
    assert(total >= (rows.length * 1000000L * 9) / 10)
  }
}
