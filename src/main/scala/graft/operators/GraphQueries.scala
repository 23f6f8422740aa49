package graft.operators

import org.apache.spark.sql.functions._

/** Iterative graph analytics over a graph derived from the relational
  * tables — the d10/d25 connected-components machinery's centrality
  * sibling, and the canonical "iterative join + aggregate" shape a
  * training-data pipeline runs for link-based quality signals (PageRank
  * over a citation/link graph).
  *
  * Determinism contract: classic PageRank is float arithmetic, which no
  * cross-engine hash gate can pin. This runs the SAME recurrence in exact
  * scaled-integer arithmetic (rank scaled by 1e6; contribution = rank div
  * degree; damping 0.85 as `(85 * x) div 100`) — every value is a
  * non-negative integer and both engines' integer division truncates
  * identically, so the full rank table rides the hash oracle.
  *
  * Scale shape: each iteration is one shuffle join of the edge list with
  * the (node, rank) frame on `src` plus one aggregation on `dst` — the
  * standard Pregel-on-DataFrames pattern. The edge list and degree table
  * are persisted once and reused by every iteration; only the narrow
  * (node, long) rank frame changes per pass. Lineage grows linearly in
  * the (fixed, small) iteration count; a long-running variant would
  * localCheckpoint every ~10 passes like d10's fixpoint does.
  */
object GraphQueries {

  val RankScale = 1000000L
  val Iters = 4

  private def pagerankOracle(iters: Int): String = {
    val head =
      """WITH pairs AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
        |edges AS (
        |  SELECT CAST(l_suppkey*2 AS BIGINT) AS src, CAST(l_partkey*2+1 AS BIGINT) AS dst FROM pairs
        |  UNION ALL
        |  SELECT CAST(l_partkey*2+1 AS BIGINT) AS src, CAST(l_suppkey*2 AS BIGINT) AS dst FROM pairs),
        |deg AS (SELECT src AS node, count(*) AS d FROM edges GROUP BY src),
        |r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg)""".stripMargin
    val steps = (0 until iters).map { i =>
      s"""r${i + 1} AS (
         |  SELECT e.dst AS node, CAST(150000 + (85 * sum(r.r // d.d)) // 100 AS BIGINT) AS r
         |  FROM edges e JOIN r$i r ON e.src = r.node JOIN deg d ON d.node = e.src
         |  GROUP BY e.dst)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"""
         |SELECT f.node, CAST(d.d AS BIGINT) AS degree, f.r AS rank_scaled
         |FROM r$iters f JOIN deg d ON d.node = f.node""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- integer PageRank over the supplier<->part bipartite graph
    // (undirected: every supplier-part pair from lineitem contributes an
    // edge each way, so no dangling nodes and the node set is stable
    // across iterations). 4 damped iterations; full rank table emitted
    // (suppliers at node 2s, parts at 2p+1). The oracle unrolls the same
    // recurrence as chained CTEs. ----
    QueryDef("d30_pagerank", pagerankOracle(Iters)) { (s, dir) =>
      val pairs = Tables.load(s, dir, "lineitem")
        .select((col("l_suppkey") * 2).cast("long").as("a"),
          (col("l_partkey") * 2 + 1).cast("long").as("b"))
        .distinct()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
        .persist()
      val deg = edges.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("d")).persist()
      var ranks = deg.select(col("node"), lit(RankScale).as("r"))
      (0 until Iters).foreach { _ =>
        // share = rank div degree, joined once per iteration; the edge
        // join shuffles on src, the aggregate on dst — both on the node
        // id, so AQE coalesces and the wide tables never move
        val share = ranks.join(deg, "node")
          .select(col("node").as("src"), expr("r div d").as("c"))
        ranks = edges.join(share, "src")
          .groupBy(col("dst").as("node"))
          .agg(expr("CAST(150000 + (85 * sum(c)) div 100 AS BIGINT)").as("r"))
      }
      ranks.join(deg, "node")
        .select(col("node"), col("d").cast("long").as("degree"),
          col("r").as("rank_scaled"))
    }
  )
}
