package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.{Q, QueryModule}
import graft.util.Tables._

/** Graph analytics over relationship edges derived from the star
  * schema. Connected components (the other canonical graph op) lives
  * with the dedup pipeline in SimilarityQueries — this module holds
  * rank-propagation style iteration.
  *
  * Scale shape: classic Pregel-as-dataflow — per iteration one
  * equi-join (ranks ⋈ edges on src) and one aggregation (contributions
  * by dst), both keyed shuffles on node id. No adjacency matrix, no
  * driver-side graph state; a 100 TB edge list iterates exactly like
  * any other keyed join/agg pipeline.
  */
object GraphQueries extends QueryModule {

  /** PageRank (damping 0.85, 3 fixed iterations) on the undirected
    * supplier↔part co-purchase graph (distinct lineitem pairs; node id
    * = 2·suppkey / 2·partkey+1 so both key spaces share one BIGINT
    * domain). Determinism across engines: per-edge contributions are
    * rounded to 14 dp then summed as DECIMAL (order-independent);
    * each iteration's rank is re-rounded to 12 dp, so both engines
    * carry bit-identical doubles into the next round. The node count
    * rides along as a broadcast scalar — no driver-side collect.
    *
    * Like the component labeller (SimilarityQueries.labelComponents),
    * the iteration localCheckpoints its loop state: a pure-plan loop
    * re-executes iteration k−1 inside iteration k (total work grows
    * quadratically in rounds and the 3-round static plan already held
    * 37 exchanges); truncating lineage keeps per-round work constant
    * — one edges⋈ranks join + one aggregation — which is the Pregel
    * contract. Checkpointing changes WHERE results come from, never
    * what they are, so the DuckDB oracle is unaffected.
    */
  val pagerank = Q(
    "q_pagerank",
    (s, dir) => {
      val e0 = t(s, dir, "lineitem")
        .select((col("l_suppkey") * 2).as("a"), (col("l_partkey") * 2 + 1).as("b"))
        .distinct()
        .localCheckpoint(true) // ONE distinct scan; union below is map-side
      val edges = e0.union(e0.select(col("b").as("a"), col("a").as("b")))
      val deg = edges.groupBy(col("a")).agg(count(lit(1)).as("outdeg"))
      val n = deg.groupBy().agg(count(lit(1)).as("n_nodes"))
      var ranks: DataFrame = deg.crossJoin(broadcast(n))
        .select(col("a").as("node"), col("outdeg"), col("n_nodes"),
          round(lit(1.0) / col("n_nodes"), 12).as("r"))
        .localCheckpoint(true)
      for (_ <- 1 to 3) {
        val contrib = edges.join(ranks, edges("a") === ranks("node"))
          .select(col("b"),
            round(col("r") / col("outdeg"), 14).cast(DecimalType(28, 14)).as("c"))
        val sums = contrib.groupBy(col("b"))
          .agg(sum(col("c")).cast(DoubleType).as("csum"))
        ranks = ranks.join(sums, ranks("node") === sums("b"), "left")
          .select(col("node"), col("outdeg"), col("n_nodes"),
            round(lit(0.15) / col("n_nodes")
              + lit(0.85) * coalesce(col("csum"), lit(0.0)), 12).as("r"))
          .localCheckpoint(true)
      }
      ranks.select(col("node"), col("r").as("rank_r"))
        .orderBy(col("rank_r").desc, col("node"))
        .limit(25)
    },
    Some("""
      WITH e0 AS (
        SELECT DISTINCT l_suppkey * 2 AS a, l_partkey * 2 + 1 AS b
        FROM lineitem),
      edges AS (SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0),
      deg AS (SELECT a, count(*) AS outdeg FROM edges GROUP BY a),
      n AS (SELECT count(*) AS n_nodes FROM deg),
      r0 AS (
        SELECT a AS node, outdeg, n_nodes,
               round(CAST(1 AS DOUBLE) / n_nodes, 12) AS r
        FROM deg CROSS JOIN n),
      c1 AS (
        SELECT b, CAST(sum(CAST(round(r / outdeg, 14) AS DECIMAL(28,14))) AS DOUBLE) AS csum
        FROM edges JOIN r0 ON edges.a = r0.node GROUP BY b),
      r1 AS (
        SELECT node, outdeg, n_nodes,
               round(CAST(0.15 AS DOUBLE) / n_nodes + CAST(0.85 AS DOUBLE) * coalesce(csum, 0.0), 12) AS r
        FROM r0 LEFT JOIN c1 ON r0.node = c1.b),
      c2 AS (
        SELECT b, CAST(sum(CAST(round(r / outdeg, 14) AS DECIMAL(28,14))) AS DOUBLE) AS csum
        FROM edges JOIN r1 ON edges.a = r1.node GROUP BY b),
      r2 AS (
        SELECT node, outdeg, n_nodes,
               round(CAST(0.15 AS DOUBLE) / n_nodes + CAST(0.85 AS DOUBLE) * coalesce(csum, 0.0), 12) AS r
        FROM r1 LEFT JOIN c2 ON r1.node = c2.b),
      c3 AS (
        SELECT b, CAST(sum(CAST(round(r / outdeg, 14) AS DECIMAL(28,14))) AS DOUBLE) AS csum
        FROM edges JOIN r2 ON edges.a = r2.node GROUP BY b),
      r3 AS (
        SELECT node, outdeg, n_nodes,
               round(CAST(0.15 AS DOUBLE) / n_nodes + CAST(0.85 AS DOUBLE) * coalesce(csum, 0.0), 12) AS r
        FROM r2 LEFT JOIN c3 ON r2.node = c3.b)
      SELECT node, r AS rank_r FROM r3
      ORDER BY rank_r DESC, node LIMIT 25""")
  )

  override def all: Seq[Q] = Seq(pagerank)
}
