package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/** Link-graph operators (SURVEY.md §2i, crawl-curation layer).
  *
  * Web-scale training pipelines weight documents by link-graph signals
  * (host-level PageRank over the crawl graph is the classic quality
  * prior). The reference checkout is empty (SURVEY.md §0), so no
  * file:line citation is possible; the operator follows the standard
  * published power-iteration schedule.
  *
  * Scale shape: one PageRank iteration is two key shuffles — out-degree
  * by source, contribution sum by destination — exactly the distributed
  * schedule that holds at any edge count; map-side combine bounds what
  * each task emits by its distinct destination count, and the node/count
  * scalars ride a broadcast, never a driver collect.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "graph_pagerank_step" -> { (s, d) =>
      // One damped power-iteration step (d=0.85) from the uniform start
      // over the bipartite supplier→part link graph (distinct lineitem
      // pairs — the fixture's stand-in for a host→host crawl graph).
      // Node identity is (ntype, id) since supplier and part key spaces
      // overlap. Suppliers have out-edges only, parts in-edges only, so
      // sink (part) mass is dropped rather than redistributed — the
      // documented simplified step; iterating would renormalize.
      // Determinism: each edge contribution (1/N)/outdeg is the same
      // IEEE double expression in both engines, rounded at 1e-12, then
      // summed EXACTLY as DECIMAL(28,12) so the per-destination total is
      // summation-order-free; the damped blend rounds at 1e-12 again.
      val edges = lineitem(s, d)
        .select(col("l_suppkey").as("src"), col("l_partkey").as("dst"))
        .distinct()
      val nodes = edges.select(lit("s").as("ntype"), col("src").as("node_id")).distinct()
        .unionByName(
          edges.select(lit("p").as("ntype"), col("dst").as("node_id")).distinct())
      val nRow = nodes.agg(count(lit(1)).as("n"))
      val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val contrib = edges.join(outdeg, "src").crossJoin(broadcast(nRow))
        .select(col("dst"),
          round(lit(1.0) / col("n") / col("outdeg"), 12).as("contrib"))
        .groupBy("dst")
        .agg(sum(col("contrib").cast(DecimalType(28, 12))).cast(DoubleType).as("msum"))
      nodes.crossJoin(broadcast(nRow))
        .join(contrib,
          col("ntype") === lit("p") && col("node_id") === col("dst"), "left")
        .select(col("ntype"), col("node_id"),
          round(lit(0.15) / col("n") + lit(0.85) * coalesce(col("msum"), lit(0.0)), 12)
            .as("pr"))
        .orderBy("ntype", "node_id")
    }
  )

  val oracleSql: Map[String, String] = Map(
    "graph_pagerank_step" ->
      """WITH edges AS (
        |  SELECT DISTINCT l_suppkey AS src, l_partkey AS dst FROM lineitem),
        |nodes AS (
        |  SELECT DISTINCT 's' AS ntype, src AS node_id FROM edges
        |  UNION ALL
        |  SELECT DISTINCT 'p' AS ntype, dst AS node_id FROM edges),
        |nn AS (SELECT count(*) AS n FROM nodes),
        |od AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        |contrib AS (
        |  SELECT e.dst,
        |    CAST(sum(CAST(round(1.0 / nn.n / od.outdeg, 12) AS DECIMAL(28,12)))
        |      AS DOUBLE) AS msum
        |  FROM edges e JOIN od USING (src) CROSS JOIN nn GROUP BY e.dst)
        |SELECT nodes.ntype, nodes.node_id,
        |  round(0.15 / nn.n + 0.85 * coalesce(c.msum, 0.0), 12) AS pr
        |FROM nodes CROSS JOIN nn
        |LEFT JOIN contrib c ON nodes.ntype = 'p' AND nodes.node_id = c.dst
        |ORDER BY ntype, node_id""".stripMargin
  )
}
