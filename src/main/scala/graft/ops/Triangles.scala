package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting over an (optionally directed) link graph
  * — the clustering-coefficient numerator, the classic spam-farm /
  * community signal next to PageRank (q131) and HITS (q147).
  *
  * Degree-ordered orientation (Schank & Wagner 2005): undirected
  * distinct edges are oriented from the (degree, node)-smaller
  * endpoint to the larger, so every out-degree is O(√m) and the
  * wedge join (the only quadratic-risk step) is bounded — the
  * textbook MapReduce triangle scheme. Each triangle is counted
  * EXACTLY once (its vertices form a unique oriented path a→b→c
  * with closing edge a→c). Joins are keyed hash joins; nothing is
  * ever all-pairs.
  */
object Triangles {

  /** @return one row: (n_nodes, n_edges, n_triangles) of the
    *         undirected simple graph underlying `edges`.
    */
  def census(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val und = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull &&
        col(srcCol) =!= col(dstCol))
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .distinct()
    val deg = und.select(col("u").as("n"))
      .unionAll(und.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    // orient small → large under the total order (deg, node)
    val o = graft.plans.Plans.barrier(und
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("x"),
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("y")))
    val wedges = o.select(col("x").as("a"), col("y").as("b"))
      .join(o.select(col("x").as("b"), col("y").as("c")), "b")
    val tri = wedges.join(
      o.select(col("x").as("a"), col("y").as("c")), Seq("a", "c"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    val nTri = tri.agg(count(lit(1)).as("n_triangles"))
    nNodes.crossJoin(nEdges).crossJoin(nTri)
  }

  /** The SAME computation as DuckDB SQL (generated, like
    * PageRank.sql/Hits.sql). `edgesCte` must produce (src, dst).
    */
  def sql(edgesCte: String): String =
    s"""WITH raw_e AS MATERIALIZED ($edgesCte),
       |und AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM raw_e
       |  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
       |deg AS MATERIALIZED (
       |  SELECT n, count(*) AS deg FROM (
       |    SELECT u AS n FROM und UNION ALL SELECT v FROM und)
       |  GROUP BY n),
       |o AS MATERIALIZED (
       |  SELECT CASE WHEN du.deg < dv.deg
       |           OR (du.deg = dv.deg AND und.u < und.v)
       |         THEN und.u ELSE und.v END AS x,
       |         CASE WHEN du.deg < dv.deg
       |           OR (du.deg = dv.deg AND und.u < und.v)
       |         THEN und.v ELSE und.u END AS y
       |  FROM und
       |  JOIN deg du ON und.u = du.n
       |  JOIN deg dv ON und.v = dv.n)
       |SELECT
       |  (SELECT count(*) FROM deg) AS n_nodes,
       |  (SELECT count(*) FROM und) AS n_edges,
       |  (SELECT count(*)
       |   FROM o e1 JOIN o e2 ON e1.y = e2.x
       |   JOIN o e3 ON e3.x = e1.x AND e3.y = e2.y) AS n_triangles""".stripMargin
}
