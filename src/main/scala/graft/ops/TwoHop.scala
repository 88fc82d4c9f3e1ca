package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-hop neighborhood reach (friend-of-a-friend): for each node,
  * the count of DISTINCT nodes exactly two directed hops away —
  * reachable through some neighbor, but not a direct neighbor and
  * not the node itself. The web-graph feature behind link-farm
  * detection (a farm's 2-hop reach collapses back onto itself) and
  * recommendation candidate generation; completes the local-graph
  * family next to q149's triangles.
  *
  * Scale shape: edges dedup once (8-byte pairs), then ONE self-join
  * keyed on the middle node — fan-out is Σ in(m)·out(m), the same
  * degree-bounded contract q149's triangle orientation documents
  * (super-node graphs need a hub cap upstream; q126's capPerKey is
  * the tool). The "exactly two" subtraction is a LEFT ANTI against
  * the direct edges, and the final count partial-aggregates.
  */
object TwoHop {

  /** @return (node, n_two_hop) for nodes with at least one strict
    *         2-hop neighbor.
    */
  def reach(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = graft.plans.Plans.barrier(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .filter(col("src") =!= col("dst")).distinct())
    val two = e.alias("a").join(e.alias("b"), col("a.dst") === col("b.src"))
      .filter(col("b.dst") =!= col("a.src"))
      .select(col("a.src").as("node"), col("b.dst").as("dst2"))
      .distinct()
    two.join(e.select(col("src").as("node"), col("dst").as("dst2")),
        Seq("node", "dst2"), "left_anti")
      .groupBy("node").agg(count(lit(1)).as("n_two_hop"))
  }
}
