package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous label propagation (Raghavan et al. 2007) — community
  * detection over an undirected graph, completing the local-graph
  * family (q131 PageRank ranks nodes, q149 triangles measure
  * clustering, q174 two-hop counts reach — this PARTITIONS the graph
  * into densely-linked groups: link farms, vendor cliques, topic
  * clusters).
  *
  * Determinism contract (plain LPA is notoriously order-dependent;
  * every choice here removes a freedom):
  *  - SYNCHRONOUS rounds — round k reads only round k−1's labels;
  *  - argmax by (count DESC, label ASC) — the lexicographically
  *    smallest of the most frequent neighbor labels wins ties;
  *  - fixed iteration count, no convergence race.
  *  Both engines replay the identical recurrence, so labels match
  *  bit-for-bit (the q131/q147 integer-loop discipline, with string
  *  labels instead of fixed-point scores).
  *
  * Scale shape: edges symmetrize + dedup once and persist
  * hash-partitioned; each round is one keyed join (edges × labels on
  * the 8-byte-hashable node id), one partial-aggregated
  * (node, label) count, and one NODE-keyed window over each node's
  * distinct neighbor labels (bounded by degree — never a global
  * sort). Rounds are barriered so the analyzed plan stays linear in
  * iterations (q147's lesson).
  */
object LabelProp {

  /** @param edges undirected edge list (endpoints of any orderable
    *   type); self-loops and duplicates are dropped.
    * @return (node, label) after `iters` synchronous rounds, label =
    *   the initial id of the elected community representative.
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val fwd = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val ed = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = ed.select(col("src").as("node")).distinct()
    var labels = nodes.select(col("node"), col("node").as("label"))
    val byNode = Window.partitionBy("node")
    for (_ <- 1 to iters) {
      val counted = ed.join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      val elected = counted
        .withColumn("rn", row_number().over(
          byNode.orderBy(col("c").desc, col("label"))))
        .filter(col("rn") === 1)
        .select("node", "label")
      labels = graft.plans.Plans.barrier(elected)
    }
    labels
  }

  /** Community census over the final labels: size plus the smallest
    * member as a stable exemplar.
    */
  def census(labels: DataFrame): DataFrame =
    labels.groupBy("label")
      .agg(count(lit(1)).as("n_members"), min(col("node")).as("exemplar"))

  /** The shared WITH-chain of the recurrence (generated MATERIALIZED
    * CTEs, Hits.sql's pattern), ending at `l<iters>(node, label)`
    * with `ed(src, dst)` (symmetric, deduped) also in scope —
    * composable by [[sql]] and [[Modularity.sql]]. `edgesCte` must
    * produce (src, dst). */
  private[ops] def chainSql(edgesCte: String, iters: Int): String = {
    require(iters >= 1)
    val base =
      s"""WITH raw_e AS MATERIALIZED ($edgesCte),
         |ed AS MATERIALIZED (
         |  SELECT DISTINCT src, dst FROM (
         |    SELECT src, dst FROM raw_e
         |    UNION ALL SELECT dst AS src, src AS dst FROM raw_e)
         |  WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
         |nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM ed),
         |l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)"""
        .stripMargin
    val rounds = (1 to iters).map { k =>
      s"""c$k AS MATERIALIZED (
         |  SELECT ed.dst AS node, l.label, count(*) AS c
         |  FROM ed JOIN l${k - 1} l ON ed.src = l.node
         |  GROUP BY 1, 2),
         |l$k AS MATERIALIZED (
         |  SELECT node, label FROM (
         |    SELECT node, label, row_number() OVER (PARTITION BY node
         |      ORDER BY c DESC, label) AS rn
         |    FROM c$k)
         |  WHERE rn = 1)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  /** The same recurrence as DuckDB SQL. `edgesCte` must produce
    * (src, dst). */
  def sql(edgesCte: String, iters: Int): String =
    chainSql(edgesCte, iters) +
      s"""
         |SELECT label, count(*) AS n_members, min(node) AS exemplar
         |FROM l$iters GROUP BY label
         |ORDER BY label""".stripMargin
}
