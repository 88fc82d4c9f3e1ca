package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-device identity stitching — resolve (user, device) sightings
  * into identity clusters by connected components over the bipartite
  * sighting graph (the CDP / ID-graph primitive; two users sharing a
  * device, or one user on two devices, collapse into one identity).
  * This is [[graft.dedup.Dedup.clusters]]' alternating-star
  * contraction pointed at an identity graph instead of a near-dup
  * pair list — same O(log n) keyed-shuffle convergence, so a
  * 100 TB sighting log with a long-chain identity graph still
  * resolves in logarithmic rounds.
  *
  * Node encoding: users ↦ 2·id, devices ↦ 2·id+1 — the two id
  * spaces interleave without collision and decode by parity.
  */
object IdentityStitch {

  /** Resolve `sightings(userCol, deviceCol)` (both integral) into
    * clusters; returns one row per identity node:
    * (node_kind, node_id, cluster_id). */
  def resolve(
      sightings: DataFrame,
      userCol: String,
      deviceCol: String): DataFrame = {
    val pairs = sightings
      .select((col(userCol).cast("long") * 2).as("a"),
        (col(deviceCol).cast("long") * 2 + 1).as("b"))
      .distinct()
    graft.dedup.Dedup.clusters(pairs)
      .select(
        when(pmod(col("doc_id"), lit(2)) === 0, lit("user"))
          .otherwise(lit("device")).as("node_kind"),
        shiftright(col("doc_id"), 1).as("node_id"),
        col("cluster_id"))
  }

  /** Cluster-shape census: how many identity clusters have
    * (n_users, n_devices) members — the audit a stitching rollout
    * reports (a spike in many-user clusters means over-merging).
    * Output is histogram-sized, never data-sized. */
  def census(
      sightings: DataFrame,
      userCol: String,
      deviceCol: String): DataFrame =
    resolve(sightings, userCol, deviceCol)
      .groupBy("cluster_id")
      .agg(
        sum(when(col("node_kind") === "user", 1L).otherwise(0L))
          .as("n_users"),
        sum(when(col("node_kind") === "device", 1L).otherwise(0L))
          .as("n_devices"))
      .groupBy("n_users", "n_devices")
      .agg(count(lit(1)).as("n_clusters"))
      .orderBy("n_users", "n_devices")

  /** DuckDB restatement of [[census]] over `sight(u, d)`: encoded
    * symmetric edge closure via WITH RECURSIVE (UNION-deduped
    * reachability — the oracle may be quadratic per component; the
    * Spark side is the scale path), min-label per node, then the
    * same two rollups. Ends in
    * `stitch_out(n_users, n_devices, n_clusters)`.
    * NOTE: must be placed in a `WITH RECURSIVE` block. */
  def censusSql: String =
    """enc AS (
      |  SELECT DISTINCT u * 2 AS a, d * 2 + 1 AS b FROM sight
      |), sym AS (
      |  SELECT a, b FROM enc UNION SELECT b, a FROM enc
      |), nodes AS (
      |  SELECT DISTINCT a AS id FROM sym
      |), reach AS (
      |  SELECT id AS node, id AS lbl FROM nodes
      |  UNION
      |  SELECT s.b AS node, r.lbl
      |  FROM reach r JOIN sym s ON s.a = r.node
      |), comp AS (
      |  SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node
      |), shapes AS (
      |  SELECT cluster_id,
      |    CAST(sum(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_users,
      |    CAST(sum(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_devices
      |  FROM comp GROUP BY cluster_id
      |), stitch_out AS (
      |  SELECT n_users, n_devices, CAST(count(*) AS BIGINT)
      |    AS n_clusters
      |  FROM shapes GROUP BY n_users, n_devices
      |)""".stripMargin
}
