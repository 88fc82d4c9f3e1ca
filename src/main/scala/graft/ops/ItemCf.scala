package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item-item collaborative filtering (Sarwar 2001 / the Amazon
  * "customers also bought" shape): cosine similarity over the
  * user-item co-occurrence matrix,
  *
  *   sim(i, j) = c_ij / √(c_i · c_j)
  *
  * with c_i = users who touched i and c_ij = users who touched both.
  * Top-k neighbors per item is the precomputed recommendation table
  * a serving layer reads.
  *
  * Exactness: counts are integers; each sim is one √ of an exact
  * integer product + one division (both IEEE-deterministic), ranked
  * by (round(sim, 9) DESC, neighbor) — a total order.
  *
  * Scale shape: pair generation is the classic within-user self-join
  * with a DEGREE CAP — a user touching everything (a bot) would
  * otherwise contribute |items|² pairs; capped users keep their
  * `maxDegree` smallest item ids (deterministic, stated truncation —
  * the q53/q237 cap discipline). Distinct (user, item) first, so
  * repeat events don't inflate co-occurrence.
  */
object ItemCf {

  /** Build the top-`k` neighbor table from an interaction log.
    * Returns (item, neighbor, c_pair, sim, rk). */
  def topNeighbors(
      log: DataFrame,
      userCol: String,
      itemCol: String,
      k: Int = 3,
      maxDegree: Int = 100): DataFrame = {
    val ui = log.select(col(userCol).as("u"), col(itemCol).as("i"))
      .distinct()
    val byUser = Window.partitionBy("u").orderBy("i")
    val capped = graft.plans.Plans.barrier(ui
      .withColumn("rn", row_number().over(byUser))
      .filter(col("rn") <= maxDegree)
      .drop("rn"))
    val itemCounts = capped.groupBy(col("i")).agg(count(lit(1)).as("c_i"))
    val pairs = capped.as("a")
      .join(capped.as("b"), col("a.u") === col("b.u") &&
        col("a.i") < col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(count(lit(1)).as("c_pair"))
    val sym = pairs.unionByName(pairs.select(col("j").as("i"),
      col("i").as("j"), col("c_pair")))
    val sim = sym
      .join(itemCounts, Seq("i"))
      .join(itemCounts.select(col("i").as("j"), col("c_i").as("c_j")),
        Seq("j"))
      .withColumn("sim", round(col("c_pair").cast("double") /
        sqrt((col("c_i") * col("c_j")).cast("double")), 9))
    val byItem = Window.partitionBy("i")
      .orderBy(col("sim").desc, col("j"))
    sim.withColumn("rk", row_number().over(byItem))
      .filter(col("rk") <= k)
      .select(col("i").as("item"), col("j").as("neighbor"),
        col("c_pair"), col("sim"), col("rk").cast("long").as("rk"))
  }

  /** DuckDB restatement over `cf_log(u, i)`; ends in
    * `cf_out(item, neighbor, c_pair, sim, rk)`. */
  def topNeighborsSql(k: Int = 3, maxDegree: Int = 100): String =
    s"""cf_ui AS (
       |  SELECT DISTINCT u, i FROM cf_log
       |), cf_capped AS (
       |  SELECT u, i FROM (
       |    SELECT u, i, row_number() OVER (PARTITION BY u ORDER BY i)
       |      AS rn
       |    FROM cf_ui) WHERE rn <= $maxDegree
       |), cf_counts AS (
       |  SELECT i, CAST(count(*) AS BIGINT) AS c_i
       |  FROM cf_capped GROUP BY i
       |), cf_pairs AS (
       |  SELECT a.i AS i, b.i AS j, CAST(count(*) AS BIGINT) AS c_pair
       |  FROM cf_capped a JOIN cf_capped b
       |    ON a.u = b.u AND a.i < b.i
       |  GROUP BY a.i, b.i
       |), cf_sym AS (
       |  SELECT i, j, c_pair FROM cf_pairs
       |  UNION ALL SELECT j AS i, i AS j, c_pair FROM cf_pairs
       |), cf_sim AS (
       |  SELECT s.i, s.j, s.c_pair,
       |    round(CAST(s.c_pair AS DOUBLE)
       |      / sqrt(CAST(ci.c_i * cj.c_i AS DOUBLE)), 9) AS sim
       |  FROM cf_sym s
       |  JOIN cf_counts ci ON s.i = ci.i
       |  JOIN cf_counts cj ON s.j = cj.i
       |), cf_out AS (
       |  SELECT i AS item, j AS neighbor, c_pair, sim, rk FROM (
       |    SELECT i, j, c_pair, sim, row_number() OVER
       |      (PARTITION BY i ORDER BY sim DESC, j) AS rk
       |    FROM cf_sim)
       |  WHERE rk <= $k
       |)""".stripMargin
}
