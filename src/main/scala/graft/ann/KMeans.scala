package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One distributed Lloyd iteration (the k-means step behind IVF
  * coarse quantizers q37 and SemDeDup-style corpus clustering):
  * assign every vector to its nearest centroid, then recompute each
  * centroid as the member mean. (Reference anchor: the embedding
  * pipeline family — clustering is how a 100 TB corpus gets
  * partitioned for semantic dedup and curriculum mixing.)
  *
  * Scale shape: assignment is ONE codegen'd scan expression
  * (`VectorColumns.nearestCentroid` — centroids are driver literals,
  * k·dim scalars); the update is one partial-aggregated
  * (cluster, dim) sum — vectors never pairwise-join and never
  * shuffle whole: only (cl, dim, xq) triples move.
  *
  * Exactness: per-dim sums accumulate the µ-quantized INTEGER
  * `floor(x·10⁶ + 0.5)` (q115's proven rounding) so the cross-row
  * aggregation is order-independent BIGINT math; the mean surfaces
  * as `round(sum / (n·10⁶), 9)`. Assignment distance is the
  * sequential index-order fold both engines replay identically
  * (cosSql's precedent); ties keep the smallest centroid id.
  */
object KMeans {

  /** @param centroids k driver-side vectors (from `initCentroids`).
    * @return (cl, dim, n_members, mean_x) — k·dim rows.
    */
  def lloydStep(emb: DataFrame, vecCol: String,
      centroids: Seq[Seq[Double]]): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val assigned = emb.select(
      graft.functions.VectorColumns.nearestCentroid(col(vecCol), centroids)
        .as("cl"),
      col(vecCol).as("v"))
    assigned
      .select(col("cl"), posexplode(col("v")).as(Seq("dim", "x")))
      .withColumn("xq",
        floor(col("x").cast("double") * lit(1000000.0) + lit(0.5)).cast("long"))
      .groupBy("cl", "dim")
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("xq")).cast("double")
          / (count(lit(1)) * lit(1000000.0)), 9).as("mean_x"))
  }

  /** Deterministic seed centroids: the vectors with the k smallest
    * ids — a bounded driver collect (k·dim scalars), like PageRank's
    * node count.
    */
  def initCentroids(emb: DataFrame, idCol: String, vecCol: String,
      k: Int): Seq[Seq[Double]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    emb.orderBy(col(idCol)).limit(k).select(col(vecCol))
      .collect()
      .map(_.getSeq[Any](0).map {
        case f: Float => f.toDouble
        case d: Double => d
      }.toSeq).toSeq
  }

  /** The SAME step as DuckDB SQL over `embTable` (vec list column
    * `vecCol`, id `idCol`), centroids re-derived in-query as the k
    * smallest ids — generated, so the oracle cannot drift.
    */
  def sql(embTable: String, idCol: String, vecCol: String, k: Int): String =
    s"""WITH cents AS MATERIALIZED (
       |  SELECT CAST(row_number() OVER (ORDER BY $idCol) - 1 AS INT) AS cid,
       |    list_transform($vecCol, v -> CAST(v AS DOUBLE)) AS c
       |  FROM $embTable
       |  WHERE $idCol IN (SELECT $idCol FROM $embTable
       |                   ORDER BY $idCol LIMIT $k)),
       |v AS MATERIALIZED (
       |  SELECT $idCol AS vid, $vecCol AS emb,
       |    list_transform($vecCol, v -> CAST(v AS DOUBLE)) AS dv
       |  FROM $embTable),
       |d AS MATERIALIZED (
       |  SELECT v.vid, c.cid,
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(range(1, len(dv) + 1),
       |        i -> (dv[i] - c.c[i]) * (dv[i] - c.c[i]))),
       |      (acc, x) -> acc + x) AS dist
       |  FROM v, cents c),
       |a AS MATERIALIZED (
       |  SELECT vid, cid FROM (
       |    SELECT vid, cid,
       |      row_number() OVER (PARTITION BY vid ORDER BY dist, cid) AS rn
       |    FROM d) WHERE rn = 1)
       |SELECT a.cid AS cl, CAST(i - 1 AS INT) AS dim,
       |  count(*) AS n_members,
       |  round(CAST(sum(CAST(floor(CAST(emb[i] AS DOUBLE) * 1000000 + 0.5)
       |      AS BIGINT)) AS DOUBLE) / (count(*) * 1000000.0), 9) AS mean_x
       |FROM v JOIN a USING (vid),
       |  UNNEST(generate_series(1, len(emb))) AS g(i)
       |GROUP BY 1, 2""".stripMargin
}
