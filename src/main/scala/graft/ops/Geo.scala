package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial primitives on an INTEGER micro-degree grid — radius join
  * ("points within R of each site") and stencil density ("hotspot
  * cells") without a cross join and without floating-point trig.
  *
  * Coordinates are micro-degrees carried as longs (lat ∈ ±90e6,
  * lon ∈ ±180e6). Distance is squared planar distance in
  * micro-degree units, decided ENTIRELY in 64-bit integers
  * (|Δ| ≤ 3.6e8 ⇒ Δ² ≤ 1.3e17 < 2⁶³): the same comparison is
  * bit-exact in any engine, where a haversine would hang the
  * membership decision on the last ulp of transcendental
  * library calls. Planar micro-degrees are the standard
  * approximation for city-scale radii; callers needing
  * great-circle semantics scale the lon axis by cos(lat) upstream —
  * the join machinery is unchanged.
  *
  * 100 TB shape (radius join): the classic grid-bucket join. Cell
  * size = R, so every point within R of a site lies in the site's
  * 3×3 cell neighborhood. SITES (metadata-sized: stores, cities,
  * sensors) explode ×9 and broadcast; points compute one cell key
  * inside the scan and broadcast-hash-join — candidate pairs are
  * neighborhood-local, never |points|×|sites|, and the probe side
  * never shuffles. The exact Δ² ≤ R² filter then prunes the
  * corner candidates. Degenerate-skew note: a cell holds only
  * points within R of each other geographically — skew is bounded
  * by physical density, and the per-site aggregate that usually
  * follows is partial-aggregatable.
  */
object Geo {

  /** floor-division cell index, portable integer arithmetic
    * (`(v − pmod(v, c)) / c` = floor(v/c) for negative v too).
    */
  private def cell(v: Column, c: Long): Column =
    ((v - pmod(v, lit(c))) / lit(c)).cast("long") // numerator is an
    // exact multiple of c and ≤ 3.6e8, so the double division is
    // exact before the cast

  /** SQL text of the same cell index (DuckDB: % is remainder, not
    * pmod, so re-add `c` before the final mod to get floor).
    */
  def cellSql(v: String, c: Long): String =
    s"CAST(((($v) - ((($v) % $c + $c) % $c)) / $c) AS BIGINT)"

  /** All (point, site) pairs with squared planar distance ≤ r².
    * `sites` must be metadata-sized (broadcast ×9). Output keeps
    * every input column of both sides plus `dist2`.
    *
    * @param points (…, latCol, lonCol) micro-degrees
    * @param sites  (…, sLatCol, sLonCol) micro-degrees
    */
  def radiusJoin(points: DataFrame, latCol: String, lonCol: String,
      sites: DataFrame, sLatCol: String, sLonCol: String,
      rMicroDeg: Long): DataFrame = {
    require(rMicroDeg >= 1L, "radius must be >= 1 micro-degree")
    val spark = points.sparkSession
    import spark.implicits._
    val offsets = (for (dy <- -1 to 1; dx <- -1 to 1)
      yield (dy.toLong, dx.toLong)).toDF("_g_dy", "_g_dx")
    val sExp = sites
      .crossJoin(offsets) // 9 rows per site, site side is metadata
      .withColumn("_g_cy", cell(col(sLatCol), rMicroDeg) + col("_g_dy"))
      .withColumn("_g_cx", cell(col(sLonCol), rMicroDeg) + col("_g_dx"))
      .drop("_g_dy", "_g_dx")
    val pKeyed = points
      .withColumn("_g_cy", cell(col(latCol), rMicroDeg))
      .withColumn("_g_cx", cell(col(lonCol), rMicroDeg))
    val d2 = (col(latCol) - col(sLatCol)) * (col(latCol) - col(sLatCol)) +
      (col(lonCol) - col(sLonCol)) * (col(lonCol) - col(sLonCol))
    pKeyed
      .join(broadcast(sExp), Seq("_g_cy", "_g_cx"))
      .withColumn("dist2", d2)
      .filter(col("dist2") <= lit(rMicroDeg * rMicroDeg))
      .drop("_g_cy", "_g_cx")
  }

  /** Grid hotspot density: per-cell point counts smoothed with a
    * 3×3 box stencil (each cell's density = Σ of its own and its 8
    * neighbors' counts) — the discrete convolution that turns raw
    * counts into hotspots robust to points straddling a cell edge.
    *
    * 100 TB shape: the raw corpus collapses to CELL COUNTS first
    * (one partial-aggregatable groupBy — the only pass over the
    * data); the stencil then explodes each CELL-COUNT row ×9 and
    * re-aggregates — both passes over cell-sized data, corpus rows
    * ship nowhere. This is the standard separable trick for any
    * neighborhood statistic on gridded data.
    *
    * @return (cell_y, cell_x, n_own, density) — only cells with at
    *         least one point of their own (stencil-only cells are
    *         halo, not hotspots).
    */
  def gridDensity(points: DataFrame, latCol: String, lonCol: String,
      cellMicroDeg: Long): DataFrame = {
    require(cellMicroDeg >= 1L, "cell size must be >= 1 micro-degree")
    val counts = points
      .groupBy(cell(col(latCol), cellMicroDeg).as("cell_y"),
        cell(col(lonCol), cellMicroDeg).as("cell_x"))
      .agg(count(lit(1)).as("n_own"))
    val spread = counts.select(col("cell_y"), col("cell_x"), col("n_own"),
      explode(array((for (dy <- -1 to 1; dx <- -1 to 1) yield
        struct(lit(dy.toLong).as("dy"), lit(dx.toLong).as("dx"))): _*))
        .as("o"))
      .select((col("cell_y") + col("o.dy")).as("cell_y"),
        (col("cell_x") + col("o.dx")).as("cell_x"),
        col("n_own").as("c"))
      .groupBy("cell_y", "cell_x")
      .agg(sum("c").as("density"))
    counts.join(spread, Seq("cell_y", "cell_x"))
      .select(col("cell_y"), col("cell_x"), col("n_own"), col("density"))
  }
}
