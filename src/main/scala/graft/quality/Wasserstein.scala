package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 1-D Wasserstein-1 (earth mover's) distance between two batches
  * over a FIXED bin grid — the drift metric that completes the
  * family: PSI (q86) is scale-free but bin-blind to HOW FAR mass
  * moved, KS (q225) sees only the single worst gap; W₁ integrates
  * |CDF_a − CDF_b| so a small shift in every bin and a large shift
  * in one are told apart, in the metric's own units.
  *
  *   W₁ = binWidth · Σ_b |CDFa(b) − CDFb(b)|
  *
  * Exactness: with integer bin counts, each CDF gap cross-multiplies
  * to |cumA_b·nB − cumB_b·nA| — pure BIGINT; one closing division by
  * (nA·nB), scaled by the literal bin width, rounded 6 dp.
  *
  * Scale shape: one conditional groupBy to (stratum, bin) counts
  * (grid-bounded), one per-stratum cumulative window over ≤ nBins
  * rows, one stratum rollup. The raw batches are never joined.
  */
object Wasserstein {

  /** Distance per stratum between rows flagged `isB` false/true.
    * Values clamp into [lo, lo + nBins·width). Returns per stratum:
    * (n_a, n_b, w1). Strata missing a side report null (stated). */
  def distance(
      df: DataFrame,
      stratumCol: String,
      valueCol: String,
      isB: Column,
      lo: Double,
      width: Double,
      nBins: Int): DataFrame = {
    require(nBins >= 2 && width > 0, s"need bins: $nBins × $width")
    val bin = least(lit(nBins - 1L), greatest(lit(0L),
      floor((col(valueCol) - lo) / width).cast("long")))
    val observed = df.groupBy(col(stratumCol).as("g"), bin.as("b"))
      .agg(sum(when(isB, 0L).otherwise(1L)).as("na_b"),
        sum(when(isB, 1L).otherwise(0L)).as("nb_b"))
    // densify onto the FULL grid: a bin empty in both batches still
    // carries the running CDF gap — dropping it under-counts W₁
    val spine = observed.select("g").distinct()
      .crossJoin(df.sparkSession.range(nBins).select(col("id").as("b")))
    val counts = spine.join(observed, Seq("g", "b"), "left")
      .select(col("g"), col("b"),
        coalesce(col("na_b"), lit(0L)).as("na_b"),
        coalesce(col("nb_b"), lit(0L)).as("nb_b"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("b")
    val all = org.apache.spark.sql.expressions.Window.partitionBy("g")
    counts
      .withColumn("cuma", sum(col("na_b")).over(w))
      .withColumn("cumb", sum(col("nb_b")).over(w))
      .withColumn("na", sum(col("na_b")).over(all))
      .withColumn("nb", sum(col("nb_b")).over(all))
      .groupBy("g")
      .agg(first(col("na")).as("n_a"), first(col("nb")).as("n_b"),
        sum(abs(col("cuma") * col("nb") - col("cumb") * col("na")))
          .as("gap_x"))
      .select(col("g"), col("n_a"), col("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0,
          round(col("gap_x").cast("double") /
            (col("n_a") * col("n_b")).cast("double") * width, 6))
          .as("w1"))
  }

  /** DuckDB restatement over `wrel(g, v, isb)` (isb 0/1); ends in
    * `w1_out(g, n_a, n_b, w1)`. */
  def distanceSql(lo: Double, width: Double, nBins: Int): String =
    s"""w1_obs AS (
       |  SELECT g,
       |    least(${nBins - 1}, greatest(0,
       |      CAST(floor((v - $lo) / $width) AS BIGINT))) AS b,
       |    CAST(sum(1 - isb) AS BIGINT) AS na_b,
       |    CAST(sum(isb) AS BIGINT) AS nb_b
       |  FROM wrel GROUP BY 1, 2
       |), w1_counts AS (
       |  SELECT s.g, s.b,
       |    COALESCE(o.na_b, 0) AS na_b, COALESCE(o.nb_b, 0) AS nb_b
       |  FROM (SELECT g, unnest(range(0, $nBins)) AS b
       |    FROM (SELECT DISTINCT g FROM w1_obs)) s
       |  LEFT JOIN w1_obs o ON o.g = s.g AND o.b = s.b
       |), w1_cum AS (
       |  SELECT g,
       |    CAST(sum(na_b) OVER (PARTITION BY g ORDER BY b) AS BIGINT)
       |      AS cuma,
       |    CAST(sum(nb_b) OVER (PARTITION BY g ORDER BY b) AS BIGINT)
       |      AS cumb,
       |    CAST(sum(na_b) OVER (PARTITION BY g) AS BIGINT) AS na,
       |    CAST(sum(nb_b) OVER (PARTITION BY g) AS BIGINT) AS nb
       |  FROM w1_counts
       |), w1_out AS (
       |  SELECT g, any_value(na) AS n_a, any_value(nb) AS n_b,
       |    CASE WHEN any_value(na) > 0 AND any_value(nb) > 0 THEN
       |      round(CAST(sum(abs(cuma * nb - cumb * na)) AS DOUBLE)
       |        / CAST(any_value(na) * any_value(nb) AS DOUBLE)
       |        * $width, 6) END AS w1
       |  FROM w1_cum GROUP BY g
       |)""".stripMargin
}
