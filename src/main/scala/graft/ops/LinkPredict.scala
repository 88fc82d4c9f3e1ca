package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction (Liben-Nowell & Kleinberg
  * 2003) — "which unlinked pairs behave as if linked": for every
  * NON-adjacent pair with a common neighbor, the common-neighbor
  * count and neighborhood Jaccard
  *
  *   J(u,v) = |N(u) ∩ N(v)| / (|N(u)| + |N(v)| − |N(u) ∩ N(v)|)
  *
  * — crawl-frontier candidates and record-linkage blocking next to
  * [[TwoHop]]'s reach and [[Triangles]]' closure census. Pure
  * integer counts; the score is one exact int/int division,
  * unrounded (the q25 discipline).
  *
  * Scale shape: candidates come from the WEDGE join — neighbors
  * pivot on their shared node, one keyed self-join + one pair
  * groupBy — never all-pairs. The known hazard is the hub pivot
  * (degree d contributes d² wedges): pivots with degree >
  * `maxPivotDegree` are EXCLUDED from candidate generation
  * (documented recall trade — a pair whose only common neighbors
  * are mega-hubs is weak evidence anyway, the standard practice in
  * sim-join blocking). Degrees in the denominator stay TRUE
  * degrees; only pivot eligibility is capped.
  */
object LinkPredict {

  /** @return (u, v, n_common, jaccard) for non-adjacent pairs with
    *         ≥ minCommon common (eligible) neighbors, u < v.
    */
  def jaccardCandidates(edges: DataFrame, srcCol: String, dstCol: String,
      minCommon: Int = 1, maxPivotDegree: Int = 1000): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1: $minCommon")
    val dir = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
    val sym = graft.plans.Plans.barrier(
      dir.union(dir.select(col("b").as("a"), col("a").as("b"))).distinct())
    val deg = sym.groupBy("a").agg(count(lit(1)).as("d"))
    val n = sym.select(col("a").as("w"), col("b").as("u"))
      .join(deg.filter(col("d") <= maxPivotDegree)
        .select(col("a").as("w")), "w")
    val wedges = n.alias("x")
      .join(n.alias("y"), col("x.w") === col("y.w") && col("x.u") < col("y.u"))
      .groupBy(col("x.u").as("u"), col("y.u").as("v"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
    wedges
      .join(sym.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"), "left_anti")
      .join(deg.select(col("a").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("a").as("v"), col("d").as("dv")), "v")
      .select(col("u"), col("v"), col("n_common"),
        (col("n_common").cast("double") /
          (col("du") + col("dv") - col("n_common"))).as("jaccard"))
  }
}
