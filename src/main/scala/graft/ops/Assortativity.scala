package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree assortativity (Newman 2002) — does the graph wire
  * like-to-like? The Pearson correlation of endpoint degrees over
  * every undirected edge slot: positive for social-style graphs
  * (hubs befriend hubs), negative for web/infrastructure-style
  * graphs (hubs fan out to leaves) — a one-number structural
  * fingerprint next to [[Triangles]]' closure and [[KCore]]'s
  * depth, and a spam-graph tell (link farms wire unnaturally
  * assortative).
  *
  *   r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²)(n·Σy² − (Σy)²))
  *
  * over symmetrized edge slots (x = deg(u), y = deg(v); both
  * orientations, so Σx = Σy by construction — kept as separate sums
  * anyway to make the formula auditable).
  *
  * Exactness: degrees are integers, the five moments are exact
  * DECIMAL(38,0) sums from one partial-aggregated pass; r is a
  * fixed double chain (two casts, one sqrt, one division). Null for
  * degenerate graphs (zero variance — e.g. every node same degree).
  *
  * Scale shape: degree table (one groupBy) joined twice onto the
  * edge list — keyed shuffles only; the moments reduce map-side.
  */
object Assortativity {

  /** @return one row: (n_slots, r). */
  def degreeCorrelation(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val dir = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
    val sym = graft.plans.Plans.barrier(
      dir.union(dir.select(col("b").as("a"), col("a").as("b"))).distinct())
    val deg = sym.groupBy("a").agg(count(lit(1)).as("d"))
    val slots = sym
      .join(deg.select(col("a"), col("d").as("dx")), "a")
      .join(deg.select(col("a").as("b"), col("d").as("dy")), "b")
      .select(col("dx").cast("decimal(38,0)").as("x"),
        col("dy").cast("decimal(38,0)").as("y"))
    val m = slots.agg(count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
    val vx = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val vy = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
    m.select(col("n").cast("long").as("n_slots"),
      when(vx > 0 && vy > 0, round(num / sqrt(vx * vy), 9)).as("r"))
  }
}
