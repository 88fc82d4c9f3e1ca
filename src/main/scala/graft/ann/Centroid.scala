package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nearest-centroid (Rocchio) embedding classification — the
  * cheapest supervised baseline over an embedding column, and the
  * standard "are these labels separable at all" probe before
  * training anything bigger: one pass fits k·d centroid scalars, a
  * broadcast join classifies the corpus, a confusion census grades
  * it.
  *
  * Determinism: components quantize to DECIMAL(12,6) at the scan;
  * centroids are one round(Σ/n, 6) division each; squared distances
  * are EXACT decimal sums (no float accumulation), so the argmin —
  * tie-broken by label id — is engine-identical.
  *
  * Scale shape: fit = one partial-aggregable (label, dim) groupBy;
  * the centroid table is k·d rows and BROADCASTS; classify = one
  * broadcast join + per-(vector, label) rollup + per-vector top-1
  * window. Nothing driver-side, nothing pairwise.
  */
object Centroid {

  /** Fit on `df`'s (idCol, vecCol array<float>, labelCol) and return
    * the label confusion census: (label_true, label_pred, n_vecs). */
  def confusion(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String): DataFrame = {
    val pts = df.select(col(idCol).as("vid"),
      col(labelCol).cast("long").as("label_true"),
      posexplode(transform(col(vecCol),
        x => round(x.cast("double"), 6).cast("decimal(12,6)")))
        .as(Seq("d", "xq")))
    val cents = pts.groupBy(col("label_true").as("label_pred"), col("d"))
      .agg(round(sum(col("xq")).cast("double") / count(lit(1)), 6)
        .cast("decimal(12,6)").as("c"))
    val dists = pts.join(broadcast(cents), Seq("d"))
      .groupBy("vid", "label_true", "label_pred")
      .agg(sum((col("xq") - col("c")) * (col("xq") - col("c")))
        .as("d2"))
    val byDist = Window.partitionBy("vid")
      .orderBy(col("d2"), col("label_pred"))
    dists.withColumn("rn", row_number().over(byDist))
      .filter(col("rn") === 1)
      .groupBy("label_true", "label_pred")
      .agg(count(lit(1)).as("n_vecs"))
  }

  /** DuckDB restatement over `vecs(vid, label, vec)`; ends in
    * `cent_out(label_true, label_pred, n_vecs)`. */
  def confusionSql: String =
    """cent_pts AS (
      |  SELECT vid, CAST(label AS BIGINT) AS label_true,
      |    unnest(range(1, len(vec) + 1)) AS d,
      |    unnest(list_transform(vec,
      |      x -> CAST(round(CAST(x AS DOUBLE), 6) AS DECIMAL(12,6))))
      |      AS xq
      |  FROM vecs
      |), cent_c AS (
      |  SELECT label_true AS label_pred, d,
      |    CAST(round(CAST(sum(xq) AS DOUBLE) / count(*), 6)
      |      AS DECIMAL(12,6)) AS c
      |  FROM cent_pts GROUP BY label_true, d
      |), cent_d AS (
      |  SELECT p.vid, p.label_true, c.label_pred,
      |    sum((p.xq - c.c) * (p.xq - c.c)) AS d2
      |  FROM cent_pts p JOIN cent_c c USING (d)
      |  GROUP BY p.vid, p.label_true, c.label_pred
      |), cent_best AS (
      |  SELECT vid, label_true, label_pred,
      |    row_number() OVER (PARTITION BY vid
      |      ORDER BY d2, label_pred) AS rn
      |  FROM cent_d
      |), cent_out AS (
      |  SELECT label_true, label_pred,
      |    CAST(count(*) AS BIGINT) AS n_vecs
      |  FROM cent_best WHERE rn = 1
      |  GROUP BY label_true, label_pred
      |)""".stripMargin
}
