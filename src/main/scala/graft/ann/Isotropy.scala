package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space isotropy audit (Ethayarajh 2019; Mu & Viswanath
  * 2018's "all-but-the-top" diagnostic) — how anisotropic is the
  * corpus embedding space? The key identity makes this a ONE-PASS
  * aggregate instead of an O(n²) pairwise scan:
  *
  *   avg_{i≠j} cos(vᵢ, vⱼ) = (‖Σᵢ v̂ᵢ‖² − Σᵢ‖v̂ᵢ‖²) / (n(n−1))
  *
  * i.e. the mean pairwise cosine falls out of the per-dimension
  * SUMS of unit vectors — at 100 TB this is d running sums per
  * partition, partial-aggregated; nothing pairwise ever
  * materializes. A mean cosine far above 0 = a dominant common
  * direction (anisotropy) — the signal that ANN recall and cosine
  * thresholds (q26/q218) are being squeezed into a narrow cone.
  *
  * Determinism: float sums are never trusted to addition order —
  * every cross-element sum is decimal-quantized FIRST:
  * ‖v‖² sums round(xᵢ², 12) decimals (exact, order-free), unit
  * components are round(xᵢ/‖v‖, 9) decimals, per-dimension sums are
  * exact decimals µ9-scaled into DECIMAL(38,0)/HUGEINT squares, and
  * the two output stats are single fixed double chains.
  */
object Isotropy {

  /** Audit `vecCol` (array<float>). Returns one row:
    * (n_vecs, dim, avg_cos, resultant_norm_frac) where
    * resultant_norm_frac = ‖Σv̂‖/n ∈ [0,1] (1 = all vectors in one
    * direction). Zero vectors are excluded (stated). */
  def audit(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol)
    // ‖v‖ from 12dp-quantized squared components: decimal fold is
    // order-exact; sqrt is IEEE-correctly-rounded in both engines
    val norm = sqrt(aggregate(v, lit(0).cast("decimal(24,12)"),
      (acc, x) => (acc + round(x.cast("double") * x.cast("double"), 12)
        .cast("decimal(16,12)")).cast("decimal(24,12)")).cast("double"))
    val unit = df
      .withColumn("nrm", norm)
      .filter(col("nrm") > 0)
      .select(posexplode(transform(v,
        x => round(x.cast("double") / col("nrm"), 9)
          .cast("decimal(10,9)"))).as(Seq("d", "qd")))
    // one exploded pass feeds BOTH aggregates: Σ_d (Σ_rows q)² and
    // Σ_all q² — exact decimals end to end
    val perDim = unit.groupBy("d")
      .agg(sum(col("qd")).as("s_d"),
        sum(col("qd") * col("qd")).as("ss_d"),
        count(lit(1)).as("n_d"))
      .select(col("d"),
        (col("s_d") * 1000000000L).cast("decimal(38,0)").as("s_mu"),
        col("ss_d"), col("n_d"))
    perDim
      .agg(count(lit(1)).as("dim"),
        max(col("n_d")).as("n_vecs"),
        sum(col("s_mu") * col("s_mu")).as("s2_mu2"),
        sum(col("ss_d")).as("sum_sq"))
      .select(col("n_vecs"), col("dim"),
        when(col("n_vecs") > 1,
          round((col("s2_mu2").cast("double") / 1e18 -
            col("sum_sq").cast("double")) /
            (col("n_vecs") * (col("n_vecs") - 1)).cast("double"), 9))
          .as("avg_cos"),
        round(sqrt(col("s2_mu2").cast("double")) / 1e9 /
          col("n_vecs").cast("double"), 9).as("resultant_norm_frac"))
  }

  /** DuckDB restatement over `vecs(vec)` (vec = list of floats);
    * ends in `iso_out(n_vecs, dim, avg_cos, resultant_norm_frac)`. */
  def auditSql: String =
    """iso_q AS (
      |  SELECT unnest(list_transform(vec,
      |      x -> CAST(round(CAST(x AS DOUBLE) / nrm, 9)
      |        AS DECIMAL(10,9)))) AS qd,
      |    unnest(range(1, len(vec) + 1)) AS d
      |  FROM (
      |    SELECT vec, sqrt(CAST(list_sum(list_transform(vec,
      |      x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12)
      |        AS DECIMAL(16,12)))) AS DOUBLE)) AS nrm
      |    FROM vecs) t
      |  WHERE nrm > 0
      |), iso_dim AS (
      |  SELECT d,
      |    CAST(sum(qd) * 1000000000 AS HUGEINT) AS s_mu,
      |    sum(qd * qd) AS ss_d,
      |    CAST(count(*) AS BIGINT) AS n_d
      |  FROM iso_q GROUP BY d
      |), iso_agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS dim,
      |    max(n_d) AS n_vecs,
      |    sum(s_mu * s_mu) AS s2_mu2,
      |    sum(ss_d) AS sum_sq
      |  FROM iso_dim
      |), iso_out AS (
      |  SELECT n_vecs, dim,
      |    CASE WHEN n_vecs > 1 THEN
      |      round((CAST(s2_mu2 AS DOUBLE) / 1e18
      |          - CAST(sum_sq AS DOUBLE))
      |        / CAST(n_vecs * (n_vecs - 1) AS DOUBLE), 9) END
      |      AS avg_cos,
      |    round(sqrt(CAST(s2_mu2 AS DOUBLE)) / 1e9
      |      / CAST(n_vecs AS DOUBLE), 9) AS resultant_norm_frac
      |  FROM iso_agg
      |)""".stripMargin
}
