package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverse-propensity-weighted ATE (Horvitz-Thompson / Rosenbaum-
  * Rubin) — the observational-data effect estimator completing the
  * causal family (q189 t-test → q268 CUPED → q278 DiD → IPW): fit a
  * propensity model P(treat | x) with [[LogRegGd]]'s fixed-point GD,
  * then weight each arm by its inverse propensity so confounded
  * covariate mixes cancel:
  *
  *   ATE = (1/n)·Σ [ t·y/p(x) − (1−t)·y/(1−p(x)) ]
  *
  * Propensities are CLIPPED to [pClipMu, 1e6 − pClipMu] µ (standard
  * overlap trimming — an unclipped p→0 row would dominate the sum).
  *
  * Exactness: p_µ inherits LogRegGd's pure-integer hard sigmoid;
  * each row's weighted outcome floor((y_cents·1e6) / p_µ) is one
  * floor-of-IEEE-division of exact integers (y ≥ 0 required — holds
  * for revenue-like outcomes); arm sums are BIGINT; the ATE is one
  * closing division rounded 6 dp.
  *
  * Scale shape: GD epochs are one aggregate each (LogRegGd's
  * contract); the estimate is ONE more partial-aggregable pass with
  * the 3 weights as literals. Driver state never exceeds 3 scalars.
  */
object Ipw {

  /** Fit propensity on (x1, x2) → `treatCol`, then IPW-estimate the
    * ATE of `treatCol` on non-negative `yCentsCol` (integer cents).
    * Returns one row: weights, arm diagnostics, ate. */
  def ate(
      df: DataFrame,
      x1Col: String,
      x2Col: String,
      treatCol: String,
      yCentsCol: String,
      epochs: Int = 2,
      lrShift: Int = 6,
      pClipMu: Long = 50000L): DataFrame = {
    val w = LogRegGd.fit(df, x1Col, x2Col, treatCol, epochs, lrShift).last
    val z = lit(w.w0) + lit(w.w1) * col(x1Col).cast("long") +
      lit(w.w2) * col(x2Col).cast("long")
    val pMu = greatest(lit(pClipMu), least(lit(1000000L - pClipMu),
      greatest(lit(0L), least(lit(1000000L),
        lit(500000L) + floor(z.cast("double") / 4d).cast("long")))))
    val t = col(treatCol).cast("long")
    val y = col(yCentsCol).cast("long")
    val wTreat = floor((y * 1000000L).cast("double") /
      pMu.cast("double")).cast("long")
    val wCtrl = floor((y * 1000000L).cast("double") /
      (lit(1000000L) - pMu).cast("double")).cast("long")
    df.agg(count(lit(1)).as("n"),
        sum(t).as("n_treat"),
        sum(when(t === 1, wTreat).otherwise(0L)).as("sum_treat_w"),
        sum(when(t === 0, wCtrl).otherwise(0L)).as("sum_ctrl_w"))
      .select(lit(w.w0).as("w0_mu"), lit(w.w1).as("w1_mu"),
        lit(w.w2).as("w2_mu"), col("n"), col("n_treat"),
        col("sum_treat_w"), col("sum_ctrl_w"),
        // floor(y_cents·1e6 / p_µ) = y_cents/p — the µ factors
        // cancel, so the arm sums are inverse-weighted CENTS:
        // → value units is ÷ (n · 100)
        round((col("sum_treat_w") - col("sum_ctrl_w")).cast("double") /
          (col("n").cast("double") * 1e2), 6).as("ate"))
  }

  /** DuckDB restatement over `rel(x1, x2, label01, y_cents)` —
    * label01 is the treatment flag (matching [[LogRegGd.fitSql]]'s
    * relation contract); ends in `ipw_out(w0_mu, w1_mu, w2_mu, n,
    * n_treat, sum_treat_w, sum_ctrl_w, ate)`. */
  def ateSql(
      rel: String,
      epochs: Int = 2,
      lrShift: Int = 6,
      pClipMu: Long = 50000L): String = {
    val fit = LogRegGd.fitSql(rel, epochs, lrShift)
    // strip fitSql's trailing gd_out CTE — only the weight chain is
    // composed here
    val chain = fit.substring(0, fit.indexOf(",\ngd_out AS ("))
    val wf = s"w$epochs"
    val pMu = s"""greatest($pClipMu, least(${1000000L - pClipMu},
                 |      greatest(0, least(1000000, 500000
                 |        + CAST(floor(CAST(p.w0 + p.w1 * r.x1
                 |          + p.w2 * r.x2 AS DOUBLE) / 4) AS BIGINT)))))"""
      .stripMargin
    s"""$chain,
       |ipw_rows AS (
       |  SELECT p.w0, p.w1, p.w2, r.label01, r.y_cents,
       |    $pMu AS p_mu
       |  FROM $rel r CROSS JOIN $wf p
       |), ipw_out AS (
       |  SELECT any_value(w0) AS w0_mu, any_value(w1) AS w1_mu,
       |    any_value(w2) AS w2_mu,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(label01) AS BIGINT) AS n_treat,
       |    CAST(sum(CASE WHEN label01 = 1 THEN
       |      CAST(floor(CAST(y_cents * 1000000 AS DOUBLE)
       |        / CAST(p_mu AS DOUBLE)) AS BIGINT) ELSE 0 END)
       |      AS BIGINT) AS sum_treat_w,
       |    CAST(sum(CASE WHEN label01 = 0 THEN
       |      CAST(floor(CAST(y_cents * 1000000 AS DOUBLE)
       |        / CAST(1000000 - p_mu AS DOUBLE)) AS BIGINT)
       |      ELSE 0 END) AS BIGINT) AS sum_ctrl_w,
       |    round(CAST(sum(CASE WHEN label01 = 1 THEN
       |        CAST(floor(CAST(y_cents * 1000000 AS DOUBLE)
       |          / CAST(p_mu AS DOUBLE)) AS BIGINT) ELSE 0 END)
       |      - sum(CASE WHEN label01 = 0 THEN
       |        CAST(floor(CAST(y_cents * 1000000 AS DOUBLE)
       |          / CAST(1000000 - p_mu AS DOUBLE)) AS BIGINT)
       |        ELSE 0 END) AS DOUBLE)
       |      / (CAST(count(*) AS DOUBLE) * 1e2), 6) AS ate
       |  FROM ipw_rows
       |)""".stripMargin
  }
}
