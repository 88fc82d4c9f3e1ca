package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-point full-batch gradient descent for a hard-sigmoid
  * logistic model — the parameter-server training shape reduced to
  * its Spark-native core: each epoch is ONE distributed aggregate
  * over the training set (partial-aggregable sums), and the only
  * driver-side state is the (d+1)-scalar weight vector. That is the
  * loop a 1000-executor cluster runs unchanged over 100 TB; no
  * collect ever grows with the data.
  *
  * Engine-portable math (why "hard" sigmoid): the logistic σ needs
  * exp(), whose last-ulp behavior differs across libms — a knife
  * edge no rounding discipline fully removes from an ITERATED
  * computation (epoch k's weights feed epoch k+1, so one ulp
  * compounds). The hard sigmoid
  *     σ_µ(z_µ) = clamp(5·10⁵ + floor(z_µ/4), 0, 10⁶)
  * is pure integer/floor arithmetic (Hubara et al. 2016 use the same
  * surrogate for quantized training), so weights are EXACTLY equal
  * in Spark and DuckDB after any number of epochs.
  *
  * Units: weights and σ are µ-scaled (1e6) BIGINTs; features are
  * small integers (caller caps them); gradient sums run in
  * DECIMAL(38,0) so a 100 TB row count cannot overflow; the update
  * w ← w − floor(Σgrad / (n·2^lrShift)) is floor-of-one-IEEE-division
  * of exact integers — identical in both engines.
  */
object LogRegGd {

  /** Trained state after each epoch (µ-scaled weights). */
  final case class Weights(w0: Long, w1: Long, w2: Long)

  private def zMu(w: Weights, x1: Column, x2: Column): Column =
    lit(w.w0) + lit(w.w1) * x1 + lit(w.w2) * x2

  private def sigmaMu(z: Column): Column =
    greatest(lit(0L), least(lit(1000000L),
      lit(500000L) + floor(z.cast("double") / 4d).cast("long")))

  /** Run `epochs` full-batch GD epochs over
    * (x1Col, x2Col ints; labelCol 0/1). Learning rate = 2^-lrShift.
    * Returns the per-epoch weight trajectory (driver-side: 3 scalars
    * per epoch — bounded, never data-sized).
    */
  def fit(
      df: DataFrame,
      x1Col: String,
      x2Col: String,
      labelCol: String,
      epochs: Int = 3,
      lrShift: Int = 6): Seq[Weights] = {
    val x1 = col(x1Col).cast("long")
    val x2 = col(x2Col).cast("long")
    val y6 = col(labelCol).cast("long") * 1000000L
    var w = Weights(0L, 0L, 0L)
    (1 to epochs).map { _ =>
      val err = (sigmaMu(zMu(w, x1, x2)) - y6).cast("decimal(38,0)")
      val r = df.agg(
        count(lit(1)).as("n"),
        sum(err).as("g0"),
        sum(err * x1.cast("decimal(38,0)")).as("g1"),
        sum(err * x2.cast("decimal(38,0)")).as("g2")).head()
      val n = r.getLong(0)
      def step(g: java.math.BigDecimal): Long =
        math.floor(g.doubleValue / (n.toDouble * (1L << lrShift))).toLong
      w = Weights(
        w.w0 - step(r.getDecimal(1)),
        w.w1 - step(r.getDecimal(2)),
        w.w2 - step(r.getDecimal(3)))
      w
    }
  }

  /** Score with final weights: one row of training metrics —
    * (n, accuracy plus the weights that produced it). */
  def evaluate(
      df: DataFrame,
      x1Col: String,
      x2Col: String,
      labelCol: String,
      w: Weights): DataFrame = {
    val x1 = col(x1Col).cast("long")
    val x2 = col(x2Col).cast("long")
    val pred = when(zMu(w, x1, x2) > 0, 1L).otherwise(0L)
    df.agg(count(lit(1)).as("n"),
        sum(when(pred === col(labelCol).cast("long"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(lit(w.w0).as("w0_mu"), lit(w.w1).as("w1_mu"),
        lit(w.w2).as("w2_mu"), col("n"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n").cast("double"),
          9).as("accuracy"))
  }

  /** DuckDB restatement: the same epochs unrolled as a CTE chain
    * over `rel(x1, x2, label01)`; ends in
    * `gd_out(w0_mu, w1_mu, w2_mu, n, n_correct, accuracy)`. */
  def fitSql(rel: String, epochs: Int = 3, lrShift: Int = 6): String = {
    val lrDen = 1L << lrShift
    def sig(z: String): String =
      s"greatest(0, least(1000000, 500000 + " +
        s"CAST(floor(CAST($z AS DOUBLE) / 4) AS BIGINT)))"
    def epochCte(i: Int, prev: String): String =
      s"""w$i AS (
         |  SELECT
         |    any_value(pw0) - CAST(floor(CAST(sum(e) AS DOUBLE)
         |      / (CAST(count(*) AS DOUBLE) * $lrDen)) AS BIGINT) AS w0,
         |    any_value(pw1) - CAST(floor(CAST(sum(e * x1) AS DOUBLE)
         |      / (CAST(count(*) AS DOUBLE) * $lrDen)) AS BIGINT) AS w1,
         |    any_value(pw2) - CAST(floor(CAST(sum(e * x2) AS DOUBLE)
         |      / (CAST(count(*) AS DOUBLE) * $lrDen)) AS BIGINT) AS w2
         |  FROM (SELECT r.x1, r.x2, p.w0 AS pw0, p.w1 AS pw1,
         |      p.w2 AS pw2,
         |      CAST(${sig("(p.w0 + p.w1 * r.x1 + p.w2 * r.x2)")}
         |        - r.label01 * 1000000 AS HUGEINT) AS e
         |    FROM $rel r CROSS JOIN $prev p) s
         |)""".stripMargin
    val chain = (1 to epochs).map { i =>
      epochCte(i, if (i == 1) "w0cte" else s"w${i - 1}")
    }.mkString(",\n")
    val wf = s"w$epochs"
    s"""w0cte AS (SELECT CAST(0 AS BIGINT) AS w0,
       |  CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2),
       |$chain,
       |gd_out AS (
       |  SELECT any_value(pw0) AS w0_mu, any_value(pw1) AS w1_mu,
       |    any_value(pw2) AS w2_mu,
       |    CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(hit) AS BIGINT) AS n_correct,
       |    round(CAST(sum(hit) AS DOUBLE)
       |      / CAST(count(*) AS DOUBLE), 9) AS accuracy
       |  FROM (SELECT p.w0 AS pw0, p.w1 AS pw1, p.w2 AS pw2,
       |      CASE WHEN (CASE WHEN p.w0 + p.w1 * r.x1
       |          + p.w2 * r.x2 > 0 THEN 1 ELSE 0 END) = r.label01
       |        THEN 1 ELSE 0 END AS hit
       |    FROM $rel r CROSS JOIN $wf p) s
       |)""".stripMargin
  }
}
