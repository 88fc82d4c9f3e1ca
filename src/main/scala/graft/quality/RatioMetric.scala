package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Delta-method A/B test for RATIO metrics (Deng et al. 2011/2018 —
  * the methodology every experimentation platform uses for
  * clicks-per-view-style metrics): the unit of randomization is the
  * USER but the metric is a ratio of user-level sums, so the naive
  * row-level t-test (q189) is wrong — the variance must come from
  * the delta method over user-level (x, n) moments:
  *
  *   R̂ = Σx/Σn,   Var(R̂) ≈ (Var x − 2R̂·Cov(x,n) + R̂²·Var n)
  *                           / (U · N̄²)
  *
  * Exactness: user-level x (cents) and n are exact integers; the
  * five cross-moments run in DECIMAL(38,0); R̂, both variances and z
  * are fixed double chains rounded 6 dp; arms with U < 2 or zero
  * variance report null z (stated).
  *
  * Scale shape: one user-level rollup (partial-aggregable), one
  * per-(stratum, arm) moment pass, one stratum-width join of the two
  * arms. Never a row-level variance.
  */
object RatioMetric {

  /** Per-stratum delta-method z of ratio Σx/Σn between arms.
    * `isB` splits units; rows aggregate per (stratum, unit) first.
    * Returns (stratum, r_a, r_b, z, significant). */
  def deltaZ(
      df: DataFrame,
      stratumCol: String,
      unitCol: String,
      isB: Column,
      xCentsCol: String,
      zCrit: Double = 1.959963985): DataFrame = {
    val units = df.groupBy(col(stratumCol).as("g"),
        col(unitCol).as("u"), isB.as("arm_b"))
      .agg(sum(col(xCentsCol)).cast("decimal(38,0)").as("x"),
        count(lit(1)).cast("decimal(38,0)").as("n"))
    val moments = units.groupBy("g", "arm_b")
      .agg(count(lit(1)).as("uu"),
        sum(col("x")).as("sx"), sum(col("n")).as("sn"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("n") * col("n")).as("snn"),
        sum(col("x") * col("n")).as("sxn"))
    def d(c: Column) = c.cast("double")
    // sample (co)variances and the delta variance, one fixed chain
    def varR(p: String => Column): Column = {
      val uu = d(p("uu"))
      val r = d(p("sx")) / d(p("sn"))
      val vx = (d(p("sxx")) - d(p("sx")) * d(p("sx")) / uu) / (uu - 1)
      val vn = (d(p("snn")) - d(p("sn")) * d(p("sn")) / uu) / (uu - 1)
      val cxn = (d(p("sxn")) - d(p("sx")) * d(p("sn")) / uu) / (uu - 1)
      val nBar = d(p("sn")) / uu
      (vx - r * cxn * 2 + r * r * vn) / (uu * nBar * nBar)
    }
    val a = moments.filter(!col("arm_b")).drop("arm_b")
      .columns.foldLeft(moments.filter(!col("arm_b")).drop("arm_b")) {
        (df2, c) => df2.withColumnRenamed(c, if (c == "g") c else s"a_$c")
      }
    val b = moments.filter(col("arm_b")).drop("arm_b")
      .columns.foldLeft(moments.filter(col("arm_b")).drop("arm_b")) {
        (df2, c) => df2.withColumnRenamed(c, if (c == "g") c else s"b_$c")
      }
    val joined = a.join(b, Seq("g"))
    def p(pre: String)(name: String): Column = col(s"${pre}_$name")
    val rA = d(col("a_sx")) / d(col("a_sn"))
    val rB = d(col("b_sx")) / d(col("b_sn"))
    val sVar = varR(p("a")) + varR(p("b"))
    val z = (rB - rA) / sqrt(sVar)
    // degenerate arms (U < 2 or zero delta variance) report null —
    // the z statistic is undefined, not zero
    val ok = col("a_uu") > 1 && col("b_uu") > 1 && sVar > 0
    joined.select(col("g").as(stratumCol),
      col("a_uu").as("u_a"), col("b_uu").as("u_b"),
      round(rA / 100, 6).as("r_a"), round(rB / 100, 6).as("r_b"),
      when(ok, round(z, 6)).as("z"),
      when(ok, abs(z) > zCrit).as("significant"))
  }

  /** DuckDB restatement over `rm_rel(g, u, isb, x_cents)`; ends in
    * `rm_out(g, u_a, u_b, r_a, r_b, z, significant)`. */
  def deltaZSql(zCrit: Double = 1.959963985): String = {
    def varR(pre: String): String = {
      def c(n: String) = s"CAST($pre$n AS DOUBLE)"
      val uu = c("uu")
      val r = s"(${c("sx")} / ${c("sn")})"
      val vx = s"((${c("sxx")} - ${c("sx")} * ${c("sx")} / $uu) / ($uu - 1))"
      val vn = s"((${c("snn")} - ${c("sn")} * ${c("sn")} / $uu) / ($uu - 1))"
      val cxn = s"((${c("sxn")} - ${c("sx")} * ${c("sn")} / $uu) / ($uu - 1))"
      val nBar = s"(${c("sn")} / $uu)"
      s"(($vx - $r * $cxn * 2 + $r * $r * $vn) / ($uu * $nBar * $nBar))"
    }
    val rA = "(CAST(a_sx AS DOUBLE) / CAST(a_sn AS DOUBLE))"
    val rB = "(CAST(b_sx AS DOUBLE) / CAST(b_sn AS DOUBLE))"
    val z = s"(($rB - $rA) / sqrt(${varR("a_")} + ${varR("b_")}))"
    s"""rm_units AS (
       |  SELECT g, u, isb,
       |    CAST(sum(x_cents) AS HUGEINT) AS x,
       |    CAST(count(*) AS HUGEINT) AS n
       |  FROM rm_rel GROUP BY g, u, isb
       |), rm_m AS (
       |  SELECT g, isb, CAST(count(*) AS BIGINT) AS uu,
       |    sum(x) AS sx, sum(n) AS sn,
       |    sum(x * x) AS sxx, sum(n * n) AS snn,
       |    sum(x * n) AS sxn
       |  FROM rm_units GROUP BY g, isb
       |), rm_j AS (
       |  SELECT a.g,
       |    a.uu AS a_uu, a.sx AS a_sx, a.sn AS a_sn,
       |    a.sxx AS a_sxx, a.snn AS a_snn, a.sxn AS a_sxn,
       |    b.uu AS b_uu, b.sx AS b_sx, b.sn AS b_sn,
       |    b.sxx AS b_sxx, b.snn AS b_snn, b.sxn AS b_sxn
       |  FROM (SELECT * FROM rm_m WHERE isb = 0) a
       |  JOIN (SELECT * FROM rm_m WHERE isb = 1) b USING (g)
       |), rm_out AS (
       |  SELECT g, a_uu AS u_a, b_uu AS u_b,
       |    round($rA / 100, 6) AS r_a,
       |    round($rB / 100, 6) AS r_b,
       |    CASE WHEN a_uu > 1 AND b_uu > 1
       |        AND ${varR("a_")} + ${varR("b_")} > 0
       |      THEN round($z, 6) END AS z,
       |    CASE WHEN a_uu > 1 AND b_uu > 1
       |        AND ${varR("a_")} + ${varR("b_")} > 0
       |      THEN abs($z) > $zCrit END AS significant
       |  FROM rm_j
       |)""".stripMargin
  }
}
