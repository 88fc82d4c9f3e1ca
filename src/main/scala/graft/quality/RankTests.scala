package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-free two-sample tests per stratum — the
  * nonparametric siblings of [[AbTest.welch]] for experiment
  * readouts whose metric is skewed or heavy-tailed (latencies,
  * revenue-per-user), where the t-test's normality lean is exactly
  * what you don't want to assume:
  *
  *  - Kolmogorov–Smirnov: D = max over v of |F_a(v) − F_b(v)|, the
  *    largest ECDF gap — "are these two distributions the same
  *    SHAPE?", reported with the value where the gap peaks.
  *  - Mann–Whitney U (Wilcoxon rank-sum): mid-rank U statistic with
  *    the tie-corrected normal approximation — "does one arm
  *    stochastically dominate?".
  *
  * Exactness: both statistics are built from INTEGER cumulative
  * counts. KS's gap is compared as the cross-multiplied integer
  * |cumA·nB − cumB·nA| (exact — no per-row float ECDFs), divided
  * once at the end; U uses doubled ranks (2R = Σ ca·(2·cum − m + 1))
  * so mid-ranks at ties never leave the integers until the closing
  * fixed double chain. Cross-engine reproducible to the printed
  * digits.
  *
  * 100 TB shape: one (stratum, value) count groupBy, then cumulative
  * counts via a two-level prefix — per-(stratum, range-bucket)
  * subtotals get their bucket base from a window over the
  * buckets-per-stratum frame (≤ nBuckets rows per stratum), and the
  * within-bucket running sum is a window partitioned by
  * (stratum, bucket), so every bucket sorts in PARALLEL. No global
  * sort, no per-stratum single reducer, no driver-side state (the
  * bucket-base frame stays distributed, broadcast back by size).
  */
object RankTests {

  private val NBuckets = 64

  /** Per-(stratum, distinct value) arm counts + exact cumulative arm
    * counts in value order. Columns: g, v, ca, cb, cuma, cumb.
    */
  private[graft] def cumulativeCounts(
      df: DataFrame, stratumCol: String, isB: Column,
      valueCol: String): DataFrame = {
    val base = df.select(col(stratumCol).as("g"),
      col(valueCol).cast("double").as("v"),
      when(isB, 1L).otherwise(0L).as("isb"))
    val perValue = base.groupBy("g", "v")
      .agg(sum(lit(1L) - col("isb")).as("ca"), sum(col("isb")).as("cb"))
    // fixed-width range buckets from per-stratum bounds: a monotone-
    // in-v assignment, so (bucket, v) order IS v order
    val bounds = perValue.groupBy("g")
      .agg(min("v").as("lo"), max("v").as("hi"))
    val w = when(col("hi") > col("lo"),
      (col("hi") - col("lo")) / NBuckets).otherwise(lit(1.0))
    val bucketed = perValue.join(broadcast(bounds), "g")
      .withColumn("b", least(greatest(
        floor((col("v") - col("lo")) / w).cast("long"), lit(0L)),
        lit(NBuckets - 1L)))
      .drop("lo", "hi")
    // bucket bases: exclusive prefix over the ≤ NBuckets-per-stratum
    // subtotal frame — tiny, distributed, broadcast back
    val subtot = bucketed.groupBy("g", "b")
      .agg(sum("ca").as("sa"), sum("cb").as("sb"))
    val wb = Window.partitionBy("g").orderBy("b")
    val bases = subtot.select(col("g"), col("b"),
      (sum(col("sa")).over(wb) - col("sa")).as("basea"),
      (sum(col("sb")).over(wb) - col("sb")).as("baseb"))
    val wv = Window.partitionBy("g", "b").orderBy("v")
    bucketed.join(broadcast(bases), Seq("g", "b"))
      .select(col("g"), col("v"), col("ca"), col("cb"),
        (col("basea") + sum(col("ca")).over(wv)).as("cuma"),
        (col("baseb") + sum(col("cb")).over(wv)).as("cumb"))
  }

  /** Two-sample KS per stratum.
    * @return (stratum, n_a, n_b, d_stat, at_value) — d_stat the max
    *         ECDF gap, at_value the largest value attaining it.
    */
  def ksTest(df: DataFrame, stratumCol: String, isB: Column,
      valueCol: String): DataFrame = {
    val cum = cumulativeCounts(df, stratumCol, isB, valueCol)
    val counts = cum.groupBy("g")
      .agg(sum("ca").as("n_a"), sum("cb").as("n_b"))
    // exact integer cross-multiplied gap; DECIMAL(38,0) so the
    // product never wraps at petabyte-scale counts
    val num = abs(col("cuma").cast("decimal(38,0)") * col("n_b")
      - col("cumb").cast("decimal(38,0)") * col("n_a"))
    cum.join(broadcast(counts), "g")
      .withColumn("num", num)
      .groupBy("g")
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(struct(col("num"), col("v"))).as("top"))
      .select(col("g").as("stratum"), col("n_a"), col("n_b"),
        round(col("top.num").cast("double")
          / (col("n_a").cast("double") * col("n_b").cast("double")), 12)
          .as("d_stat"),
        col("top.v").as("at_value"))
  }

  /** Mann–Whitney U per stratum (mid-ranks, tie-corrected z).
    * @return (stratum, n_a, n_b, u_a, z, significant) — u_a is arm
    *         A's U; z the normal approximation (null when the
    *         variance degenerates, i.e. every value tied);
    *         significant = |z| > 1.96.
    */
  def mannWhitney(df: DataFrame, stratumCol: String, isB: Column,
      valueCol: String): DataFrame = {
    val cum = cumulativeCounts(df, stratumCol, isB, valueCol)
    val m = col("ca") + col("cb")
    val cump = col("cuma") + col("cumb")
    val agg = cum.groupBy("g").agg(
      sum("ca").as("n_a"), sum("cb").as("n_b"),
      // doubled rank-sum: Σ ca·(2·cum − m + 1) keeps mid-ranks exact
      sum(col("ca").cast("decimal(38,0)")
        * (lit(2) * cump - m + 1)).as("r2a"),
      // tie correction Σ (m³ − m) over distinct pooled values
      sum(m.cast("decimal(38,0)") * m * m - m).as("tsum"))
    val nA = col("n_a").cast("double")
    val nB = col("n_b").cast("double")
    val nD = nA + nB
    val uA = (col("r2a").cast("double")
      - nA * (nA + lit(1.0))) / lit(2.0)
    val varU = nA * nB / lit(12.0) *
      ((nD + lit(1.0)) - col("tsum").cast("double") / (nD * (nD - lit(1.0))))
    val z = (uA - nA * nB / lit(2.0)) / sqrt(varU)
    agg.select(col("g").as("stratum"), col("n_a"), col("n_b"),
      round(uA, 6).as("u_a"),
      when(varU > 0, round(z, 6)).as("z"),
      when(varU > 0, abs(z) > 1.96).as("significant"))
  }

  /** Spearman rank correlation per stratum — the monotone-
    * association readout next to q68's Pearson: invariant to any
    * monotone transform of either variable, so heavy tails and
    * nonlinearity (the default for volumes, latencies, revenue)
    * don't fake or hide a relationship.
    *
    * ρ = Pearson over MID-RANKS, carried as DOUBLED ranks
    * (2R(v) = 2·cum(v) − cnt(v) + 1 — exact integers at ties, the
    * [[mannWhitney]] device). All five moments accumulate in
    * DECIMAL(38,0) (bound: n ≲ 10⁹ per stratum before n·Σxy needs
    * more digits — swap wider there), and ρ closes with one fixed
    * double chain, 9dp. Zero variance in either variable (all
    * values tied) → null.
    *
    * Scale shape: two [[cumulativeCounts]] rank passes (the
    * two-level bucketed prefix — no global sort), two keyed joins
    * back to rows, one partial-aggregatable moment groupBy.
    */
  /** Kruskal–Wallis H per stratum — the k-SAMPLE extension of
    * [[mannWhitney]] ("do any of these k arms differ?"), the
    * nonparametric one-way ANOVA for skewed metrics:
    *
    *   H = 12/(N(N+1)) · Σᵢ Rᵢ²/nᵢ − 3(N+1),  tie-corrected by
    *   H' = H / (1 − Σ(t³−t)/(N³−N))
    *
    * Doubled mid-ranks keep every rank sum integer (Rᵢ² = r2ᵢ²/4
    * folds into the 12→3 constant); each group's Rᵢ²/nᵢ term is
    * µ-quantized to 6dp BEFORE the decimal-exact cross-group total
    * (k summands of a float sum would otherwise expose addition
    * order), then one fixed double chain closes H'. All-tied
    * strata (zero tie-corrected denominator) report null.
    *
    * Scale shape: one pooled (stratum, value) census + one
    * (stratum, value, group) census, pooled ranks via the same
    * two-level prefix as the two-sample tests, one keyed join, two
    * partial-aggregatable rollups. Output ∝ strata.
    */
  def kruskalWallis(df: DataFrame, stratumCol: String, groupCol: String,
      valueCol: String): DataFrame = {
    val base = df.select(col(stratumCol).as("g"), col(groupCol).as("grp"),
      col(valueCol).cast("double").as("v"))
    // pooled doubled mid-ranks per (stratum, value)
    val pooled = cumulativeCounts(base, "g", lit(false), "v")
      .select(col("g"), col("v"),
        (lit(2) * col("cuma") - col("ca") + 1).as("r2"),
        col("ca").as("m"))
    val perGroup = base.groupBy("g", "grp", "v")
      .agg(count(lit(1)).as("c"))
    val grp = perGroup.join(pooled.select("g", "v", "r2"), Seq("g", "v"))
      .groupBy("g", "grp")
      .agg(sum(col("c").cast("decimal(38,0)") * col("r2")).as("r2sum"),
        sum(col("c")).as("n_i"))
    // µ-quantized per-group term, exact cross-group total
    val term = round((col("r2sum") * col("r2sum")).cast("double") /
      col("n_i").cast("double"), 6).cast("decimal(38,6)")
    val byStratum = grp.groupBy("g")
      .agg(count(lit(1)).as("k_groups"), sum(term).as("s"))
    val ties = pooled.groupBy("g")
      .agg(sum(col("m")).as("n"),
        sum(col("m").cast("decimal(38,0)") * col("m") * col("m")
          - col("m")).as("tsum"))
    val nD = col("n").cast("double")
    val h = lit(3.0) / (nD * (nD + lit(1.0))) * col("s").cast("double") -
      lit(3.0) * (nD + lit(1.0))
    val corr = lit(1.0) -
      col("tsum").cast("double") / (nD * nD * nD - nD)
    byStratum.join(ties, "g")
      .select(col("g").as("stratum"), col("n").cast("long").as("n"),
        col("k_groups"), (col("k_groups") - 1).as("df"),
        when(corr > 0, round(h / corr, 6)).as("h"))
  }

  def spearman(df: DataFrame, stratumCol: String, xCol: String,
      yCol: String): DataFrame = {
    def ranks(valueCol: String, out: String): DataFrame =
      cumulativeCounts(df, stratumCol, lit(false), valueCol)
        .select(col("g").as(s"${out}_g"), col("v").as(s"${out}_v"),
          (lit(2) * col("cuma") - col("ca") + 1).as(out))
    val rx = ranks(xCol, "rx")
    val ry = ranks(yCol, "ry")
    val rows = df.select(col(stratumCol).as("g"),
      col(xCol).cast("double").as("xv"), col(yCol).cast("double").as("yv"))
    val ranked = rows
      .join(rx, col("g") === col("rx_g") && col("xv") === col("rx_v"))
      .join(ry, col("g") === col("ry_g") && col("yv") === col("ry_v"))
      .select(col("g"), col("rx").cast("decimal(38,0)").as("a"),
        col("ry").cast("decimal(38,0)").as("b"))
    val m = ranked.groupBy("g").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("a")).as("sx"), sum(col("b")).as("sy"),
      sum(col("a") * col("b")).as("sxy"),
      sum(col("a") * col("a")).as("sxx"),
      sum(col("b") * col("b")).as("syy"))
    val varX = (col("n") * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    val varY = (col("n") * col("syy") - col("sy") * col("sy"))
      .cast("double")
    val num = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    m.select(col("g").as("stratum"), col("n").cast("long").as("n"),
      when(varX > 0 && varY > 0,
        round(num / sqrt(varX * varY), 9)).as("rho"))
  }
}
