package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sample autocorrelation per series — the "is there structure left?"
  * diagnostic next to [[graft.quality.Trend]]'s OLS slope and
  * [[graft.quality.Cusum]]'s level shifts: r_k for lags 1..K over an
  * equally-spaced integer-valued series (quantize money to cents
  * first; fill calendar gaps explicitly — a missing day is a
  * modeling decision the caller makes, not one this operator hides).
  *
  * Exactness: the textbook estimator
  *   r_k = Σ_{t≤n−k} (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²
  * is evaluated with the mean multiplied OUT — both sides scale by
  * n², leaving pure integer sums:
  *   num·n² = n²·Σ x_t·x_{t+k} − n·S·(Σ_head + Σ_tail) + (n−k)·S²
  *   den·n² = n²·Σx² − n·S²
  * (S = Σx). Sums ride DECIMAL(38,0) (exact far past any calendar's
  * series length × cent magnitudes); each side converts to double
  * once and divides once, so the printed digits are engine-stable.
  * Integer arithmetic is order-independent — no quantization games.
  *
  * 100 TB shape: the lag pairing is one keyed self-join on
  * (series, t + k) after an explode over the K lags — keyed shuffles
  * only, K·n rows in flight, no window over a whole series and no
  * driver state. Series count scales out; series LENGTH is calendar-
  * bounded, which is what keeps the decimals far from their 10³⁸
  * ceiling.
  */
object Acf {

  /** @param df (g, t, x): series key, contiguous integer time index,
    *   integer-unit value.
    * @return (g, lag, n_pairs, r) for lag 1..maxLag; r is null for a
    *   degenerate (constant) series.
    */
  def acf(df: DataFrame, maxLag: Int): DataFrame = {
    val d = df.select(col("g"), col("t").cast("long"),
      col("x").cast("decimal(38,0)"))
    val stats = d.groupBy("g").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"),
      sum(col("x")).as("s"),
      sum(col("x") * col("x")).as("ss"))
    val head = d.select(col("g"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"),
        (col("t") + col("lag")).as("t2"), col("x").as("xh"))
    val tail = d.select(col("g"), col("t").as("t2"), col("x").as("xt"))
    val pairs = head.join(tail, Seq("g", "t2"))
      .groupBy("g", "lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("xh") * col("xt")).as("sxy"),
        sum(col("xh")).as("sh"), sum(col("xt")).as("st"))
    val n = col("n")
    val s = col("s")
    val k = col("lag").cast("decimal(38,0)")
    val num = n * n * col("sxy") - n * s * (col("sh") + col("st")) +
      (n - k) * s * s
    val den = n * n * col("ss") - n * s * s
    pairs.join(broadcast(stats), "g")
      .select(col("g"), col("lag").cast("long").as("lag"), col("n_pairs"),
        when(den =!= 0,
          round(num.cast("double") / den.cast("double"), 12)).as("r"))
  }
}
