package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Day-of-week seasonal profile per series — the multiplicative
  * seasonality readout ("Mondays run at 1.3× the series mean") that
  * pairs with [[Acf]]'s lag structure: classical seasonal-index
  * decomposition specialized to the weekly cycle, on an epoch-day
  * keyed integer series.
  *
  * Exactness: per-(series, weekday) and per-series sums stay exact
  * integers (DECIMAL(38,0)); the index is the rational
  *   (S_w · n) / (n_w · S)
  * — each side one exact product, converted to double once, divided
  * once. A zero-total series reports a null index (there is no
  * "share of nothing").
  *
  * Weekday convention: epoch day 0 (1970-01-01) was a Thursday, so
  * dow = (day + 3) mod 7 lands Monday = 0 .. Sunday = 6 — pure
  * integer arithmetic, identical in any engine, no timezone or
  * locale dependence.
  *
  * 100 TB shape: two partial-aggregable groupBys (7 rows per series,
  * then 1) and a broadcast join back — nothing else moves.
  */
object Seasonal {

  /** @param df (g, day, x): series key, epoch-day, integer-unit value
    *   (fill calendar gaps with explicit zeros first — absent days
    *   silently bias the weekday means).
    * @return (g, dow, n_days, mean_x, seasonal_index).
    */
  def weekdayProfile(df: DataFrame): DataFrame = {
    val d = df.select(col("g"),
      pmod(col("day").cast("long") + 3, lit(7)).as("dow"),
      col("x").cast("decimal(38,0)"))
    val per = d.groupBy("g", "dow").agg(
      count(lit(1)).as("n_days"), sum(col("x")).as("sd"))
    val tot = d.groupBy("g").agg(
      count(lit(1)).cast("decimal(38,0)").as("n"), sum(col("x")).as("s"))
    per.join(broadcast(tot), "g")
      .select(col("g"), col("dow"), col("n_days"),
        round(col("sd").cast("double") / col("n_days").cast("double"), 6)
          .as("mean_x"),
        when(col("s") =!= 0, round(
          (col("sd") * col("n")).cast("double") /
            (col("n_days").cast("decimal(38,0)") * col("s")).cast("double"),
          9)).as("seasonal_index"))
  }
}
