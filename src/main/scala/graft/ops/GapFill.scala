package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a dense
  * per-key calendar spine and forward-fill measure gaps — the
  * "gap fill / LOCF" operator every metrics warehouse needs before
  * day-over-day math (dbt's date spine + `lag ignore nulls` idiom,
  * Timescale's `time_bucket_gapfill`/`locf`).
  *
  * Scale: the daily reduction over the raw stream is the only
  * data-sized shuffle (partial-agg'd map-side). The spine is
  * |keys| × |days| rows — metadata-sized next to the event stream
  * (150 users × 30 days here; 10⁶ keys × 3650 days = 3.7G rows at
  * the extreme, still ≪ the 100 TB input) — built by broadcasting
  * the day axis against the distinct-key side. The fill itself is a
  * running window partitioned BY KEY, so no global sort and no
  * single-reducer stage anywhere.
  */
object GapFill {

  /** Dense day axis [lo, hi] as a one-column DataFrame (`day`).
    * Bounds are two driver scalars (one min/max aggregate) — never
    * collected rows.
    */
  def daySpine(spark: SparkSession, lo: java.sql.Date, hi: java.sql.Date)
      : DataFrame = {
    val n = java.time.temporal.ChronoUnit.DAYS.between(
      lo.toLocalDate, hi.toLocalDate).toInt + 1
    spark.range(n).select(date_add(lit(lo), col("id").cast("int")).as("day"))
  }

  /** Forward-fill (last observation carried forward) of `valueCols`
    * within each key, ordered by `orderCol`. Nulls before the first
    * observation stay null. One window, partitioned by key.
    */
  def forwardFill(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.foldLeft(df)((d, c) =>
      d.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(w)))
  }

  /** LINEAR interpolation fill — the resampling companion to
    * [[forwardFill]]'s step function (LOCF misstates anything that
    * trends: a sensor ramping 10→20 across a gap did not sit at 10):
    * each null between two observations takes
    * `prev + (next − prev) · (t − t_prev) / (t_next − t_prev)`.
    * Nulls BEFORE the first or AFTER the last observation stay null
    * (extrapolation is a modeling choice, not a fill — compose with
    * forwardFill if trailing holds are wanted). Four
    * keyed-window lookups (running last/first with ignoreNulls) and
    * one fixed arithmetic chain; `was_interpolated` flags the
    * synthesized rows.
    */
  def linearFill(df: DataFrame, keyCols: Seq[String], orderCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCol)
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = col(valueCol)
    val t = col(orderCol)
    val pv = last(v, ignoreNulls = true).over(back)
    val pt = last(when(v.isNotNull, t), ignoreNulls = true).over(back)
    val nv = first(v, ignoreNulls = true).over(fwd)
    val nt = first(when(v.isNotNull, t), ignoreNulls = true).over(fwd)
    df.withColumn("__pv", pv).withColumn("__pt", pt)
      .withColumn("__nv", nv).withColumn("__nt", nt)
      .withColumn(s"${valueCol}_filled",
        when(v.isNotNull, v)
          .when(col("__pv").isNull || col("__nv").isNull,
            lit(null).cast("double"))
          .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
            (t - col("__pt")) / (col("__nt") - col("__pt"))))
      .withColumn("was_interpolated",
        v.isNull && col("__pv").isNotNull && col("__nv").isNotNull)
      .drop("__pv", "__pt", "__nv", "__nt")
  }

  /** Regularize `events` to one row per (key, day) over the full
    * observed day range: count + aggregated measure per cell, gaps
    * explicit (`is_gap`), measure forward-filled per key.
    *
    * @param dayCol   expression yielding the event's day (DateType)
    * @param measure  aggregate over a cell's events (decimal-exact
    *                 aggregates recommended for cross-engine parity)
    */
  def dailyFill(events: DataFrame, keyCol: String, dayCol: Column,
      measure: Column): DataFrame = {
    val spark = events.sparkSession
    val daily = events.groupBy(col(keyCol), dayCol.as("day"))
      .agg(count(lit(1)).as("n_events"), measure.as("day_val"))
    // bounds: a column-pruned min/max scan of the raw stream — two
    // driver scalars, cheaper than materializing the daily agg twice
    val bounds = events.agg(min(dayCol), max(dayCol)).head()
    if (bounds.isNullAt(0))
      // same column ORDER as the normal path (forwardFill appends
      // the filled column last) so positional consumers agree
      return daily.where(lit(false))
        .select(col(keyCol), col("day"), col("n_events"), col("day_val"),
          col("day_val").isNull.as("is_gap"),
          col("day_val").as("day_val_filled"))
    val days = daySpine(spark, bounds.getDate(0), bounds.getDate(1))
    val keys = events.select(col(keyCol)).distinct()
    val cells = keys.crossJoin(broadcast(days))
    val joined = cells.join(daily, Seq(keyCol, "day"), "left")
      .select(col(keyCol), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_val"), col("day_val").isNull.as("is_gap"))
    forwardFill(joined, Seq(keyCol), "day", Seq("day_val"))
  }
}
