package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling for the catalog — the data-quality companion to
  * `Catalog.introspect`: per-column null/distinct/min/max/mean/
  * variance in ONE aggregate pass over the table (a 50-column profile
  * of a 100 TB table is a single scan with partial aggregation, plus
  * the one expand Spark inserts for multi-column DISTINCT counts).
  *
  * Mean/variance are computed from DECIMAL power sums (exact,
  * order-independent) and only then combined in double — so the
  * result is bit-reproducible across engines, unlike streaming
  * variance (Welford merges are partial-order-dependent in the last
  * bits).
  */
object Profile {

  /** Pearson correlation for column pairs — ONE aggregate pass for
    * any number of pairs, from decimal-exact power/cross sums (the
    * engine-native corr() merges partial moments in partial order,
    * which is not bit-reproducible; this is). Rows where either side
    * is null are excluded, per SQL corr. Constant columns → NULL.
    */
  def correlation(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "correlation needs at least one pair")
    def dec(c: Column) = c.cast("decimal(18,4)")
    val aggs = pairs.zipWithIndex.flatMap { case ((x, y), i) =>
      val both = col(x).isNotNull && col(y).isNotNull
      def m(c: Column) = when(both, c)
      Seq(
        sum(when(both, 1L)).as(s"n$i"),
        sum(m(dec(col(x)))).as(s"sx$i"),
        sum(m(dec(col(y)))).as(s"sy$i"),
        sum(m(dec(col(x)) * dec(col(y)))).as(s"sxy$i"),
        sum(m(dec(col(x)) * dec(col(x)))).as(s"sx2$i"),
        sum(m(dec(col(y)) * dec(col(y)))).as(s"sy2$i"))
    }
    val aggd = df.agg(aggs.head, aggs.tail: _*)
    aggd.select(explode(array(pairs.zipWithIndex.map { case ((x, y), i) =>
        val n = coalesce(col(s"n$i"), lit(0L)).cast("double")
        val sx = col(s"sx$i").cast("double")
        val sy = col(s"sy$i").cast("double")
        val sxy = col(s"sxy$i").cast("double")
        val sx2 = col(s"sx2$i").cast("double")
        val sy2 = col(s"sy2$i").cast("double")
        val dx = n * sx2 - sx * sx
        val dy = n * sy2 - sy * sy
        struct(lit(s"${x}__$y").as("pair"),
          n.cast("long").as("n_rows"),
          when(dx > 0 && dy > 0,
            (n * sxy - sx * sy) / sqrt(dx * dy)).as("corr"))
      }: _*)).as("r"))
      .select("r.*")
  }

  /** Profile numeric (or integral) columns. Returns one row per
    * column: (column_name, n_nonnull, n_null, n_distinct, min_v,
    * max_v, mean, var_samp).
    */
  def numeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    def dec(c: String) = col(c).cast("decimal(18,4)")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"),
        sum(dec(c)).as(s"${c}__s1"),
        sum(dec(c) * dec(c)).as(s"${c}__s2"))
    }
    val aggd = df.agg(aggs.head, aggs.tail: _*)
    aggd.select(explode(array(cols.map { c =>
        val n = col(s"${c}__n")
        val s1 = col(s"${c}__s1").cast("double")
        val s2 = col(s"${c}__s2").cast("double")
        struct(lit(c).as("column_name"),
          n.as("n_nonnull"),
          coalesce(col(s"${c}__nn"), lit(0L)).cast("long").as("n_null"),
          col(s"${c}__nd").as("n_distinct"),
          col(s"${c}__min").as("min_v"),
          col(s"${c}__max").as("max_v"),
          (s1 / n).as("mean"),
          // SQL var_samp is NULL below 2 observations (the n-1
          // division would otherwise emit NaN/±Inf from cancellation)
          when(n > 1, (s2 - s1 * s1 / n) / (n - 1)).as("var_samp"))
      }: _*)).as("r"))
      .select("r.*")
  }
}
