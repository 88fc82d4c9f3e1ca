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

  /** Percentile profiling at scale: `percentile_approx` (Spark's
    * Greenwald-Khanna sketch — ONE pass, mergeable partials, bounded
    * memory; the only way to profile percentiles of a 100 TB column)
    * CONTRACT-checked in-line against the exact interpolated
    * percentile. Output, one row per (column, q):
    *
    *   (column_name, q, exact_v, approx_ok)
    *
    * `exact_v` is the type-1 discrete quantile — the element at rank
    * `max(1, ceil(q·n))` of the sorted non-null values. An element OF
    * the data, not an interpolation, so the cross-engine compare
    * (DuckDB `quantile_disc` uses the same convention) is bit-exact
    * with no float-formula coupling. `approx_ok` verifies the
    * sketch's published guarantee — the approx value's RANK sits
    * within `n / accuracy` of the target rank (GK bounds rank error,
    * not value error, so that is the honest check).
    *
    * The approx path is the 100 TB path (one pass, no sort). The
    * exact+check columns are the verification harness and cost a
    * per-column sort plus a second scan; production profiling at
    * scale calls `percentile_approx` alone and trusts the bound this
    * gate proves.
    */
  def quantiles(df: DataFrame, cols: Seq[String], qs: Seq[Double],
      accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty && qs.nonEmpty, "quantiles needs columns and qs")
    require(qs.forall(q => q >= 0.0 && q <= 1.0), "q must be in [0,1]")
    val qArr = array(qs.map(lit): _*)
    val pass1 = cols.flatMap { c =>
      Seq(
        percentile_approx(col(c).cast("double"), qArr, lit(accuracy))
          .as(s"${c}__a"),
        count(col(c)).as(s"${c}__n"),
        // bounds ride the same scan: they seed the exact harness's
        // range buckets below for free
        min(col(c).cast("double")).as(s"${c}__lo"),
        max(col(c).cast("double")).as(s"${c}__hi"))
    }
    val first = df.agg(pass1.head, pass1.tail: _*).head()

    // exact type-1 quantiles: ONE pipeline for all columns. Rows
    // collapse to (column, value, count) with map-side partial
    // aggregation FIRST (tie-dense columns shrink by orders of
    // magnitude). The running count over each column's sorted
    // distinct values is then a TWO-PHASE prefix sum — NOT a window
    // partitioned only by column, which would sort every distinct
    // value of a high-cardinality column in one reducer (the classic
    // 100×-scale killer): values range-bucket on fixed bounds from a
    // cheap min/max agg, per-(column,bucket) subtotal prefix sums
    // fold on the driver (≤ cols·nBuckets scalars), and the
    // within-bucket running sum is a window partitioned by
    // (column, bucket) — every bucket sorts in parallel. The element
    // at target rank t is the value whose cumulative interval
    // (cum-cnt, cum] contains t. Harness-only: production profiling
    // at scale is the approx sketch above.
    val targetsByCol: Map[String, Seq[Long]] = cols.map { c =>
      val n = first.getLong(first.fieldIndex(s"${c}__n"))
      c -> qs.map(q => math.max(1L, math.ceil(q * n).toLong)).distinct
    }.toMap
    val allTargets = targetsByCol.values.flatten.toSeq.distinct
    val exactByCol: Map[String, Map[Long, Double]] = {
      val nBuckets = 64
      // fixed-width range buckets from pass1's bounds: a literal,
      // monotone-in-v expression — deterministic, no sampling
      def bucketOf(c: String, v: org.apache.spark.sql.Column) = {
        val fiLo = first.fieldIndex(s"${c}__lo")
        if (first.isNullAt(fiLo)) lit(0L)
        else {
          val lo = first.getDouble(fiLo)
          val hi = first.getDouble(first.fieldIndex(s"${c}__hi"))
          // NaN hi (any NaN in the column makes max() NaN) fails the
          // > test and degrades width to 1.0 — real values then clamp
          // into the top bucket, still monotone
          val w = if (hi > lo) (hi - lo) / nBuckets else 1.0
          // NaN VALUES never
          // reach the buckets: na.drop below excludes both null and
          // NaN (the pre-existing convention — NaN counts toward n
          // via count(col) but can't be an exact quantile value, so
          // NaN-rank targets report a NULL exact). The isnan branch
          // is defense-in-depth should that drop ever move: NaN
          // sorts LAST in Spark's double ordering, so the last
          // bucket is its only rank-correct home.
          when(isnan(v), lit(nBuckets - 1L)).otherwise(
            least(greatest(floor((v - lit(lo)) / lit(w)).cast("long"), lit(0L)),
              lit(nBuckets - 1L)))
        }
      }
      def exploded = df.select(explode(array(cols.map(c =>
          struct(lit(c).as("cn"), col(c).cast("double").as("v"),
            bucketOf(c, col(c).cast("double")).as("b"))): _*)).as("p"))
        .select(col("p.cn"), col("p.v"), col("p.b")).na.drop(Seq("v"))
      // phase 1: per-(column,bucket) ROW subtotals straight off the
      // scan — ≤ cols·nBuckets rows to the driver, prefix-summed here
      val subtotals = exploded.groupBy("cn", "b")
        .agg(count(lit(1)).as("bsum"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val bases = subtotals.keys.toSeq.sorted.groupBy(_._1).flatMap {
        case (cn, ks) =>
          ks.scanLeft((cn, -1L) -> 0L) { case ((_, acc), k) =>
            k -> (acc + subtotals(k))
          }.init.zip(ks).map { case (((_, _), base), k) => k -> base }
      }
      val baseDf = broadcast(df.sparkSession
        .createDataFrame(bases.toSeq.map { case ((cn, b), base) => (cn, b, base) })
        .toDF("cn", "b", "base"))
      // phase 2: distinct-value counts, then the within-bucket running
      // sum — a window partitioned by (column, bucket), so every
      // bucket sorts in PARALLEL (never one reducer per column)
      val counts = exploded.groupBy("cn", "b", "v").agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cn", "b").orderBy(col("v"))
      // a value with running count cum occupies ranks (cum-cnt, cum]
      val cum = counts.join(baseDf, Seq("cn", "b"))
        .withColumn("cum", col("base") + sum(col("cnt")).over(w))
      val hitsRaw = cum.filter(allTargets.map(t =>
          col("cum") >= t && (col("cum") - col("cnt")) < t).reduce(_ || _))
        .select("cn", "v", "cnt", "cum").collect()
      cols.map { c =>
        val rows = hitsRaw.filter(_.getString(0) == c)
        c -> targetsByCol(c).flatMap { t =>
          rows.find(r => r.getLong(3) >= t && r.getLong(3) - r.getLong(2) < t)
            .map(r => t -> r.getDouble(1))
        }.toMap
      }.toMap
    }

    // rank check: a tied value occupies the rank INTERVAL
    // [count(x < v) + 1, count(x <= v)], so the sketch honors its
    // bound iff that interval comes within n/accuracy of the target
    // rank (+1 for rank convention)
    val checks = cols.flatMap { c =>
      // an all-null column has no sketch: emit empty interval (flag false)
      val approx = Option(first.getSeq[Any](first.fieldIndex(s"${c}__a")))
      qs.indices.flatMap { i =>
        approx match {
          case Some(a) =>
            Seq(
              sum(when(col(c).cast("double") < lit(a(i)), 1L).otherwise(0L))
                .as(s"${c}__lo$i"),
              sum(when(col(c).cast("double") <= lit(a(i)), 1L).otherwise(0L))
                .as(s"${c}__hi$i"))
          case None =>
            Seq(max(lit(0L)).as(s"${c}__lo$i"), max(lit(0L)).as(s"${c}__hi$i"))
        }
      }
    }
    val ranks = df.agg(checks.head, checks.tail: _*).head()

    val rows = cols.flatMap { c =>
      val n = first.getLong(first.fieldIndex(s"${c}__n"))
      val tol = n.toDouble / accuracy + 1
      qs.zipWithIndex.map { case (q, i) =>
        val target = math.max(1L, math.ceil(q * n).toLong)
        val exact = exactByCol(c).get(target)
        def get(name: String) = {
          val fi = ranks.fieldIndex(name)
          if (ranks.isNullAt(fi)) 0L else ranks.getLong(fi)
        }
        val lo = get(s"${c}__lo$i") + 1 // first rank the value occupies
        val hi = get(s"${c}__hi$i")     // last rank the value occupies
        val ok = n > 0 && hi >= lo &&
          target >= lo - tol && target <= hi + tol
        (c, q, exact, ok)
      }
    }
    df.sparkSession.createDataFrame(rows)
      .toDF("column_name", "q", "exact_v", "approx_ok")
  }
}
