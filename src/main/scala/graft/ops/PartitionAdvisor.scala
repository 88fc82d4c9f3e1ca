package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partition-key advisor — the layout member of the planning-advisor
  * family (q178 "should I salt this join", q181 "how big is this
  * join", q160/q132 execute a CHOSEN layout; this picks the key):
  * for each candidate column, the facts that decide a Hive/lakehouse
  * partition scheme — distinct count (= directory count), top-1
  * value share (skew → one giant partition), null share (rows that
  * fall into the __HIVE_DEFAULT_PARTITION__ hole), rows per
  * partition — and a thresholded verdict with the FIRST failing
  * reason (nulls > skew > too-few > too-many), so the output is an
  * explanation, not just a score.
  *
  * One expand pass (q172's discipline): candidates melt into
  * (candidate, value) rows via a single generator projection, one
  * partial-aggregated census, one candidates-sized rollup — the
  * table is scanned ONCE however many candidates are probed. Values
  * census as strings (partition directories are strings anyway).
  *
  * All thresholds are explicit parameters; the verdict chain is a
  * fixed CASE over exact integer ratios, restated identically in the
  * SQL twin.
  */
object PartitionAdvisor {

  /** @param cands (name, expression) candidate partition keys.
    * @return (candidate, n_rows, n_distinct, rows_per_partition,
    *   top_share, null_share, verdict)
    */
  def advise(df: DataFrame, cands: Seq[(String, Column)],
      minParts: Int = 8, maxParts: Int = 100000,
      maxTopShare: Double = 0.2, maxNullShare: Double = 0.01): DataFrame = {
    require(cands.nonEmpty, "need at least one candidate")
    require(minParts >= 1 && maxParts > minParts, "bad partition bounds")
    val melted = df.select(explode(array(cands.map { case (n, c) =>
      struct(lit(n).as("cand"), c.cast("string").as("v"))
    }: _*)).as("s")).select(col("s.cand").as("cand"), col("s.v").as("v"))
    val census = melted.groupBy("cand", "v").agg(count(lit(1)).as("c"))
    val stats = census.groupBy("cand").agg(
      coalesce(sum(when(col("v").isNotNull, col("c"))), lit(0L))
        .as("n_nonnull"),
      coalesce(sum(when(col("v").isNull, col("c"))), lit(0L)).as("n_null"),
      count(when(col("v").isNotNull, 1)).as("n_distinct"),
      max(when(col("v").isNotNull, col("c"))).as("top_c"))
    val nRows = col("n_nonnull") + col("n_null")
    val topShare = round(col("top_c").cast("double") / col("n_nonnull"), 6)
    val nullShare = round(col("n_null").cast("double") / nRows, 6)
    val verdict = when(nullShare > maxNullShare, "null_heavy")
      .when(topShare > maxTopShare, "skewed")
      .when(col("n_distinct") < minParts, "too_few_partitions")
      .when(col("n_distinct") > maxParts, "too_many_partitions")
      .otherwise("ok")
    stats.select(col("cand").as("candidate"), nRows.as("n_rows"),
      col("n_distinct"),
      expr("n_nonnull div greatest(n_distinct, 1)")
        .as("rows_per_partition"),
      topShare.as("top_share"), nullShare.as("null_share"),
      verdict.as("verdict"))
  }

  /** SQL twin: candidates as (name, sqlExpr) pairs over `table`,
    * identical thresholds and CASE order.
    */
  def sql(table: String, cands: Seq[(String, String)],
      minParts: Int = 8, maxParts: Int = 100000,
      maxTopShare: Double = 0.2, maxNullShare: Double = 0.01): String = {
    val melt = cands.map { case (n, e) =>
      s"  SELECT '$n' AS cand, CAST($e AS VARCHAR) AS v FROM $table"
    }.mkString("\n  UNION ALL\n")
    s"""WITH m AS (
       |$melt
       |), census AS (
       |  SELECT cand, v, count(*) AS c FROM m GROUP BY 1, 2
       |), stats AS (
       |  SELECT cand,
       |    COALESCE(sum(c) FILTER (v IS NOT NULL), 0) AS n_nonnull,
       |    COALESCE(sum(c) FILTER (v IS NULL), 0) AS n_null,
       |    count(*) FILTER (v IS NOT NULL) AS n_distinct,
       |    max(c) FILTER (v IS NOT NULL) AS top_c
       |  FROM census GROUP BY cand
       |), r AS (
       |  SELECT cand, CAST(n_nonnull + n_null AS BIGINT) AS n_rows,
       |    n_distinct,
       |    CAST(n_nonnull // greatest(n_distinct, 1) AS BIGINT)
       |      AS rows_per_partition,
       |    round(CAST(top_c AS DOUBLE) / n_nonnull, 6) AS top_share,
       |    round(CAST(n_null AS DOUBLE) / (n_nonnull + n_null), 6)
       |      AS null_share
       |  FROM stats
       |)
       |SELECT cand AS candidate, n_rows, n_distinct, rows_per_partition,
       |  CASE WHEN null_share > $maxNullShare THEN 'null_heavy'
       |    WHEN top_share > $maxTopShare THEN 'skewed'
       |    WHEN n_distinct < $minParts THEN 'too_few_partitions'
       |    WHEN n_distinct > $maxParts THEN 'too_many_partitions'
       |    ELSE 'ok' END AS verdict,
       |  top_share, null_share
       |FROM r ORDER BY candidate""".stripMargin
  }
}
