package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch-over-batch data contract — the dbt-expectations /
  * great-expectations audit between consecutive snapshots of the
  * same feed: today's batch must look like yesterday's within
  * declared tolerances, or the pipeline halts BEFORE publishing.
  * Completes the quality family's time axis: q12/q13 test one batch
  * against itself, q86/q304 measure drift; this GATES it.
  *
  * Four standard checks with literal bounds:
  *   row_ratio      nB/nA              ∈ [loRatio, hiRatio]
  *   key_ratio      |keys_B|/|keys_A|  ∈ [loRatio, hiRatio]
  *   cat_share_delta |share_B − share_A| of a watched category ≤ maxShareDelta
  *   mean_drift     |mean_B − mean_A| / |mean_A| ≤ maxMeanDrift
  *
  * Exactness: both snapshots collapse to one 4-scalar aggregate
  * each (n, distinct keys, category hits, decimal value sum); every
  * observed value is a fixed chain of exact-int divisions rounded
  * 6 dp; bounds are literals, so `ok` is a deterministic comparison.
  *
  * Scale shape: two partial-aggregable passes + literal report rows
  * (the q279/q295 explode-literals shape). distinct-key counts are
  * the only shuffle-heavy piece — swap in approx_count_distinct
  * at 100 TB if exactness is waived (stated trade).
  */
object SnapshotContract {

  /** Audit snapshot B against baseline A. */
  def audit(
      a: DataFrame,
      b: DataFrame,
      keyCol: String,
      valueCol: String,
      catCol: String,
      watchedCat: String,
      loRatio: Double = 0.5,
      hiRatio: Double = 2.0,
      maxShareDelta: Double = 0.05,
      maxMeanDrift: Double = 0.2): DataFrame = {
    def cells(df: DataFrame, sfx: String) = df.agg(
      count(lit(1)).as(s"n$sfx"),
      count_distinct(col(keyCol)).as(s"d$sfx"),
      sum(when(col(catCol) === watchedCat, 1L).otherwise(0L))
        .as(s"c$sfx"),
      sum(col(valueCol).cast("decimal(18,6)")).as(s"s$sfx"))
    val row = cells(a, "a").crossJoin(cells(b, "b"))
    def d(c: Column) = c.cast("double")
    val rowRatio = round(d(col("nb")) / d(col("na")), 6)
    val keyRatio = round(d(col("db")) / d(col("da")), 6)
    val shareDelta = round(abs(d(col("cb")) / d(col("nb")) -
      d(col("ca")) / d(col("na"))), 6)
    val meanDrift = round(abs(d(col("sb")) / d(col("nb")) -
      d(col("sa")) / d(col("na"))) /
      abs(d(col("sa")) / d(col("na"))), 6)
    val rows = array(
      struct(lit("row_ratio").as("check_name"), rowRatio.as("observed"),
        lit(loRatio).as("lo"), lit(hiRatio).as("hi"),
        (rowRatio >= loRatio && rowRatio <= hiRatio).as("ok")),
      struct(lit("key_ratio").as("check_name"), keyRatio.as("observed"),
        lit(loRatio).as("lo"), lit(hiRatio).as("hi"),
        (keyRatio >= loRatio && keyRatio <= hiRatio).as("ok")),
      struct(lit("cat_share_delta").as("check_name"),
        shareDelta.as("observed"),
        lit(0d).as("lo"), lit(maxShareDelta).as("hi"),
        (shareDelta <= maxShareDelta).as("ok")),
      struct(lit("mean_drift").as("check_name"), meanDrift.as("observed"),
        lit(0d).as("lo"), lit(maxMeanDrift).as("hi"),
        (meanDrift <= maxMeanDrift).as("ok")))
    row.select(explode(rows).as("r")).select(
      col("r.check_name").as("check_name"), col("r.observed").as("observed"),
      col("r.lo").as("lo"), col("r.hi").as("hi"), col("r.ok").as("ok"))
  }

  /** DuckDB restatement over `snap_a` / `snap_b` relations with
    * (k, v, cat) columns; ends in
    * `contract_out(check_name, observed, lo, hi, ok)`. */
  def auditSql(
      watchedCat: String,
      loRatio: Double = 0.5,
      hiRatio: Double = 2.0,
      maxShareDelta: Double = 0.05,
      maxMeanDrift: Double = 0.2): String = {
    def cells(rel: String, sfx: String) =
      s"""SELECT CAST(count(*) AS BIGINT) AS n$sfx,
         |    CAST(count(DISTINCT k) AS BIGINT) AS d$sfx,
         |    CAST(sum(CASE WHEN cat = '$watchedCat' THEN 1 ELSE 0 END)
         |      AS BIGINT) AS c$sfx,
         |    sum(CAST(v AS DECIMAL(18,6))) AS s$sfx
         |  FROM $rel""".stripMargin
    val rowRatio = "round(CAST(nb AS DOUBLE) / CAST(na AS DOUBLE), 6)"
    val keyRatio = "round(CAST(db AS DOUBLE) / CAST(da AS DOUBLE), 6)"
    val shareDelta = "round(abs(CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)" +
      " - CAST(ca AS DOUBLE) / CAST(na AS DOUBLE)), 6)"
    val meanDrift =
      "round(abs(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)" +
        " - CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))" +
        " / abs(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE)), 6)"
    s"""contract_row AS (
       |  SELECT * FROM (${cells("snap_a", "a")}) a
       |  CROSS JOIN (${cells("snap_b", "b")}) b
       |), contract_out AS (
       |  SELECT 'row_ratio' AS check_name, $rowRatio AS observed,
       |    CAST($loRatio AS DOUBLE) AS lo, CAST($hiRatio AS DOUBLE)
       |      AS hi,
       |    $rowRatio >= $loRatio AND $rowRatio <= $hiRatio AS ok
       |  FROM contract_row
       |  UNION ALL SELECT 'key_ratio', $keyRatio,
       |    CAST($loRatio AS DOUBLE), CAST($hiRatio AS DOUBLE),
       |    $keyRatio >= $loRatio AND $keyRatio <= $hiRatio
       |  FROM contract_row
       |  UNION ALL SELECT 'cat_share_delta', $shareDelta,
       |    CAST(0 AS DOUBLE), CAST($maxShareDelta AS DOUBLE),
       |    $shareDelta <= $maxShareDelta
       |  FROM contract_row
       |  UNION ALL SELECT 'mean_drift', $meanDrift,
       |    CAST(0 AS DOUBLE), CAST($maxMeanDrift AS DOUBLE),
       |    $meanDrift <= $maxMeanDrift
       |  FROM contract_row
       |)""".stripMargin
  }
}
