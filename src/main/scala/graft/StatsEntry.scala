package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** q225+: the round-8 statistics/time-series/graph tail —
  * nonparametric two-sample tests (KS, Mann–Whitney) next to q189's
  * Welch readout; autocorrelation and weekday seasonality next to
  * q176's OLS trend; fixed-point EWMA smoothing; k-core graph
  * peeling next to q131's PageRank; readability scoring; column
  * entropy profiling. Same conventions as the earlier entry objects:
  * deterministic fixtures from the driver corpus, oracles restating
  * the semantics in portable SQL (or generated from the SAME
  * constants as the Spark plan).
  */
object StatsEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------
  // q225 — two-sample Kolmogorov–Smirnov per event type
  // (quality/RankTests.ksTest): arms split by user_id parity, the
  // q189 experiment fixture re-read through the distribution-shape
  // lens. Integer cross-multiplied ECDF gaps; one value-count
  // groupBy + two tiny keyed windows.
  // ---------------------------------------------------------------
  private def q225(s: SparkSession, dir: String): DataFrame =
    graft.quality.RankTests.ksTest(t(s, dir, "events"), "event_type",
        pmod(col("user_id"), lit(2)) === 1, "value")
      .withColumnRenamed("stratum", "event_type")
      .orderBy("event_type")

  // ---------------------------------------------------------------
  // q226 — Mann–Whitney U per event type (RankTests.mannWhitney):
  // the rank-sum "does one arm dominate?" readout with mid-rank tie
  // handling and the tie-corrected normal z. Doubled ranks stay
  // integer until the closing fixed double chain.
  // ---------------------------------------------------------------
  private def q226(s: SparkSession, dir: String): DataFrame =
    graft.quality.RankTests.mannWhitney(t(s, dir, "events"),
        "event_type", pmod(col("user_id"), lit(2)) === 1, "value")
      .withColumnRenamed("stratum", "event_type")
      .orderBy("event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q225_ks_test" -> (q225 _),
    "q226_mann_whitney" -> (q226 _))

  // shared CTE: per-(event_type, value) arm counts + cumulative arm
  // counts — the oracle restates RankTests.cumulativeCounts with a
  // plain per-stratum window (the two-level bucket prefix is a scale
  // shape, not a semantic: same cumulative counts)
  private val CumCte =
    """base AS (
      |  SELECT event_type AS g, value AS v,
      |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS isb
      |  FROM events
      |), pv AS (
      |  SELECT g, v, CAST(sum(1 - isb) AS BIGINT) AS ca,
      |    CAST(sum(isb) AS BIGINT) AS cb
      |  FROM base GROUP BY g, v
      |), cum AS (
      |  SELECT g, v, ca, cb,
      |    CAST(sum(ca) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cuma,
      |    CAST(sum(cb) OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS cumb
      |  FROM pv
      |), cnt AS (
      |  SELECT g, CAST(sum(ca) AS BIGINT) AS n_a,
      |    CAST(sum(cb) AS BIGINT) AS n_b
      |  FROM pv GROUP BY g
      |)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q225_ks_test" ->
      s"""WITH $CumCte, d AS (
         |  SELECT c.g, abs(cuma * n_b - cumb * n_a) AS num, v, n_a, n_b
         |  FROM cum c JOIN cnt USING (g)
         |), top AS (
         |  SELECT g, num, v, n_a, n_b,
         |    row_number() OVER (PARTITION BY g
         |      ORDER BY num DESC, v DESC) AS rn
         |  FROM d
         |)
         |SELECT g AS event_type, n_a, n_b,
         |  round(CAST(num AS DOUBLE)
         |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 12) AS d_stat,
         |  v AS at_value
         |FROM top WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q226_mann_whitney" ->
      s"""WITH $CumCte, agg AS (
         |  SELECT c.g, n_a, n_b,
         |    CAST(sum(ca * (2 * (cuma + cumb) - (ca + cb) + 1))
         |      AS BIGINT) AS r2a,
         |    CAST(sum((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb))
         |      AS BIGINT) AS tsum
         |  FROM cum c JOIN cnt USING (g)
         |  GROUP BY c.g, n_a, n_b
         |), closing AS (
         |  SELECT g, n_a, n_b,
         |    CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb,
         |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nd,
         |    (CAST(r2a AS DOUBLE) - CAST(n_a AS DOUBLE)
         |      * (CAST(n_a AS DOUBLE) + 1.0)) / 2.0 AS ua,
         |    CAST(tsum AS DOUBLE) AS td
         |  FROM agg
         |), v AS (
         |  SELECT g, n_a, n_b, ua,
         |    na * nb / 12.0 * ((nd + 1.0) - td / (nd * (nd - 1.0)))
         |      AS varu,
         |    (ua - na * nb / 2.0) AS ctr
         |  FROM closing
         |)
         |SELECT g AS event_type, n_a, n_b, round(ua, 6) AS u_a,
         |  CASE WHEN varu > 0 THEN round(ctr / sqrt(varu), 6) END AS z,
         |  CASE WHEN varu > 0 THEN abs(ctr / sqrt(varu)) > 1.96 END
         |    AS significant
         |FROM v ORDER BY event_type""".stripMargin)
}
