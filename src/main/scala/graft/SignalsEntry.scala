package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Cidr, Geo, Sampling}
import graft.sources.Tables

/** q247+: network / spatial / lifecycle signal operators — CIDR
  * longest-prefix IP classification, integer-grid spatial radius
  * join and stencil density, and the applied-analytics tail that
  * builds on them. Same conventions as the earlier entry objects:
  * deterministic fixtures derived from the driver corpus via the
  * portable mix30 coin, oracles restating the semantics in DuckDB
  * SQL generated from the SAME Scala constants as the Spark plan.
  */
object SignalsEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------
  // q247 — CIDR longest-prefix match (ops/Cidr.lpm): classify
  // synthetic client IPs against a nested rule table (a /12 inside
  // a /8 inside a /4 — the override chain that makes LPM matter)
  // and roll up per network label. The match itself is k left
  // broadcast joins (k = distinct prefix lengths), zero shuffles
  // of the event stream.
  // ---------------------------------------------------------------

  /** Nested rule fixture. Unusual-but-valid short prefixes (/4, /8,
    * /12) so every scale factor, including the 1000-row smoke SF,
    * populates every label of the uniform 32-bit address space.
    * Shared by the Spark plan and the generated oracle CASE.
    */
  private val cidrRules = Seq(
    Cidr.Rule(0x00000000L, 4, "net-a"),
    Cidr.Rule(0x05000000L, 8, "net-a-carveout"),
    Cidr.Rule(0x05300000L, 12, "net-a-deep"),
    Cidr.Rule(0x10000000L, 4, "net-b"),
    Cidr.Rule(0x12000000L, 8, "net-b-carveout"),
    Cidr.Rule(0xF0000000L, 4, "net-f"))

  /** Synthetic u32 client address: mix30 spreads the event id over
    * 30 bits, the low 2 bits recycle the id so all four /30 hosts
    * appear. Portable into SQL via the same formula.
    */
  private def ipCol = Sampling.mix30(col("event_id")) * 4 +
    pmod(col("event_id"), lit(4L))
  private def ipSql =
    s"(${Sampling.mix30Sql("event_id")}) * 4 + event_id % 4"

  private def q247(s: SparkSession, dir: String): DataFrame = {
    val withIp = t(s, dir, "events").withColumn("ip", ipCol)
    Cidr.lpm(withIp, "ip", cidrRules)
      .groupBy(coalesce(col("cidr_label"), lit("unmatched")).as("network"))
      .agg(max(col("cidr_len")).as("pfx_len"), // constant per label
        count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy("network")
  }

  // ---------------------------------------------------------------
  // q248 — grid-bucketed spatial radius join (ops/Geo.radiusJoin):
  // events carry synthetic micro-degree coordinates inside a
  // 2-degree city box, nations are the 25 sites; "events within
  // 0.1° of each site" via the 3×3 cell-neighborhood broadcast
  // join, membership decided in exact 64-bit integers. The oracle
  // brute-forces the cross product — affordable at oracle SF,
  // which is exactly why the grid shape is the library's.
  // ---------------------------------------------------------------

  private val geoBox = 2000001L // ~2° box edge, prime-ish for spread
  private val geoLat0 = 45000000L
  private val geoLon0 = 12000000L
  private val geoR = 100000L // 0.1° radius = cell size

  private def evLat = lit(geoLat0) +
    pmod(Sampling.mix30(col("event_id")), lit(geoBox))
  private def evLon = lit(geoLon0) +
    pmod(Sampling.mix30(col("event_id") + lit(99000000L)), lit(geoBox))
  private def siteLat = lit(geoLat0) +
    pmod(Sampling.mix30(col("n_nationkey") * 7 + lit(3)), lit(geoBox))
  private def siteLon = lit(geoLon0) +
    pmod(Sampling.mix30(col("n_nationkey") * 11 + lit(5)), lit(geoBox))

  private def evLatSql =
    s"$geoLat0 + (${Sampling.mix30Sql("event_id")}) % $geoBox"
  private def evLonSql =
    s"$geoLon0 + (${Sampling.mix30Sql("(event_id + 99000000)")}) % $geoBox"
  private def siteLatSql =
    s"$geoLat0 + (${Sampling.mix30Sql("(n_nationkey * 7 + 3)")}) % $geoBox"
  private def siteLonSql =
    s"$geoLon0 + (${Sampling.mix30Sql("(n_nationkey * 11 + 5)")}) % $geoBox"

  private def q248(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "events")
      .select(col("event_id"), evLat.as("lat"), evLon.as("lon"))
    val sites = t(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("site_id"),
        siteLat.as("s_lat"), siteLon.as("s_lon"))
    Geo.radiusJoin(pts, "lat", "lon", sites, "s_lat", "s_lon", geoR)
      .groupBy("site_id")
      .agg(count(lit(1)).as("n_points"), min("dist2").as("min_d2"),
        sum("dist2").as("sum_d2"))
      .orderBy("site_id")
  }

  // ---------------------------------------------------------------
  // q249 — grid hotspot density (ops/Geo.gridDensity): per-cell
  // event counts smoothed with the 3×3 box stencil. Corpus
  // collapses to cell counts in one partial-aggregatable pass;
  // the convolution runs over cell-sized data only.
  // ---------------------------------------------------------------
  private def q249(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "events")
      .select(col("event_id"), evLat.as("lat"), evLon.as("lon"))
    Geo.gridDensity(pts, "lat", "lon", geoR)
      .orderBy("cell_y", "cell_x")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q247_cidr_match" -> (q247 _),
    "q248_geo_radius_join" -> (q248 _),
    "q249_grid_density" -> (q249 _))

  def oracleSql: Map[String, String] = Map(
    "q247_cidr_match" ->
      s"""WITH ips AS (
         |  SELECT user_id, ($ipSql) AS ip FROM events
         |), m AS (
         |  SELECT user_id,
         |    coalesce(${Cidr.lpmSql("ip", cidrRules, "label")},
         |      'unmatched') AS network,
         |    ${Cidr.lpmSql("ip", cidrRules, "len")} AS pfx_len
         |  FROM ips
         |)
         |SELECT network, max(pfx_len) AS pfx_len,
         |  count(*) AS n_events, count(DISTINCT user_id) AS n_users
         |FROM m GROUP BY network ORDER BY network""".stripMargin,
    "q248_geo_radius_join" ->
      s"""WITH pts AS (
         |  SELECT event_id, ($evLatSql) AS lat, ($evLonSql) AS lon
         |  FROM events
         |), sites AS (
         |  SELECT CAST(n_nationkey AS BIGINT) AS site_id,
         |    ($siteLatSql) AS s_lat, ($siteLonSql) AS s_lon
         |  FROM nation
         |), pairs AS (
         |  SELECT site_id,
         |    (lat - s_lat) * (lat - s_lat)
         |      + (lon - s_lon) * (lon - s_lon) AS dist2
         |  FROM pts CROSS JOIN sites
         |  WHERE (lat - s_lat) * (lat - s_lat)
         |      + (lon - s_lon) * (lon - s_lon) <= ${geoR * geoR}
         |)
         |SELECT site_id, count(*) AS n_points, min(dist2) AS min_d2,
         |  CAST(sum(dist2) AS BIGINT) AS sum_d2
         |FROM pairs GROUP BY site_id ORDER BY site_id""".stripMargin,
    "q249_grid_density" ->
      s"""WITH pts AS (
         |  SELECT ($evLatSql) AS lat, ($evLonSql) AS lon FROM events
         |), counts AS (
         |  SELECT ${Geo.cellSql("lat", geoR)} AS cell_y,
         |    ${Geo.cellSql("lon", geoR)} AS cell_x, count(*) AS n_own
         |  FROM pts GROUP BY 1, 2
         |), offs AS (
         |  SELECT dy, dx FROM (VALUES (-1), (0), (1)) a(dy)
         |  CROSS JOIN (VALUES (-1), (0), (1)) b(dx)
         |), spread AS (
         |  SELECT cell_y + dy AS cell_y, cell_x + dx AS cell_x,
         |    CAST(sum(n_own) AS BIGINT) AS density
         |  FROM counts CROSS JOIN offs GROUP BY 1, 2
         |)
         |SELECT c.cell_y, c.cell_x, c.n_own, s.density
         |FROM counts c JOIN spread s USING (cell_y, cell_x)
         |ORDER BY c.cell_y, c.cell_x""".stripMargin)
}
