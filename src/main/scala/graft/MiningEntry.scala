package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** q183+: the round-8 session-6 tail — span-level exact-substring
  * excision, decimal-exact time-decay scoring, categorical drift
  * tests, content word-blocklist filtering, and the remaining
  * mining/cleaning operators. Same conventions as the earlier entry
  * objects: deterministic fixtures built from the driver corpus,
  * oracles either generated from the SAME constants as the Spark
  * plan or restating the semantics in portable SQL.
  */
object MiningEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------
  // q183 — exact-substring span excision (dedup/ExactSubstr): every
  // duplicated k-token window loses all occurrences but the global
  // (min doc, min pos) canonical one. One gram groupBy (partial-agg),
  // bounded coverage explode, one per-doc reassembly — no corpus
  // sort, no driver state. The oracle restates the window/row_number
  // form of the same contract.
  // ---------------------------------------------------------------
  private val ExciseK = 5

  private def q183(s: SparkSession, dir: String): DataFrame =
    graft.dedup.ExactSubstr
      .excise(t(s, dir, "documents"), "doc_id", "text", ExciseK)
      .orderBy("doc_id")

  // ---------------------------------------------------------------
  // q184 — recency-weighted engagement score (ops/DecayScore):
  // staircase half-life decay with an integer exponent so the weight
  // is an exact DECIMAL(20,18) and the weighted sum is decimal-exact
  // (order-independent). One broadcast anchor + one keyed groupBy.
  // ---------------------------------------------------------------
  private def q184(s: SparkSession, dir: String): DataFrame =
    graft.ops.DecayScore.score(t(s, dir, "events"), "user_id",
        to_date(timestamp_micros(expr("ts div 1000"))), "value",
        halfLifeDays = 2, maxHalvings = 18)
      .select(col("key").as("user_id"), col("n_events"),
        round(col("raw_sum"), 6).as("raw_sum"),
        round(col("decayed"), 9).as("decayed"))
      .orderBy("user_id")

  // ---------------------------------------------------------------
  // q185 — categorical drift: Pearson chi-square homogeneity test
  // (quality/Drift.chiSquare — PSI's discrete sibling) between the
  // first and second half of the event stream, split at the integer
  // epoch-ns midpoint. Contributions are single-op IEEE chains on
  // integer counts, µ-quantized before the total.
  // ---------------------------------------------------------------
  private def q185(s: SparkSession, dir: String): DataFrame = {
    import graft.quality.Drift
    val ev = t(s, dir, "events").select(col("event_type"), col("ts"))
    val bounds = ev.agg(min("ts").as("lo"), max("ts").as("hi"))
    val tagged = ev.crossJoin(broadcast(bounds))
      .withColumn("mid", expr("lo + (hi - lo) div 2"))
    Drift.chiSquare(
        tagged.filter(col("ts") < col("mid")),
        tagged.filter(col("ts") >= col("mid")),
        "event_type")
      .orderBy("category")
  }

  // ---------------------------------------------------------------
  // q186 — C4-style word-blocklist content filter
  // (text/ContentFilter): per (source, min-matching-word) census.
  // The lexicon is a literal array → the match is a codegen'd scan
  // projection; the only exchange is the final small groupBy.
  // ---------------------------------------------------------------
  private val Lexicon = Seq("big", "slow", "vector")

  private def q186(s: SparkSession, dir: String): DataFrame = {
    import graft.text.ContentFilter
    t(s, dir, "documents")
      .select(col("source"),
        coalesce(ContentFilter.firstBlockedWord(col("text"), Lexicon),
          lit("<clean>")).as("blocked_word"))
      .groupBy("source", "blocked_word")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "blocked_word")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q183_substring_excise" -> (q183 _),
    "q184_decay_score" -> (q184 _),
    "q185_chisq_drift" -> (q185 _),
    "q186_word_blocklist" -> (q186 _))

  val oracleSql: Map[String, String] = Map(
    "q183_substring_excise" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
         |), grams AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         |    array_to_string(ts[i:i+${ExciseK - 1}], ' ') AS gram
         |  FROM toks, UNNEST(generate_series(1, len(ts) - ${ExciseK - 1}))
         |    AS g(i)
         |), marked AS (
         |  SELECT doc_id, pos,
         |    row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn,
         |    count(*) OVER (PARTITION BY gram) AS cnt
         |  FROM grams
         |), covered AS (
         |  SELECT DISTINCT doc_id, pos + o AS p
         |  FROM marked, UNNEST(generate_series(0, ${ExciseK - 1})) AS gg(o)
         |  WHERE cnt >= 2 AND rn > 1
         |), tok AS (
         |  SELECT doc_id, CAST(i AS BIGINT) AS p, ts[i] AS token
         |  FROM toks, UNNEST(generate_series(1, len(ts))) AS g(i)
         |), kept AS (
         |  SELECT t.doc_id, count(*) AS n_kept,
         |    string_agg(t.token, ' ' ORDER BY t.p) AS cleaned
         |  FROM tok t ANTI JOIN covered c
         |    ON t.doc_id = c.doc_id AND t.p = c.p
         |  GROUP BY t.doc_id
         |)
         |SELECT toks.doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
         |  CAST(len(ts) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
         |  COALESCE(cleaned, '') AS cleaned
         |FROM toks LEFT JOIN kept ON toks.doc_id = kept.doc_id
         |ORDER BY toks.doc_id""".stripMargin,
    "q184_decay_score" ->
      """WITH e AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(value AS DECIMAL(12,6)) AS v
        |  FROM events
        |), m AS (
        |  SELECT max(day) AS mx FROM e
        |), w AS (
        |  SELECT user_id, v,
        |    CAST(floor(date_diff('day', day, mx) / 2) AS INT) AS halvings
        |  FROM e, m
        |)
        |SELECT user_id, count(*) AS n_events,
        |  round(CAST(sum(v) AS DOUBLE), 6) AS raw_sum,
        |  round(CAST(sum(v * CAST(power(2, -halvings) AS DECIMAL(20,18)))
        |    AS DOUBLE), 9) AS decayed
        |FROM w WHERE halvings <= 18
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q185_chisq_drift" ->
      """WITH e AS (
        |  SELECT event_type, epoch_ns(ts) AS ts FROM events
        |), b AS (
        |  SELECT min(ts) AS lo, max(ts) AS hi FROM e
        |), s AS (
        |  SELECT event_type, e.ts, lo + (hi - lo) // 2 AS mid FROM e, b
        |), base AS (
        |  SELECT event_type, count(*) AS n_base FROM s
        |  WHERE ts < mid GROUP BY 1
        |), cur AS (
        |  SELECT event_type, count(*) AS n_cur FROM s
        |  WHERE ts >= mid GROUP BY 1
        |), j AS (
        |  SELECT COALESCE(base.event_type, cur.event_type) AS category,
        |    COALESCE(n_base, 0) AS n_base, COALESCE(n_cur, 0) AS n_cur
        |  FROM base FULL OUTER JOIN cur ON base.event_type = cur.event_type
        |), c AS (
        |  SELECT category, n_base, n_cur,
        |    CAST(n_base AS DOUBLE) * (SELECT sum(n_cur) FROM j) /
        |      (SELECT sum(n_base) FROM j) AS expected
        |  FROM j
        |), d AS (
        |  SELECT *, CASE WHEN expected > 0
        |    THEN round((n_cur - expected) * (n_cur - expected) / expected, 9)
        |    ELSE 0.0 END AS contrib
        |  FROM c
        |)
        |SELECT category, n_base, n_cur, round(expected, 9) AS expected,
        |  contrib,
        |  CAST(sum(CAST(contrib AS DECIMAL(28,9))) OVER () AS DOUBLE)
        |    AS chi2_total
        |FROM d ORDER BY category""".stripMargin,
    "q186_word_blocklist" ->
      """WITH d AS (
        |  SELECT source,
        |    COALESCE(list_min(list_intersect(string_split(text, ' '),
        |      ['big', 'slow', 'vector'])), '<clean>') AS blocked_word
        |  FROM documents
        |)
        |SELECT source, blocked_word, count(*) AS n_docs
        |FROM d GROUP BY 1, 2 ORDER BY source, blocked_word""".stripMargin)
}
