package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.SegmentDedup
import graft.ops.{Packing, Sampling}
import graft.sources.Tables
import graft.text.TextAnalysis

/** q81–q84: the corpus-preparation tail of a pretraining data
  * pipeline — sub-document dedup, training-sequence packing, mixture
  * sampling, and TF-IDF keyword extraction. Every query carries an
  * exact DuckDB oracle; the cross-engine determinism comes from the
  * same conventions the earlier rounds pinned (single-space word
  * split, mix30 avalanche, round-9 doubles, rank-on-rounded-score).
  */
object CorpusEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------
  // q81 — paragraph-level exact dedup (C4/RefinedWeb boilerplate
  // removal): 12-word windows stand in for paragraphs (the synthetic
  // corpus has no "\n\n" structure; the operator takes any segment
  // expression). Global first-occurrence wins; docs are rebuilt from
  // surviving segments. Election shuffles (hash, length) keys only.
  // ---------------------------------------------------------------
  private def q81(s: SparkSession, dir: String): DataFrame =
    SegmentDedup.dedupSegments(
        t(s, dir, "documents").filter(length(trim(col("text"))) > 0),
        "doc_id", "text", words = 12)
      .orderBy("doc_id")

  // ---------------------------------------------------------------
  // q82 — GPT-style training-sequence packing: concatenate the corpus
  // in doc_id order, chop into 2048-token blocks, map every doc to
  // the sequences it occupies. The global prefix sum is the two-phase
  // bucket scan (driver sees <=256 scalars, never rows) — NOT a
  // single-reducer Window.orderBy.
  // ---------------------------------------------------------------
  private val BlockSize = 2048L

  private def q82(s: SparkSession, dir: String): DataFrame =
    Packing.sequenceManifest(
        t(s, dir, "documents")
          .filter(length(trim(col("text"))) > 0)
          .select(col("doc_id"),
            TextAnalysis.wsTokenCount(col("text")).as("tok")),
        "doc_id", "tok", BlockSize)
      .orderBy("seq_id")

  // ---------------------------------------------------------------
  // q83 — token-budget mixture sampling: target 70% web / 20% books /
  // 10% code by tokens. The binding stratum survives whole; the rest
  // down-sample by the deterministic mix30 hash threshold — a pure
  // scan-level predicate, reproduced bit-for-bit by the oracle.
  // ---------------------------------------------------------------
  private val MixWeights = Map("web" -> 0.7, "books" -> 0.2, "code" -> 0.1)
  private val WebSrcs = (0 to 5).map("src" + _)
  private val BookSrcs = (6 to 13).map("src" + _)

  private def stratumCol(src: org.apache.spark.sql.Column) =
    when(src.isin(WebSrcs: _*), "web")
      .when(src.isin(BookSrcs: _*), "books")
      .otherwise("code")

  private def q83(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(
      col("doc_id"),
      stratumCol(col("source")).as("stratum"),
      TextAnalysis.wsTokenCount(col("text")).as("tok"))
    val kept = Sampling.mixtureByTokens(d, "stratum", "doc_id",
      col("tok"), MixWeights)
    // fraction column for the gate: same driver math, |strata| scalars
    val supply = d.groupBy("stratum").agg(sum("tok").cast("long").as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fr = Sampling.mixtureFractions(supply, MixWeights).toSeq
    val frDf = s.createDataFrame(fr).toDF("stratum", "f")
    kept.groupBy("stratum")
      .agg(count(lit(1)).as("n_docs"), sum("tok").cast("long").as("n_tokens"))
      .join(broadcast(frDf), "stratum")
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        round(col("f"), 9).as("fraction"))
      .orderBy("stratum")
  }

  // ---------------------------------------------------------------
  // q84 — TF-IDF top-3 keywords per doc. Two partial-aggregatable
  // groupBys + a vocab-sized join; rank on the ROUNDED score so both
  // engines order identically.
  // ---------------------------------------------------------------
  private def q84(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextAnalysis.tfidfTopK(docs, "doc_id", "text", docs.count(), k = 3)
      .orderBy("doc_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q81_paragraph_dedup" -> (q81 _),
    "q82_sequence_packing" -> (q82 _),
    "q83_mixture_sampling" -> (q83 _),
    "q84_tfidf_keywords" -> (q84 _))

  private val WsTok =
    "(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1)"

  private val StratumSql =
    s"""CASE WHEN source IN (${WebSrcs.map("'" + _ + "'").mkString(",")}) THEN 'web'
       |     WHEN source IN (${BookSrcs.map("'" + _ + "'").mkString(",")}) THEN 'books'
       |     ELSE 'code' END""".stripMargin

  // CAST to DOUBLE: bare 0.7 is DECIMAL in DuckDB, and decimal
  // division would diverge from the Scala side's IEEE double math
  private val WeightSql =
    """CASE stratum WHEN 'web' THEN CAST(0.7 AS DOUBLE)
      |  WHEN 'books' THEN CAST(0.2 AS DOUBLE)
      |  ELSE CAST(0.1 AS DOUBLE) END""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q81_paragraph_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w
        |  FROM documents WHERE length(trim(text)) > 0
        |), segs AS (
        |  SELECT doc_id, pos,
        |    array_to_string(w[pos*12+1 : least((pos+1)*12, len(w))], ' ') AS seg
        |  FROM (SELECT doc_id, w,
        |          unnest(range(0, CAST(ceil(len(w) / 12.0) AS INT))) AS pos
        |        FROM t)
        |), win AS (
        |  SELECT doc_id, pos, seg,
        |    row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn
        |  FROM segs
        |), reb AS (
        |  SELECT doc_id, count(*) AS n_kept,
        |    string_agg(seg, ' ' ORDER BY pos) AS text_kept
        |  FROM win WHERE rn = 1 GROUP BY doc_id
        |), tot AS (
        |  SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id
        |)
        |SELECT t.doc_id, t.n_segs,
        |  CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
        |  COALESCE(r.text_kept, '') AS text_kept
        |FROM tot t LEFT JOIN reb r ON t.doc_id = r.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q82_sequence_packing" ->
      s"""WITH d AS (
         |  SELECT doc_id, CAST($WsTok AS BIGINT) AS tok
         |  FROM documents WHERE length(trim(text)) > 0
         |), c AS (
         |  SELECT doc_id, tok,
         |    CAST(COALESCE(sum(tok) OVER (ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off
         |  FROM d WHERE tok > 0
         |), s AS (
         |  SELECT doc_id, tok, off,
         |    unnest(range(off // $BlockSize, (off + tok - 1) // $BlockSize + 1)) AS seq_id
         |  FROM c
         |)
         |SELECT seq_id, count(*) AS n_docs,
         |  CAST(sum(least((seq_id + 1) * $BlockSize, off + tok)
         |           - greatest(seq_id * $BlockSize, off)) AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM s GROUP BY seq_id ORDER BY seq_id""".stripMargin,
    "q83_mixture_sampling" ->
      s"""WITH d AS (
         |  SELECT doc_id, $StratumSql AS stratum, CAST($WsTok AS BIGINT) AS tok
         |  FROM documents
         |), sup AS (
         |  SELECT stratum, CAST(sum(tok) AS BIGINT) AS t, min($WeightSql) AS w
         |  FROM d GROUP BY stratum
         |), bud AS (
         |  SELECT min(t / w) AS b FROM sup
         |), fr AS (
         |  SELECT stratum, (b.b * w) / t AS f FROM sup, bud b
         |), kept AS (
         |  SELECT d.doc_id, d.stratum, d.tok, fr.f
         |  FROM d JOIN fr USING (stratum)
         |  WHERE ${Sampling.mix30Sql("doc_id")} % 1048576
         |    < CAST(floor(f * 1048576) AS BIGINT)
         |)
         |SELECT stratum, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
         |  round(min(f), 9) AS fraction
         |FROM kept GROUP BY stratum ORDER BY stratum""".stripMargin,
    "q84_tfidf_keywords" ->
      """WITH w2 AS (
        |  SELECT doc_id, word FROM (
        |    SELECT doc_id, unnest(string_split(trim(text), ' ')) AS word
        |    FROM documents) WHERE word <> ''
        |), tf AS (
        |  SELECT doc_id, word, count(*) AS tf FROM w2 GROUP BY doc_id, word
        |), dfq AS (
        |  SELECT word, count(*) AS df FROM tf GROUP BY word
        |), nd AS (
        |  SELECT count(*) AS n FROM documents
        |), scored AS (
        |  SELECT t.doc_id, t.word, t.tf, d.df,
        |    round(t.tf * ln((n + 1.0) / (d.df + 1)), 9) AS score
        |  FROM tf t JOIN dfq d USING (word), nd
        |), r AS (
        |  SELECT doc_id, word, tf, df, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, word) AS INT) AS rank
        |  FROM scored
        |)
        |SELECT doc_id, rank, word, tf, df, score
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)
}
