package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sources.Tables
import graft.text.TextAnalysis

/** q22–q33: the LLM-training-data operators (dedup, similarity, text
  * analysis, multimodal plumbing) over `documents.parquet` and
  * `embeddings.parquet`. Registered into `SparkEntry.queries`.
  *
  * The testdata has no natural duplicates, so the dedup queries build
  * their corpus as documents ∪ deterministic injected copies (exact
  * copies for q22, one-token mutations for q23–q25, scaled vectors
  * for q26) — the oracle SQL injects the identical copies, so the
  * checks stay meaningful.
  */
object PipelineEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** documents ∪ exact copies of every 50th doc (ids offset 1e6). */
  private def exactCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    docs.unionByName(docs.filter(col("doc_id") % 50 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L))
  }

  /** documents ∪ near-copies of every 25th doc: one token prepended
    * — high Jaccard / low Hamming vs the original.
    */
  private def nearCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select("doc_id", "text")
    docs.unionByName(docs.filter(col("doc_id") % 25 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
      .withColumn("text", concat(lit("zq "), col("text"))))
  }

  /** embeddings ∪ scaled copies of every 25th vector (direction
    * preserved ⇒ cosine 1 with the original).
    */
  private def vecCorpus(s: SparkSession, dir: String): DataFrame = {
    val vecs = t(s, dir, "embeddings").select("vec_id", "embedding")
    vecs.unionByName(vecs.filter(col("vec_id") % 25 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .withColumn("embedding", transform(col("embedding"), x => x * lit(1.01f))))
  }

  private def q22(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(exactCorpus(s, dir), "doc_id", "text")
      .orderBy("keep_id")

  private def q23(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(nearCorpus(s, dir), "doc_id", "text",
        shingleK = 3, numHashes = 16, bands = 4, tau = 0.7)
      .orderBy("a", "b")

  private def q24(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(nearCorpus(s, dir), "doc_id", "text", maxHamming = 7)
      .orderBy("a", "b")

  private def q25(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccard(nearCorpus(s, dir), "doc_id", "text", n = 4, tau = 0.8)
      .orderBy("a", "b")

  private def q26(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingPairs(vecCorpus(s, dir), "vec_id", "embedding", tau = 0.95)
      .orderBy("a", "b")

  private def q27(s: SparkSession, dir: String): DataFrame = {
    val vecs = t(s, dir, "embeddings")
    Ann.bruteForceTopK(vecs, vecs.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rk")
  }

  private def q28(s: SparkSession, dir: String): DataFrame = {
    val vecs = t(s, dir, "embeddings")
    Ann.lshTopK(vecs, vecs.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, bits = 16, bands = 4)
      .orderBy("query_id", "rk")
  }

  private def q29(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("predicted", TextAnalysis.predictedLang(col("text")))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted")

  private def q30(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("n_tokens"),
        TextAnalysis.distinctTokenRatio(col("text")).as("distinct_ratio"),
        TextAnalysis.stopwordRatio(col("text")).as("stopword_ratio"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  private def q31(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.wsTokenCount(col("text")).as("ws_tokens"),
        TextAnalysis.alphaRunCount(col("text")).as("alpha_tokens"),
        TextAnalysis.digitRunCount(col("text")).as("digit_tokens"),
        TextAnalysis.punctCharCount(col("text")).as("punct_chars"),
        TextAnalysis.bpeIshCount(col("text")).as("bpe_ish_tokens"))
      .orderBy("doc_id")

  private def q32(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.rollingFingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  private def q33(s: SparkSession, dir: String): DataFrame = {
    val attached = Multimodal.attachBinary(t(s, dir, "documents"), "doc_id", "text")
    Multimodal.metaSummary(Multimodal.decodeBatches(attached))
      .orderBy("mime")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_dedup_exact" -> (q22 _),
    "q23_dedup_minhash" -> (q23 _),
    "q24_dedup_simhash" -> (q24 _),
    "q25_ngram_jaccard" -> (q25 _),
    "q26_dedup_embedding" -> (q26 _),
    "q27_ann_bruteforce" -> (q27 _),
    "q28_ann_lsh" -> (q28 _),
    "q29_lang_id" -> (q29 _),
    "q30_quality_score" -> (q30 _),
    "q31_token_count" -> (q31 _),
    "q32_fingerprint" -> (q32 _),
    "q33_multimodal_meta" -> (q33 _))

  // SQL-expressible oracles. q23–q28 and q33 are hash/LSH-dependent
  // (xxhash64 has no DuckDB counterpart) → rows-only checks.
  private def substrCountSql(padded: String, m: String): String =
    s"(length($padded) - length(replace($padded, '$m', ''))) // ${m.length}"

  private val PaddedText = "(' ' || lower(text) || ' ')"

  private val LangScoreSql: Map[String, String] =
    TextAnalysis.LangMarkers.map { case (l, ms) =>
      l -> ms.map(m => substrCountSql(PaddedText, m)).mkString("(", " + ", ")")
    }.toMap

  private val PredictedSql: String = {
    val ls = TextAnalysis.LangMarkers.map(_._1)
    val whens = ls.zipWithIndex.map { case (l, i) =>
      val conds = ls.zipWithIndex.collect {
        case (o, j) if j != i =>
          if (j < i) s"s_$l > s_$o" else s"s_$l >= s_$o"
      }
      s"WHEN ${conds.mkString(" AND ")} THEN '$l'"
    }
    s"CASE WHEN (${ls.map("s_" + _).mkString(" + ")}) = 0 THEN 'und' " +
      whens.mkString(" ") + " ELSE 'und' END"
  }

  private val WsTokSql =
    "(length(trim(text)) - length(replace(trim(text), ' ', '')) + 1)"
  private val StopHitsSql = LangScoreSql("en")
  private val DistinctRatioSql =
    "(len(list_distinct(string_split(lower(text), ' '))) * 1.0 / len(string_split(lower(text), ' ')))"

  val oracleSql: Map[String, String] = Map(
    "q22_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
        |)
        |SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM corpus GROUP BY text ORDER BY keep_id""".stripMargin,
    "q29_lang_id" ->
      s"""WITH scored AS (
         |  SELECT lang,
         |    ${TextAnalysis.LangMarkers.map { case (l, _) => s"${LangScoreSql(l)} AS s_$l" }.mkString(",\n    ")}
         |  FROM documents
         |)
         |SELECT lang, $PredictedSql AS predicted, count(*) AS n_docs
         |FROM scored GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin,
    "q30_quality_score" ->
      s"""SELECT doc_id,
         |  $WsTokSql AS n_tokens,
         |  $DistinctRatioSql AS distinct_ratio,
         |  $StopHitsSql * 1.0 / $WsTokSql AS stopword_ratio,
         |  least($WsTokSql / 100.0, 1.0) * 0.5
         |    + $DistinctRatioSql * 0.3
         |    + least(($StopHitsSql * 1.0 / $WsTokSql) * 5.0, 1.0) * 0.2 AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q31_token_count" ->
      s"""SELECT doc_id,
         |  $WsTokSql AS ws_tokens,
         |  len(regexp_extract_all(lower(text), '[a-z]+')) AS alpha_tokens,
         |  len(regexp_extract_all(text, '[0-9]+')) AS digit_tokens,
         |  len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS punct_chars,
         |  len(regexp_extract_all(lower(text), '[a-z]+'))
         |    + len(regexp_extract_all(text, '[0-9]+'))
         |    + len(regexp_extract_all(lower(text), '[^a-z0-9 ]')) AS bpe_ish_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q32_fingerprint" ->
      """SELECT doc_id,
        |  CASE WHEN length(text) = 0 THEN 0 ELSE
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(range(1, length(text) + 1),
        |          i -> CAST(ascii(substr(text, i, 1)) AS BIGINT))),
        |      (acc, c) -> (acc * 31 + c) % 1000000007)
        |  END AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin)
}
