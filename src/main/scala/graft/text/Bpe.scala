package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed byte-pair-encoding vocabulary training (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units" — the tokenizer-building step of every LLM data pipeline;
  * reference anchor: the token-counting config the warehouse models
  * expose, datanika-core dbt_project.py's token metrics).
  *
  * Scale shape: the 100 TB corpus is touched EXACTLY ONCE — a single
  * map-side-combined (word, count) aggregation. Every merge
  * iteration then runs on the aggregated word table, whose size is
  * the corpus VOCABULARY (Zipf-bounded, millions of rows at any
  * corpus scale, never corpus-sized). Per iteration: one
  * partial-aggregated pair count → a 1-row argmax collect (a bounded
  * driver scalar, the same pattern as PageRank's node count) → a
  * codegen'd string replace over the word table. Lineage is cut by
  * re-persisting the word table each round (predecessor unpersisted),
  * so N merges never build an N-deep replay chain.
  *
  * Exactness: symbol sequences are strings with TWO-space
  * separators, padded two spaces each end ("  c  a  t  "). A merge
  * of (a,b) is the literal replace " a  b " → " ab " — because each
  * boundary keeps one space outside the match, adjacent occurrences
  * stay matchable and `replace`'s left-to-right non-overlapping scan
  * IS BPE's greedy merge order, identically in Spark and DuckDB.
  * Ties on pair count break (count DESC, lhs, rhs) — total order,
  * cross-engine deterministic. Words are lowercased and restricted
  * to ^[a-z]+$ so the separator/marker alphabet never collides.
  */
object Bpe {

  final case class Merge(iter: Int, lhs: String, rhs: String, cnt: Long)

  /** (word, cnt) table from a document corpus: the one corpus-sized
    * pass. Single-space split — the driver corpus is single-space
    * tokenized (q31/q42's proven chain).
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Initial symbol string: every char followed by two spaces, two
    * leading spaces — "cat" → "  c  a  t  ".
    */
  def symbolize(word: Column): Column =
    concat(lit("  "), regexp_replace(word, "(.)", "$1  "))

  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"),
        expr("filter(split(sym, '  '), x -> x != '')").as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), expr(
        "explode(transform(sequence(0, size(syms) - 2), " +
          "i -> struct(syms[i] AS lhs, syms[i + 1] AS rhs)))").as("p"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum("cnt").as("c"))

  /** Learn `nMerges` merges. Returns the merge table (iter, lhs,
    * rhs, cnt) — nMerges driver-side rows by construction.
    *
    * Each round costs ONE job (the pair-count argmax); the replace
    * chain stays lazy on top of the persisted base and is re-folded
    * into the next round's scan (replaces are codegen'd projections —
    * replaying k of them is cheaper than materializing each round).
    * Every `checkpointInterval` rounds the chain is cut with a
    * persist + count barrier (PageRank's pattern), so a
    * production-sized merge count (30k) never builds an unbounded
    * plan while short runs stay barrier-free.
    */
  def train(spark: SparkSession, words: DataFrame, nMerges: Int,
      checkpointInterval: Int = 16): Seq[Merge] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    require(checkpointInterval >= 1,
      s"checkpointInterval must be >= 1, got $checkpointInterval")
    var cur = words.select(col("cnt"), symbolize(col("word")).as("sym"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var lastPersisted = cur
    val out = Seq.newBuilder[Merge]
    var stop = false
    for (k <- 1 to nMerges if !stop) {
      val top = pairCounts(cur)
        .orderBy(col("c").desc, col("lhs"), col("rhs"))
        .limit(1).collect()
      if (top.isEmpty) stop = true // corpus exhausted (all words fused)
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        out += Merge(k, l, r, c)
        cur = cur.withColumn("sym",
          replace(col("sym"), lit(s" $l  $r "), lit(s" $l$r ")))
        if (k % checkpointInterval == 0 && k < nMerges) {
          cur = cur.persist(StorageLevel.MEMORY_AND_DISK)
          cur.count() // materialize before dropping the predecessor
          lastPersisted.unpersist()
          lastPersisted = cur
        }
      }
    }
    lastPersisted.unpersist()
    out.result()
  }

  /** The fully-merged symbol string of `word` under a learned merge
    * list, as a pure Column: the chained replaces fold into ONE
    * codegen'd projection (merges are driver scalars — no join, no
    * shuffle; the corpus-at-inference path). */
  def encodedSym(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(symbolize(word)) { (c, m) =>
      replace(c, lit(s" ${m.lhs}  ${m.rhs} "), lit(s" ${m.lhs}${m.rhs} "))
    }

  /** Encode a word table with a learned merge list; returns
    * (cnt, sym) with sym fully merged. */
  def applyMerges(words: DataFrame, merges: Seq[Merge]): DataFrame =
    words.select(col("cnt"), encodedSym(col("word"), merges).as("sym"))

  /** Token census after encoding: (token, n) weighted by word
    * frequency — the learned vocabulary's usage distribution.
    */
  def tokenCensus(encoded: DataFrame): DataFrame =
    encoded
      .select(col("cnt"),
        explode(expr("filter(split(sym, '  '), x -> x != '')")).as("token"))
      .groupBy("token").agg(sum("cnt").as("n"))

  // ----------------------------------------------------------------
  // Generated DuckDB oracle — the SAME loop emits the SQL, so the
  // oracle cannot drift from the Spark semantics (PageRank.sql's
  // pattern).
  // ----------------------------------------------------------------

  /** SQL for the word-count CTE over `docsTable`.`textCol`. */
  def wordCountsSql(docsTable: String, textCol: String): String =
    s"""SELECT word, count(*) AS cnt FROM (
       |  SELECT unnest(string_split(lower($textCol), ' ')) AS word
       |  FROM $docsTable)
       |WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY word""".stripMargin

  private def pairCountsSql(wTable: String): String =
    s"""SELECT syms[i] AS lhs, syms[i + 1] AS rhs,
       |    CAST(SUM(cnt) AS BIGINT) AS c
       |  FROM (SELECT cnt,
       |          list_filter(string_split(sym, '  '), x -> x != '') AS syms
       |        FROM $wTable) t,
       |    UNNEST(generate_series(1, len(syms) - 1)) AS g(i)
       |  GROUP BY 1, 2""".stripMargin

  /** Oracle for `train`: CTE chain w0 → (pc_k, b_k, w_k)* → merges.
    * Every stage CTE is AS MATERIALIZED: w_{k-1} is referenced by
    * both pc_k and w_k, so INLINING would re-evaluate the whole
    * prefix 2^k times — materialization keeps the oracle linear in
    * nMerges, mirroring the Spark side's per-round persist.
    */
  def trainSql(wordsCte: String, nMerges: Int): String = {
    require(nMerges >= 1, // 0 rounds would generate an empty UNION body
      s"trainSql needs nMerges >= 1, got $nMerges")
    val base =
      s"""WITH dw AS MATERIALIZED ($wordsCte),
         |w0 AS MATERIALIZED (SELECT cnt,
         |  '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS sym
         |  FROM dw)""".stripMargin
    val iters = (1 to nMerges).map { k =>
      s"""pc$k AS MATERIALIZED (
         |${pairCountsSql(s"w${k - 1}")}),
         |b$k AS MATERIALIZED (SELECT lhs, rhs, c FROM pc$k
         |  ORDER BY c DESC, lhs, rhs LIMIT 1),
         |w$k AS MATERIALIZED (SELECT cnt,
         |  CASE WHEN (SELECT count(*) FROM b$k) = 0 THEN sym
         |    -- corpus exhausted: mirror train()'s early stop instead of
         |    -- NULL-poisoning every sym via replace(sym, NULL, NULL)
         |    ELSE replace(sym,
         |      ' ' || (SELECT lhs FROM b$k) || '  ' || (SELECT rhs FROM b$k) || ' ',
         |      ' ' || (SELECT lhs FROM b$k) || (SELECT rhs FROM b$k) || ' ')
         |  END AS sym
         |  FROM w${k - 1})""".stripMargin
    }
    val finals = (1 to nMerges)
      .map(k => s"SELECT $k AS iter, lhs, rhs, c AS cnt FROM b$k")
      .mkString("\nUNION ALL\n")
    ((base +: iters).mkString(",\n")) +
      s"\nSELECT * FROM (\n$finals\n) ORDER BY iter"
  }

  /** The training chain's CTE prefix (everything before the final
    * merge-table SELECT) — the reusable piece every encode-side
    * oracle extends. */
  private def trainChain(wordsCte: String, nMerges: Int): String = {
    val train = trainSql(wordsCte, nMerges)
    train.substring(0, train.indexOf("\nSELECT * FROM ("))
  }

  /** Oracle for encode-then-census over the same learned merges:
    * extends the training chain with the final token count.
    */
  def censusSql(wordsCte: String, nMerges: Int, topK: Int): String =
    s"""${trainChain(wordsCte, nMerges)}
       |SELECT token, CAST(SUM(cnt) AS BIGINT) AS n FROM (
       |  SELECT cnt, unnest(list_filter(string_split(sym, '  '),
       |    x -> x != '')) AS token
       |  FROM w$nMerges)
       |GROUP BY token ORDER BY n DESC, token LIMIT $topK""".stripMargin

  /** Oracle for [[encodedSym]]-based per-language fertility (q336):
    * the training chain runs on the corpus-global word table exactly
    * as `train` does; the per-(lang, word) table then walks the SAME
    * merge scalars (lw0 → lwN mirror the engine's folded replaces,
    * with trainSql's corpus-exhausted CASE guard), and the closing
    * rollup is exact-integer sums with two 6dp-rounded divisions.
    */
  def fertilitySql(docsTable: String, textCol: String,
      nMerges: Int): String = {
    val lwIters = (1 to nMerges).map { k =>
      s"""lw$k AS MATERIALIZED (SELECT lang, cnt, chars,
         |  CASE WHEN (SELECT count(*) FROM b$k) = 0 THEN sym
         |    ELSE replace(sym,
         |      ' ' || (SELECT lhs FROM b$k) || '  ' || (SELECT rhs FROM b$k) || ' ',
         |      ' ' || (SELECT lhs FROM b$k) || (SELECT rhs FROM b$k) || ' ')
         |  END AS sym
         |  FROM lw${k - 1})""".stripMargin
    }.mkString(",\n")
    s"""${trainChain(wordCountsSql(docsTable, textCol), nMerges)},
       |lw AS MATERIALIZED (
       |  SELECT lang, word, count(*) AS cnt FROM (
       |    SELECT lang, unnest(string_split(lower($textCol), ' ')) AS word
       |    FROM $docsTable)
       |  WHERE regexp_matches(word, '^[a-z]+$$') GROUP BY 1, 2),
       |lw0 AS MATERIALIZED (SELECT lang, cnt,
       |  CAST(length(word) AS BIGINT) AS chars,
       |  '  ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS sym
       |  FROM lw),
       |$lwIters
       |SELECT lang, n_words, n_tokens, n_chars,
       |  round(CAST(n_tokens AS DOUBLE) / CAST(n_words AS DOUBLE), 6)
       |    AS fertility,
       |  round(CAST(n_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
       |    AS chars_per_token
       |FROM (
       |  SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_words,
       |    CAST(sum(cnt * toks) AS BIGINT) AS n_tokens,
       |    CAST(sum(cnt * chars) AS BIGINT) AS n_chars
       |  FROM (SELECT lang, cnt, chars,
       |      CAST(len(list_filter(string_split(sym, '  '),
       |        x -> x != '')) AS BIGINT) AS toks
       |    FROM lw$nMerges)
       |  GROUP BY lang)
       |ORDER BY lang""".stripMargin
  }
}
