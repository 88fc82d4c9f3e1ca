package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ROUGE-N overlap scoring between paired texts (Lin 2004) — the
  * summarization/generation eval every synthetic-data pipeline runs
  * between a model output and its reference (and the dedup-adjacent
  * "how much of the reference does the candidate reuse" audit).
  *
  * Clipped-count semantics: a candidate n-gram counts once per
  * occurrence, capped at its reference occurrence count —
  * n_match = Σ_g min(c_cand(g), c_ref(g)) over MULTISET counts (the
  * distinct-gram shortcut of the Jaccard family under-counts
  * repeated grams; ROUGE does not).
  *
  * Exactness: counts are integers; P = m/tc and R = m/tr reduce F1
  * to the single rational 2m/(tc+tr), so the three outputs are one
  * closing division each, rounded 9 dp.
  *
  * Scale shape: per-doc n-gram COUNT tables (groupBy doc+gram —
  * partial-aggregable), one hash join on (pair, gram), one per-pair
  * rollup. Never |cand| × |ref|; pairs meet only on shared grams.
  */
object Rouge {

  private def toks(c: Column): Column =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  private def ngrams(c: Column, n: Int): Column = {
    val t = toks(c)
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(t) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*)))
  }

  /** Score candidate rows against reference rows joined on
    * `pairCol`. Returns (pairCol, n_cand, n_ref, n_match, precision,
    * recall, f1); pairs where either side has no n-grams drop out
    * (score undefined, stated not imputed). */
  def rougeN(
      cand: DataFrame,
      ref: DataFrame,
      pairCol: String,
      textCol: String,
      n: Int = 2): DataFrame = {
    // barrier: each count table feeds BOTH the match join and its
    // totals rollup — without the cut the tokenize+count runs twice.
    // Grams join as TEXT, mirroring the oracle: an xxhash64 key would
    // save ~half the shuffle bytes on word bigrams but makes Spark
    // alone collision-tolerant — a within-pair 64-bit collision would
    // inflate n_match on one engine only, an asymmetric (if
    // astronomically rare) parity break. Word n-grams are short; the
    // symmetric join costs ~5% here and keeps both engines on
    // identical multiset semantics.
    def counts(df: DataFrame, as: String): DataFrame =
      graft.plans.Plans.barrier(
        df.select(col(pairCol).as("pair_id"),
            explode(ngrams(col(textCol), n)).as("gram"))
          .groupBy("pair_id", "gram")
          .agg(count(lit(1)).as(as)))
    val c = counts(cand, "c_cand")
    val r = counts(ref, "c_ref")
    val totals = c.groupBy("pair_id").agg(sum(col("c_cand")).as("tc"))
      .join(r.groupBy("pair_id").agg(sum(col("c_ref")).as("tr")),
        "pair_id")
    c.join(r, Seq("pair_id", "gram"))
      .groupBy("pair_id")
      .agg(sum(least(col("c_cand"), col("c_ref"))).as("n_match"))
      .join(totals, Seq("pair_id"), "right")
      .select(col("pair_id").as(pairCol),
        col("tc").as("n_cand"), col("tr").as("n_ref"),
        coalesce(col("n_match"), lit(0L)).as("n_match"),
        round(coalesce(col("n_match"), lit(0L)).cast("double") /
          col("tc").cast("double"), 9).as("precision"),
        round(coalesce(col("n_match"), lit(0L)).cast("double") /
          col("tr").cast("double"), 9).as("recall"),
        round(coalesce(col("n_match"), lit(0L)).cast("double") * 2 /
          (col("tc") + col("tr")).cast("double"), 9).as("f1"))
  }

  /** DuckDB restatement over `cand(pair_id, text)` /
    * `refr(pair_id, text)`; ends in `rouge_out(pair_id, n_cand,
    * n_ref, n_match, precision, recall, f1)`. */
  def rougeNSql(n: Int = 2): String = {
    def grams(rel: String): String =
      s"""SELECT pair_id, unnest(list_transform(range(1, len(t) - ${n - 2}),
         |      i -> ${(0 until n).map(j =>
                  if (j == 0) "t[i]" else s"t[i+$j]")
                  .mkString(" || ' ' || ")})) AS gram
         |  FROM (SELECT pair_id,
         |      list_filter(string_split_regex(lower(text), '\\s+'),
         |        x -> x <> '') AS t
         |    FROM $rel) WHERE len(t) >= $n""".stripMargin
    s"""cg AS (
       |  SELECT pair_id, gram, CAST(count(*) AS BIGINT) AS c_cand
       |  FROM (${grams("cand")}) GROUP BY pair_id, gram
       |), rg AS (
       |  SELECT pair_id, gram, CAST(count(*) AS BIGINT) AS c_ref
       |  FROM (${grams("refr")}) GROUP BY pair_id, gram
       |), tot AS (
       |  SELECT c.pair_id, c.tc, r.tr FROM
       |    (SELECT pair_id, CAST(sum(c_cand) AS BIGINT) AS tc
       |      FROM cg GROUP BY pair_id) c
       |    JOIN (SELECT pair_id, CAST(sum(c_ref) AS BIGINT) AS tr
       |      FROM rg GROUP BY pair_id) r USING (pair_id)
       |), m AS (
       |  SELECT cg.pair_id,
       |    CAST(sum(least(cg.c_cand, rg.c_ref)) AS BIGINT) AS n_match
       |  FROM cg JOIN rg USING (pair_id, gram) GROUP BY cg.pair_id
       |), rouge_out AS (
       |  SELECT t.pair_id, t.tc AS n_cand, t.tr AS n_ref,
       |    COALESCE(m.n_match, 0) AS n_match,
       |    round(CAST(COALESCE(m.n_match, 0) AS DOUBLE)
       |      / CAST(t.tc AS DOUBLE), 9) AS precision,
       |    round(CAST(COALESCE(m.n_match, 0) AS DOUBLE)
       |      / CAST(t.tr AS DOUBLE), 9) AS recall,
       |    round(CAST(COALESCE(m.n_match, 0) AS DOUBLE) * 2
       |      / CAST(t.tc + t.tr AS DOUBLE), 9) AS f1
       |  FROM tot t LEFT JOIN m USING (pair_id)
       |)""".stripMargin
  }
}
