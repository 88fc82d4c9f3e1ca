package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash-LSH banding advisor — q296 MEASURES the shipped config's
  * recall; this answers "which (bands, rows) SHOULD we ship":
  * evaluate the S-curve P(collide | J) = 1 − (1 − Jʳ)ᵇ against the
  * corpus's OWN measured pair-Jaccard distribution and report each
  * config's expected recall. Textbook curves assume a J
  * distribution; feeding the real one is what makes the choice
  * data-driven (the SURVEY §4 crossover-table discipline).
  *
  * Exactness: pair Jaccards arrive as exact int divisions; the
  * S-curve is a GENERATED multiplication chain (no pow() — repeated
  * left-associated products are IEEE-identical cross-engine, the
  * q303 fractional-power discipline); per-pair probabilities are
  * µ-quantized with floor(+0.5) before the BIGINT sum; expected
  * recall is one closing division.
  *
  * Scale shape: the pair table is computed ONCE (barriered) and each
  * config is a pure projection over it — k configs cost k scalar
  * aggregates over |pairs|, never k pair regenerations.
  */
object LshAdvisor {

  /** Left-associated x·x·…·x (n ≥ 1 times) — shared chain shape. */
  private def powChain(x: Column, n: Int): Column =
    (1 until n).foldLeft(x)((acc, _) => acc * x)

  private def powChainSql(x: String, n: Int): String =
    Seq.fill(n)(x).mkString("(", " * ", ")")

  /** P(collide | J) for a (bands, rowsPerBand) config, µ-scaled. */
  private def pCollideMu(j: Column, bands: Int, rows: Int): Column = {
    val inner = powChain(j, rows)
    val miss = powChain(lit(1.0) - inner, bands)
    floor((lit(1.0) - miss) * 1000000d + 0.5d).cast("long")
  }

  private def pCollideMuSql(j: String, bands: Int, rows: Int): String = {
    val inner = powChainSql(j, rows)
    val miss = powChainSql(s"(1.0 - $inner)", bands)
    s"CAST(floor((1.0 - $miss) * 1000000 + 0.5) AS BIGINT)"
  }

  /** Expected recall of each (bands, rowsPerBand) config over a
    * measured `pairs(jaccard)` table. Returns per config:
    * (num_hashes, bands, rows_per_band, n_pairs, expected_recall). */
  def expectedRecall(
      pairs: DataFrame,
      jaccardCol: String,
      configs: Seq[(Int, Int)]): DataFrame = {
    require(configs.nonEmpty)
    val p = graft.plans.Plans.barrier(
      pairs.select(col(jaccardCol).cast("double").as("j")))
    val aggs = configs.map { case (b, r) =>
      sum(pCollideMu(col("j"), b, r)).as(s"s_${b}_$r")
    }
    val row = p.agg(count(lit(1)).as("n_pairs"), aggs: _*)
    val out = array(configs.map { case (b, r) =>
      struct(lit((b * r).toLong).as("num_hashes"),
        lit(b.toLong).as("bands"), lit(r.toLong).as("rows_per_band"),
        col("n_pairs").as("n_pairs"),
        round(col(s"s_${b}_$r").cast("double") /
          (col("n_pairs") * 1000000L).cast("double"), 6)
          .as("expected_recall"))
    }: _*)
    row.select(explode(out).as("c")).select(
      col("c.num_hashes").as("num_hashes"), col("c.bands").as("bands"),
      col("c.rows_per_band").as("rows_per_band"),
      col("c.n_pairs").as("n_pairs"),
      col("c.expected_recall").as("expected_recall"))
  }

  /** Dedup threshold-sensitivity curve — the policy companion to
    * [[expectedRecall]]: per candidate τ, how many pairs and how
    * many DOCUMENTS a "drop at J ≥ τ" policy touches. Volume-vs-
    * aggressiveness is the curve a dedup rollout decision reads.
    *
    * Exactness/scale: the pair table is computed once at the widest
    * τ; per-doc max-J collapses it to a doc-sized table, and every
    * cutoff is a conditional sum over pairs + docs — integers end to
    * end, cutoffs exploded through literals (the q279 shape). The
    * τ comparison cross-multiplies (100·J terms stay exact because
    * J is n/d with d ≤ gram counts — compare on the unrounded
    * double, identical in both engines).
    */
  def thresholdCurve(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      jaccardCol: String,
      tausPct: Seq[Int]): DataFrame = {
    require(tausPct.nonEmpty && tausPct == tausPct.sorted)
    val p = graft.plans.Plans.barrier(pairs.select(
      col(aCol).as("a"), col(bCol).as("b"),
      col(jaccardCol).cast("double").as("j")))
    val docMax = p.select(col("a").as("d"), col("j"))
      .unionByName(p.select(col("b").as("d"), col("j")))
      .groupBy("d").agg(max(col("j")).as("mj"))
    val pairAggs = tausPct.map(t =>
      sum(when(col("j") >= t / 100d, 1L).otherwise(0L)).as(s"np_$t"))
    val docAggs = tausPct.map(t =>
      sum(when(col("mj") >= t / 100d, 1L).otherwise(0L)).as(s"nd_$t"))
    val row = p.agg(pairAggs.head, pairAggs.tail: _*)
      .crossJoin(docMax.agg(docAggs.head, docAggs.tail: _*))
    val out = array(tausPct.map { t =>
      struct(lit(t.toLong).as("tau_pct"),
        col(s"np_$t").as("n_pairs"),
        col(s"nd_$t").as("n_docs_affected"))
    }: _*)
    row.select(explode(out).as("c")).select(
      col("c.tau_pct").as("tau_pct"), col("c.n_pairs").as("n_pairs"),
      col("c.n_docs_affected").as("n_docs_affected"))
  }

  /** DuckDB restatement over `adv_pairs2(a, b, j)`; ends in
    * `curve_out(tau_pct, n_pairs, n_docs_affected)`. */
  def thresholdCurveSql(tausPct: Seq[Int]): String = {
    val selects = tausPct.map { t =>
      s"""SELECT CAST($t AS BIGINT) AS tau_pct,
         |    (SELECT CAST(sum(CASE WHEN j >= ${t / 100d} THEN 1
         |      ELSE 0 END) AS BIGINT) FROM adv_pairs2) AS n_pairs,
         |    (SELECT CAST(sum(CASE WHEN mj >= ${t / 100d} THEN 1
         |      ELSE 0 END) AS BIGINT) FROM curve_docmax)
         |      AS n_docs_affected""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""curve_docmax AS (
       |  SELECT d, max(j) AS mj FROM (
       |    SELECT a AS d, j FROM adv_pairs2
       |    UNION ALL SELECT b AS d, j FROM adv_pairs2)
       |  GROUP BY d
       |), curve_out AS (
       |  $selects
       |)""".stripMargin
  }

  /** DuckDB restatement over `adv_pairs(j)`; ends in
    * `adv_out(num_hashes, bands, rows_per_band, n_pairs,
    * expected_recall)`. */
  def expectedRecallSql(configs: Seq[(Int, Int)]): String = {
    val selects = configs.map { case (b, r) =>
      s"""SELECT CAST(${b * r} AS BIGINT) AS num_hashes,
         |    CAST($b AS BIGINT) AS bands,
         |    CAST($r AS BIGINT) AS rows_per_band,
         |    CAST(count(*) AS BIGINT) AS n_pairs,
         |    round(CAST(sum(${pCollideMuSql("j", b, r)}) AS DOUBLE)
         |      / CAST(count(*) * 1000000 AS DOUBLE), 6)
         |      AS expected_recall
         |  FROM adv_pairs""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""adv_out AS (
       |  $selects
       |)""".stripMargin
  }
}
