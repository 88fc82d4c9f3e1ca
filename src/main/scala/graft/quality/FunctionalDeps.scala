package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Functional-dependency discovery over DECLARED candidate pairs
  * (the data-profiling primitive behind key detection and
  * normalization advice — the Metanome/HyFD family, restricted to a
  * candidate list so the cost is a fixed set of aggregates, never
  * the exponential lattice search): A → B holds iff every A value
  * maps to exactly one B value, i.e.
  *   count(DISTINCT A) == count(DISTINCT (A, B)),
  * and the violation mass is their difference (how many extra
  * (A, B) combinations exist beyond one-per-A).
  *
  * NULL contract (SQL COUNT DISTINCT semantics, identical in the
  * oracle): a row with NULL lhs is invisible to n_lhs, and a row
  * with NULL on EITHER side is invisible to n_pairs — so a lhs value
  * whose only rhs values are NULL still counts toward n_lhs and can
  * drive n_pairs below n_lhs (negative n_violations flags exactly
  * that: declare FDs over NOT NULL columns, or clean first).
  *
  * Scale shape: ALL candidates evaluate in ONE aggregation pass —
  * Spark plans the multi-count_distinct as a single scan with an
  * Expand (×2·|candidates| row multiplier, each branch a partial-
  * aggregatable distinct on its own key), then the per-candidate
  * scalars unfold to rows via one literal-array explode. No
  * per-candidate rescan, no driver-side loop.
  */
object FunctionalDeps {

  /** @param candidates (lhs, rhs) column pairs to test on `df`.
    * @return (lhs, rhs, n_lhs, n_pairs, n_violations, holds) — one
    *         row per candidate.
    */
  def check(df: DataFrame, candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate FD")
    val aggs = candidates.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(count_distinct(col(a)).as(s"__l$i"),
        count_distinct(col(a), col(b)).as(s"__p$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = candidates.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(a).as("lhs"), lit(b).as("rhs"),
        col(s"__l$i").as("n_lhs"), col(s"__p$i").as("n_pairs"))
    }
    one.select(explode(array(rows: _*)).as("c"))
      .select(col("c.lhs"), col("c.rhs"), col("c.n_lhs"), col("c.n_pairs"),
        (col("c.n_pairs") - col("c.n_lhs")).as("n_violations"),
        (col("c.n_pairs") === col("c.n_lhs")).as("holds"))
  }
}
