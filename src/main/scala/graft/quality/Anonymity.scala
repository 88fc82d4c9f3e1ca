package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
  * al. 2007 — the privacy gate a dataset passes BEFORE export, the
  * measuring side of what q55's redaction and q146's purge enforce):
  * group the table by its quasi-identifier columns and flag every
  * equivalence class that is
  *  - smaller than k (its members are re-identifiable by QI join), or
  *  - showing fewer than l distinct sensitive values (attribute
  *    disclosure: knowing someone is in the class reveals their
  *    sensitive attribute even without singling them out).
  *
  * Scale shape: one groupBy over the QI columns — count is partial-
  * aggregatable; the exact distinct-sensitive count expands the key
  * to (QI, sensitive) for its partial pass (Spark's two-phase
  * count_distinct), still keyed shuffles only, output ∝ classes.
  * Swap `count_distinct` for `approx_count_distinct` when l-diversity
  * over a high-cardinality sensitive column at 100 TB only needs the
  * threshold, not the exact count.
  */
object Anonymity {

  /** @return one row per VIOLATING class: QI columns + class_size +
    *         n_sensitive + the two violation flags.
    */
  def audit(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
      k: Long, l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        count_distinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("k_violation", col("class_size") < k)
      .withColumn("l_violation", col("n_sensitive") < l)
      .filter(col("k_violation") || col("l_violation"))
  }
}
