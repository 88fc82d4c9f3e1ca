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

  /** t-closeness (Li, Li & Venkatasubramanian 2007) for an ORDINAL
    * sensitive attribute — the refinement l-diversity misses: a
    * class can hold l distinct salaries that are all in the top
    * bracket; what leaks is the class's sensitive DISTRIBUTION
    * sitting far from the table's. Distance is the 1-D earth-mover
    * over the attribute's total order,
    *
    *   EMD(P, Q) = Σᵢ |CumPᵢ − CumQᵢ| / (m − 1)
    *
    * with m ordered categories. Exactness: each |·| term is the
    * cross-multiplied INTEGER |cum_p·N − cum_q·n_c| (no per-class
    * float CDFs — the q225 KS discipline); the class's EMD closes
    * with ONE division by n_c·N·(m−1). Violation compares that
    * engine-identical double against t.
    *
    * 100 TB shape: one (class, category) census, the per-class
    * cumulative is a window over m rows per class (m = category
    * count, small by definition of ordinal); the global distribution
    * is an m-row broadcast. Output ∝ classes. Degenerate m = 1
    * reports null (no order to move mass along).
    *
    * @param df (g, sv): class key, ordinal sensitive value (ordered
    *   by its natural sort).
    * @return (g, n, emd, t_violation).
    */
  def tCloseness(df: DataFrame, t: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = df.select(col("g"), col("sv"))
    val cats = base.select("sv").distinct()
    val cls = base.groupBy("g").agg(count(lit(1)).as("n"))
    val pc = base.groupBy("g", "sv").agg(count(lit(1)).as("c"))
    val grid = cls.crossJoin(broadcast(cats))
      .join(pc, Seq("g", "sv"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val glob = base.groupBy("sv").agg(count(lit(1)).as("cq"))
    val globc = glob
      .withColumn("cumq", sum(col("cq")).over(
        Window.orderBy("sv"))) // m rows — a bounded frame
      .select(col("sv"), col("cumq"))
    val tot = base.agg(count(lit(1)).cast("decimal(38,0)").as("nn"),
      count_distinct(col("sv")).as("m"))
    val wc = Window.partitionBy("g").orderBy("sv")
    val terms = grid
      .withColumn("cump", sum(col("c")).over(wc))
      .join(broadcast(globc), "sv")
      .crossJoin(broadcast(tot))
      .withColumn("d", abs(col("cump").cast("decimal(38,0)") * col("nn")
        - col("cumq").cast("decimal(38,0)") * col("n")))
    val emd = col("sd").cast("double") /
      (col("n").cast("decimal(38,0)") * col("nn") * (col("m") - 1))
        .cast("double")
    terms.groupBy("g", "n", "nn", "m").agg(sum(col("d")).as("sd"))
      .select(col("g"), col("n"),
        when(col("m") > 1, emd).as("emd"),
        when(col("m") > 1, emd > t).as("t_violation"))
  }
}
