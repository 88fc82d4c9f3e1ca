package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema inference over string columns — the catalog pass that
  * turns a CSV/JSON landing table's VARCHARs into typed columns
  * (what `pandas.read_csv`/Spark's `inferSchema` do per file, done
  * here as a QUERYABLE census so the decision is auditable), beside
  * [[Entropy]]'s semantic classification.
  *
  * Per column: exact match counts against anchored RE2-portable
  * patterns (integer, decimal, ISO date, boolean), and the inferred
  * type by the strict promotion ladder — every non-null value must
  * match (bigint → double ← ints ARE doubles → date → boolean →
  * varchar fallback). Ratios are exact int/int divisions rounded
  * for display; the INFERENCE compares integer counts only, so no
  * float knife-edges decide a schema.
  *
  * Nulls and empty strings don't vote (absence carries no type
  * evidence) but are reported.
  *
  * 100 TB shape: one melt projection with per-row regex flags
  * (codegen'd) + one partial-aggregable groupBy; output ∝ columns.
  */
object TypeInfer {

  private val IntPat = "^[+-]?[0-9]+$"
  private val FloatPat = "^[+-]?[0-9]+\\.[0-9]+$"
  private val DatePat = "^[0-9]{4}-[0-9]{2}-[0-9]{2}$"
  private val BoolPat = "^(true|false)$"

  def infer(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val melted = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("cn"), col(c).cast("string").as("v"))): _*))
      .as("p")).select(col("p.cn").as("cn"), col("p.v").as("v"))
    val voting = col("v").isNotNull && col("v") =!= ""
    val agg = melted.groupBy("cn").agg(
      count(when(voting, 1)).as("n"),
      count(when(!voting, 1)).as("n_blank"),
      count(when(voting && col("v").rlike(IntPat), 1)).as("n_int"),
      count(when(voting && col("v").rlike(FloatPat), 1)).as("n_float"),
      count(when(voting && col("v").rlike(DatePat), 1)).as("n_date"),
      count(when(voting && lower(col("v")).rlike(BoolPat), 1)).as("n_bool"))
    val nD = col("n").cast("double")
    agg.select(col("cn").as("column"), col("n"), col("n_blank"),
      round(col("n_int").cast("double") / nD, 6).as("int_ratio"),
      round((col("n_int") + col("n_float")).cast("double") / nD, 6)
        .as("numeric_ratio"),
      round(col("n_date").cast("double") / nD, 6).as("date_ratio"),
      round(col("n_bool").cast("double") / nD, 6).as("bool_ratio"),
      when(col("n") === 0, "unknown")
        .when(col("n_int") === col("n"), "bigint")
        .when(col("n_int") + col("n_float") === col("n"), "double")
        .when(col("n_date") === col("n"), "date")
        .when(col("n_bool") === col("n"), "boolean")
        .otherwise("varchar").as("inferred"))
  }
}
