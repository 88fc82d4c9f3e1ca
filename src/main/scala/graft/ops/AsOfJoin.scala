package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the latest right row with
  * right.ts ≤ left.ts within the same key (the time-series join
  * native engines ship as ASOF JOIN; the brief's canonical example of
  * an operator Spark lacks).
  *
  * Composed from built-ins per the preference order — no custom
  * strategy needed: tag and union both sides, sort each key by
  * (ts, side) with right rows first on ties, carry the right payload
  * forward with last_value(ignoreNulls) over the running window, and
  * keep the left rows. ONE hash shuffle on the key + one sort — the
  * same cost a dedicated sorted-merge as-of operator would pay, and
  * the window is whole-stage-codegen'd.
  *
  * Scale: partitions by key (salting a hot key is the caller's
  * Skew.saltedAgg-style move); state per partition is one row of
  * carried payload, so no buffering beyond the sort.
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     lookup side
    * @param keys      equi-join keys
    * @param leftTs    left's ordering column name
    * @param rightTs   right's ordering column name (same type)
    * @param rightVals right payload columns to carry (renamed as-is
    *                  onto the output; null when no right row ≤ ts)
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!rightVals.contains(leftTs), "right payload clashes with left ts")

    // the right payload travels as ONE struct so every carried field
    // comes from the SAME matched right row (independent per-column
    // carries could mix rows when right payload fields are null)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__t", col(leftTs))
      .select((keys.map(col) :+ col("__t") :+ col("__side")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(structTypeOf(right, rightVals)).as("__r"): _*)
    val r = right.withColumn("__side", lit(0))
      .withColumn("__t", col(rightTs))
      .select((keys.map(col) :+ col("__t") :+ col("__side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(c)) :+
        struct(rightVals.map(col): _*).as("__r"): _*)

    // right rows sort BEFORE left rows at equal ts ⇒ ties are matched
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        rightVals.map(c => col(s"__c.$c").as(c)): _*)
  }

  private def structTypeOf(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c).copy(name = c)))
}
