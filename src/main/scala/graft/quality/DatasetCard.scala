package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset cards: one summary row per TABLE (rows, columns, null
  * cells) — the catalog-wide "what is this dataset" surface above
  * the per-column profile (q58): what a data catalog renders next
  * to each table, and the first sanity gate a new corpus drop runs.
  *
  * Each table costs exactly one partial-aggregated scan; the null
  * census folds all columns into one aggregate projection (never a
  * per-column pass). The column inventory is the SINGLE shared
  * constant both the Spark side and the generated oracle consume —
  * a schema drift fails loudly in both engines instead of silently
  * skewing the card.
  */
object DatasetCard {

  /** The warehouse inventory (driver corpus contract). */
  val TableColumns: Seq[(String, Seq[String])] = Seq(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value",
      "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  /** One card row per (name, df): (table_name, n_cols, n_rows,
    * n_null_cells). Columns come from `TableColumns` — a missing
    * column fails analysis loudly.
    */
  def cards(tables: Seq[(String, DataFrame)]): DataFrame = {
    val inv = TableColumns.toMap
    tables.map { case (name, df) =>
      val cols = inv(name)
      df.select(cols.map(col): _*)
        .agg(count(lit(1)).as("n_rows"),
          cols.map(c => count(lit(1)) - count(col(c))).reduce(_ + _)
            .as("n_null_cells"))
        .select(lit(name).as("table_name"), lit(cols.size).as("n_cols"),
          col("n_rows"), col("n_null_cells"))
    }.reduce(_ unionByName _)
  }

  /** The same cards as DuckDB SQL, generated from the SAME column
    * inventory.
    */
  def sql(tables: Seq[String]): String =
    tables.map { name =>
      val cols = TableColumns.toMap.apply(name)
      val nulls = cols.map(c => s"(count(*) - count($c))").mkString(" + ")
      s"""SELECT '$name' AS table_name, ${cols.size} AS n_cols,
         |  count(*) AS n_rows, CAST($nulls AS BIGINT) AS n_null_cells
         |FROM $name""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY table_name"
}
