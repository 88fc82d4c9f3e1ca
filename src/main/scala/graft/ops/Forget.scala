package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten propagation: delete every row keyed by a
  * requested subject id across all tables that carry the key, with a
  * per-table audit (the compliance artifact regulators actually ask
  * for). Reference anchor: the warehouse's entity-keyed tables
  * (datanika-core's dlt/dbt models key customer-scoped facts by the
  * same id family), where a deletion request must fan out to every
  * derived table.
  *
  * Scale shape: the request set is requests-sized (thousands), the
  * tables are corpus-sized — so every purge is a BROADCAST anti-join
  * (the fact table never shuffles) and every audit is one
  * broadcast-left-join aggregate over the same scan. A 100 TB fact
  * table pays one pass per table, zero exchanges.
  */
object Forget {

  /** The purged table: rows whose `keyCol` is in `requests.k` are
    * gone. Broadcast left-anti — never shuffles `df`.
    */
  def purge(df: DataFrame, keyCol: String, requests: DataFrame): DataFrame = {
    // qualify both sides: an unqualified col("k") is ambiguous when
    // the fact table itself carries a column named k
    val req = requests.select(col("k")).distinct()
    df.join(broadcast(req), df(keyCol) === req("k"), "left_anti")
  }

  /** One audit row per (name, table, keyCol): rows before/purged/
    * after plus the checksum of surviving keys — each computed in a
    * single broadcast-left-join aggregate pass over the table.
    */
  def audit(tables: Seq[(String, DataFrame, String)],
      requests: DataFrame): DataFrame = {
    // distinct defensively: a duplicated request id would double-join
    // rows and inflate every count in the audit
    val reqD = requests.select(col("k")).distinct()
    val req = broadcast(reqD)
    tables.map { case (name, df, keyCol) =>
      df.join(req, df(keyCol) === reqD("k"), "left")
        .agg(
          count(lit(1)).as("rows_before"),
          count(reqD("k")).as("rows_purged"),
          (count(lit(1)) - count(reqD("k"))).as("rows_after"),
          coalesce(sum(when(reqD("k").isNull, col(keyCol).cast("long"))),
            lit(0L)).as("sum_remaining_keys"))
        .withColumn("table_name", lit(name))
        .select("table_name", "rows_before", "rows_purged", "rows_after",
          "sum_remaining_keys")
    }.reduce(_ unionByName _)
  }
}
