package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Golden-record survivorship — the MDM step AFTER matching: q104
  * links records and q38/q280 resolve clusters; survivorship then
  * builds ONE canonical record per cluster with field-level rules
  * (each field elects its own winner — the standard
  * most-complete/most-recent/longest policies), because no single
  * member row is best on every field.
  *
  * Rules here (deterministic total orders, stated):
  *   name  — longest, ties to the lexicographically LARGER (the
  *           fuller spelling tends to sort after its truncation)
  *   value — maximum (most-recent-balance proxy)
  *   phone — smallest non-null (a stable canonical pick)
  *
  * Exactness: every election is a min/max over a struct whose
  * comparison IS the rule — no floats, no row_number races; nulls
  * lose by construction.
  *
  * Scale shape: ONE partial-aggregable groupBy(cluster) carrying
  * three struct aggregates — no per-field windows, no self-joins;
  * the cluster assignment joins in upstream (q38's shape).
  */
object GoldenRecord {

  /** Survivorship over `(clusterCol, nameCol, valueCol, phoneCol)`.
    * Returns per cluster: n_members, golden_name, golden_value,
    * golden_phone. */
  def survive(
      df: DataFrame,
      clusterCol: String,
      nameCol: String,
      valueCol: String,
      phoneCol: String): DataFrame =
    df.groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_members"),
        max(struct(length(col(nameCol)).as("l"),
          col(nameCol).as("v"))).getField("v").as("golden_name"),
        max(col(valueCol)).as("golden_value"),
        min(col(phoneCol)).as("golden_phone")) // min skips nulls

  /** DuckDB restatement over `gr(cluster_id, name, value, phone)`;
    * ends in `gr_out(cluster_id, n_members, golden_name,
    * golden_value, golden_phone)`. */
  def surviveSql: String =
    """gr_out AS (
      |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
      |    struct_extract(max(struct_pack(l := length(name),
      |      v := name)), 'v') AS golden_name,
      |    max(value) AS golden_value,
      |    min(phone) AS golden_phone
      |  FROM gr GROUP BY cluster_id
      |)""".stripMargin
}
