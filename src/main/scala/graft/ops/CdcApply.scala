package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Apply a change feed (insert/update/delete) to a base table —
  * the consuming half of the CDC family: `Cdc.diff` (q85/q122)
  * PRODUCES a changelog, this MERGES one in, with deletes — the op
  * plain upsert (q05 merge) cannot express. Reference anchor: dbt
  * incremental merge strategies, datanika-core dbt_project.py
  * (merge/delete+insert), extended with the delete tombstones a
  * Debezium/Delta-CDF feed carries.
  *
  * Semantics: per key, the change with the highest `seq` wins
  * (ties: the higher-op-id change — a TOTAL order is required and
  * enforced by callers passing a unique (seq, change_id) pair);
  * a winning D removes the key, a winning I/U replaces the base
  * row's payload. Keys untouched by the feed pass through.
  *
  * Scale shape: the changelog collapses FIRST (one changes-sized
  * window — never a corpus shuffle), then the base merges via ONE
  * full-outer hash join on the key. At 100 TB the base never sorts
  * and never windows; output ∝ base ∪ inserts.
  */
object CdcApply {

  /** @param base    current table, unique on `key`
    * @param changes (op ∈ 'I'|'U'|'D', key, seq, change_id, payload…)
    *                — payload columns must match `base`'s non-key
    *                columns by name.
    * @return the next table version, same schema as `base`.
    */
  def apply(base: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    val w = Window.partitionBy(key)
      .orderBy(col("seq").desc, col("change_id").desc)
    val latest = changes
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select((col(key) +: col("op") +: payload.map(col)): _*)
    base.join(latest, Seq(key), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col(key) +: payload.map(c =>
        when(col("op").isNotNull, latest(c)).otherwise(base(c)).as(c)): _*)
  }
}
