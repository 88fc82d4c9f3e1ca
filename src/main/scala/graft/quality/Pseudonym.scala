package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed deterministic pseudonymization — the export-time privacy
  * step between q55's pattern redaction (destroys the value) and
  * q146's purge (removes the row): replace an identifier with
  * token = hex(sha256(secret ‖ ':' ‖ value)) truncated, so the SAME
  * input under the SAME secret always maps to the SAME token. That
  * determinism is the point: joins, group-bys, and distinct counts
  * still work across every table tokenized with the secret, while
  * the raw identifier never leaves the cluster.
  *
  * Threat model (documented, not oversold): this is pseudonymization
  * for analytics exports — the secret prevents dictionary/rainbow
  * reversal of low-entropy keys. It is NOT a MAC (no length-extension
  * concern: tokens are never verifiers) and not reversible; keep the
  * secret out of the export and rotation re-keys every table
  * consistently.
  *
  * Scale notes (100 TB): the token is a codegen'd scan projection
  * (sha2 is a built-in Catalyst expression) — zero exchanges to
  * tokenize; downstream joins shuffle exactly as they would on the
  * raw key (same cardinality, fixed-width keys). Truncation to
  * `len` hex chars (default 16 = 64 bits) keeps shuffle keys small;
  * collision odds at 64 bits are ~n²/2⁶⁵ — fine for joins (a
  * collision merges two keys, detectable by the q181 join profile),
  * widen to 32 chars for billion-key exports.
  */
object Pseudonym {

  val DefaultLen = 16

  /** Token column for one value column. */
  def token(secret: String, c: Column, len: Int = DefaultLen): Column = {
    require(secret.nonEmpty, "secret must be non-empty")
    require(len >= 8 && len <= 64, s"token length must be in [8,64], got $len")
    substring(sha2(concat(lit(secret), lit(":"), c.cast("string")), 256),
      1, len)
  }

  /** Replace each named column with its token in place (schema
    * preserved, values pseudonymized) — the whole-table export shape.
    */
  def tokenize(df: DataFrame, secret: String, cols: Seq[String],
      len: Int = DefaultLen): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, token(secret, col(c), len)))
}
