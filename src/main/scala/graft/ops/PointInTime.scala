package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (PIT) join — enrich facts with the dimension
  * version that was valid WHEN THE FACT HAPPENED: the standard
  * SCD2-history lookup (`valid_from <= fact_ts < valid_to`), and the
  * feature-store primitive ("training features as of the label's
  * timestamp", which prevents feature leakage from the future).
  *
  * Implementation composes the repo's as-of join: for a well-formed
  * gapless history the interval predicate is equivalent to "latest
  * version with valid_from <= ts", which AsOfJoin answers with ONE
  * hash shuffle + sort and a codegen'd carry window. For histories
  * WITH gaps (rows deleted for a while, then recreated), the carried
  * valid_to is re-checked and the payload nulled when the fact falls
  * into a hole — so the operator is correct for both, at as-of cost.
  * A naive interval theta-join would be a broadcast-nested-loop at
  * scale; this never is.
  */
object PointInTime {

  val ValidFrom = "valid_from"
  val ValidTo = "valid_to"

  /** Build an SCD2-shaped history from a change stream: each change
    * row opens a version at its `tsCol`; `valid_to` = the key's next
    * change (NULL = still open). `tiebreak` columns make version
    * order total when one key changes twice at the same timestamp.
    * One window over (keys), nothing else.
    */
  def historyFromChanges(
      changes: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tiebreak: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((tsCol +: tiebreak).map(col): _*)
    changes
      .withColumn(ValidFrom, col(tsCol))
      .withColumn(ValidTo, lead(col(ValidFrom), 1).over(w))
  }

  /** Enrich `facts` with the `payload` columns of the `history`
    * version valid at `factTs` (valid_from <= ts < valid_to, open
    * interval = NULL valid_to). Facts in a history gap — or before
    * the key's first version — get NULL payload.
    */
  def join(
      facts: DataFrame,
      history: DataFrame,
      keys: Seq[String],
      factTs: String,
      payload: Seq[String]): DataFrame = {
    require(!facts.columns.contains(ValidTo),
      s"facts already has a $ValidTo column")
    // zero-width versions ([t, t) — produced by historyFromChanges
    // when a key changes twice at one timestamp) match NO fact by
    // interval semantics, but would TIE with their same-valid_from
    // successor in the as-of carry and win nondeterministically.
    // Drop them up front; among non-empty intervals a duplicated
    // valid_from implies an overlapping history, which is caller
    // error here as everywhere.
    val live = history.filter(
      col(ValidTo).isNull || col(ValidTo) > col(ValidFrom))
    val carried = AsOfJoin(facts, live, keys, factTs, ValidFrom,
      payload :+ ValidTo)
    // the carry window guarantees valid_from <= ts; a gapped history
    // can still leave ts past the carried version's end
    val gap = col(ValidTo).isNotNull && col(factTs) >= col(ValidTo)
    payload.foldLeft(carried) { (df, c) =>
      df.withColumn(c, when(gap, lit(null)).otherwise(col(c)))
    }.drop(ValidTo)
  }
}
