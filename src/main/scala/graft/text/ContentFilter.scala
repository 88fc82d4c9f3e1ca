package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word-blocklist content filtering — the C4 "bad words" gate
  * (Raffel et al. 2020 drop any page containing a lexicon word;
  * RefinedWeb and FineWeb keep the same shape): a document is blocked
  * if ANY of its whitespace tokens is in the lexicon.
  *
  * Two paths, chosen by lexicon size exactly like Urls.blockedBy /
  * filterBlocked (q127):
  *  - `firstBlockedWord`: literal-array intersection — a pure
  *    codegen'd scan projection, zero exchanges, for the usual
  *    few-hundred-word lexicon.
  *  - `filterByLexicon`: explode tokens → broadcast semi-join against
  *    a lexicon DataFrame, for million-entry feeds where a literal
  *    array would bloat the plan.
  *
  * The "which word" attribution is the MIN matching word (not the
  * first in document order) so the report is deterministic under any
  * token order and restatable as list_min(list_intersect(...)) by the
  * oracle.
  */
object ContentFilter {

  /** Min blocklisted token of `textCol`, NULL when the doc is clean. */
  def firstBlockedWord(textCol: Column, lexicon: Seq[String]): Column = {
    require(lexicon.nonEmpty, "empty lexicon blocks nothing")
    array_min(array_intersect(split(textCol, " "),
      lit(lexicon.toArray)))
  }

  /** Large-lexicon path: keep only documents with NO token in
    * `lexicon` (a 1-column DataFrame). The probe side explodes to
    * distinct (id, token) and semi-joins the broadcast lexicon; docs
    * are then dropped by an id anti-join whose right side is
    * blocked-docs-sized.
    */
  def filterByLexicon(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lexicon: DataFrame): DataFrame = {
    val word = lexicon.columns.head
    val hits = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("tok"))
      .join(broadcast(lexicon.select(col(word).as("tok"))), Seq("tok"),
        "left_semi")
      .select(idCol).distinct()
    docs.join(hits, Seq(idCol), "left_anti")
  }
}
