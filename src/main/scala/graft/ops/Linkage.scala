package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: match dirty records against a
  * clean reference by edit distance, with BLOCKING so the match is a
  * bounded equi-join instead of a corpus cross-join — the classic
  * Fellegi-Sunter-style pipeline (block → compare → classify) that
  * MDM / customer-dedup workloads run.
  *
  * Blocking here is multi-pass (Hernández & Stolfo 1998): a record
  * enters the candidate set if its FIRST word or its LAST word
  * matches the reference's — a single typo can break at most one of
  * the two keys, so recall survives edge edits while each pass stays
  * an equi-join on a short token.
  *
  * 100 TB shape: two hash equi-joins on word keys (skew = a hot
  * token, handled by AQE the same as any hot join key), UNION →
  * distinct on (id, name) pairs, codegen'd `levenshtein` verify only
  * WITHIN candidates, then one groupBy(id) min(struct) election —
  * all partial-aggregatable. No similarity ever computed across
  * non-candidates.
  */
object Linkage {

  private def firstWord(c: Column): Column = element_at(split(c, " "), 1)
  private def lastWord(c: Column): Column = element_at(split(c, " "), -1)

  /** Candidate pairs via first-word ∪ last-word blocking. */
  def candidates(dirty: DataFrame, clean: DataFrame, idCol: String,
      dirtyName: String, cleanName: String): DataFrame = {
    val d = dirty.select(col(idCol).as("id"), col(dirtyName).as("dname"),
      firstWord(col(dirtyName)).as("b1"), lastWord(col(dirtyName)).as("b2"))
    val c = clean.select(col(cleanName).as("name"),
      firstWord(col(cleanName)).as("b1"), lastWord(col(cleanName)).as("b2"))
    d.join(c.drop("b2"), "b1").select("id", "dname", "name")
      .unionByName(
        d.drop("b1").join(c.drop("b1"), "b2").select("id", "dname", "name"))
      .distinct()
  }

  /** Best clean match per dirty record: smallest levenshtein ≤
    * `maxDist` (ties on the name), else match_dist = -1 / null name.
    * Output: (id, dname, matched_name, match_dist).
    */
  def bestMatch(dirty: DataFrame, clean: DataFrame, idCol: String,
      dirtyName: String, cleanName: String, maxDist: Int): DataFrame = {
    val scored = candidates(dirty, clean, idCol, dirtyName, cleanName)
      .withColumn("dist", levenshtein(col("dname"), col("name")))
      .filter(col("dist") <= maxDist)
    val best = scored.groupBy("id")
      .agg(min(struct(col("dist"), col("name"))).as("w"))
      .select(col("id"), col("w.name").as("matched_name"),
        col("w.dist").as("match_dist"))
    dirty.select(col(idCol).as("id"), col(dirtyName).as("dname"))
      .join(best, Seq("id"), "left")
      .select(col("id"), col("dname"), col("matched_name"),
        coalesce(col("match_dist"), lit(-1)).as("match_dist"))
  }
}
