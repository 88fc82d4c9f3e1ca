package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BitmapAgg

/** Joinability discovery across the warehouse — the data-discovery
  * primitive (Aurum / Auctus family): for every candidate column
  * pair, how much of one column's value set is contained in the
  * other's? High containment ⇒ a likely FK/join edge nobody
  * declared. Completes the catalog-intelligence family: q134 traces
  * declared lineage, q172 finds intra-table dependencies, q181
  * profiles a KNOWN join — this finds the joins you didn't know
  * about.
  *
  * Mechanism: each candidate column aggregates ONCE into a q190
  * bitmap state over xxhash64(value) (all of a table's candidates in
  * a single scan, map-side partials); the pair matrix then works
  * entirely on the catalog-sized state table — |A|, |B| from state
  * cardinality, |A∩B| from a container-walking AND that never
  * materializes the intersection. No table is ever rescanned per
  * pair, and no data-sized shuffle exists anywhere.
  *
  * Exactness: set identity rides the 64-bit hash, so a cross-column
  * collision could overcount |A∩B| by 1 with probability ~n²/2⁶⁴
  * (the q22 hash-key argument; at 10⁹ distinct keys per column pair
  * that is still ~5%-of-one-count territory — acceptable for
  * DISCOVERY, and the q181 profile verifies any edge before use).
  * Within-column collisions undercount |A| the same way in both
  * engines' favor — the oracle intersects RAW values, so parity
  * doubles as a collision canary at test scale.
  *
  * 100 TB shape: states build in one pass per table and persist like
  * any q190 state; re-profiling after a new load merges the new
  * partition's state instead of rescanning history.
  */
object Joinability {

  /** One bitmap state per candidate column: (col_id, bm), col_id =
    * "table.column". All candidates of a table build in ONE scan.
    */
  def states(tables: Map[String, DataFrame],
      cands: Seq[(String, String)]): DataFrame = {
    require(cands.nonEmpty, "need at least one candidate column")
    val frames = cands.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (tbl, cols) =>
        val df = tables(tbl)
        // widen to long BEFORE hashing: Spark's xxhash64 hashes
        // int32 and int64 of the same numeric value differently, so
        // an unwidened int32 FK would show zero overlap with its
        // int64 parent key
        val aggs = cols.map { case (_, c) =>
          BitmapAgg.bitmapBuild(
            when(col(c).isNotNull, xxhash64(col(c).cast("long"))))
            .as(s"bm_$c")
        }
        val row = df.agg(aggs.head, aggs.tail: _*)
        val packed = cols.map { case (_, c) =>
          struct(lit(s"$tbl.$c").as("col_id"), col(s"bm_$c").as("bm"))
        }
        row.select(explode(array(packed: _*)).as("s"))
          .select(col("s.col_id").as("col_id"), col("s.bm").as("bm"))
      }
    frames.reduce(_ unionByName _)
  }

  /** Pairwise containment over the state table: one row per
    * unordered pair with any overlap.
    *
    * @return (col_a, col_b, n_a, n_b, n_common, containment_a,
    *         containment_b) — containment_a = |A∩B| / |A|.
    */
  def report(states: DataFrame, minCommon: Long = 1L): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    val a = states.select(col("col_id").as("col_a"), col("bm").as("bma"))
    val b = states.select(col("col_id").as("col_b"), col("bm").as("bmb"))
    a.crossJoin(b).filter(col("col_a") < col("col_b"))
      .select(col("col_a"), col("col_b"),
        BitmapAgg.bitmapCardinality(col("bma")).as("n_a"),
        BitmapAgg.bitmapCardinality(col("bmb")).as("n_b"),
        BitmapAgg.bitmapAndCardinality(col("bma"), col("bmb"))
          .as("n_common"))
      .filter(col("n_common") >= minCommon)
      .withColumn("containment_a",
        round(col("n_common").cast("double") / col("n_a"), 6))
      .withColumn("containment_b",
        round(col("n_common").cast("double") / col("n_b"), 6))
  }

  /** DuckDB twin generated from the SAME candidate list: per-column
    * DISTINCT sets intersected on RAW values (no hashing — the
    * intersection of hash sets equals the intersection of value
    * sets absent collisions, so parity is also the collision canary).
    */
  def sql(cands: Seq[(String, String)], minCommon: Long = 1L): String = {
    def cteName(tc: (String, String)) = s"d_${tc._1}_${tc._2}"
    val ctes = cands.map { case tc @ (tbl, c) =>
      s"""${cteName(tc)} AS MATERIALIZED (
         |  SELECT DISTINCT $c AS v FROM $tbl WHERE $c IS NOT NULL)"""
        .stripMargin
    }
    val sorted = cands.sortBy { case (t, c) => s"$t.$c" }
    val pairs = for {
      i <- sorted.indices; j <- sorted.indices if i < j
    } yield {
      val (ta, ca) = sorted(i); val (tb, cb) = sorted(j)
      val (na, nb) = (cteName(sorted(i)), cteName(sorted(j)))
      s"""  SELECT '$ta.$ca' AS col_a, '$tb.$cb' AS col_b,
         |    (SELECT count(*) FROM $na) AS n_a,
         |    (SELECT count(*) FROM $nb) AS n_b,
         |    (SELECT count(*) FROM
         |      (SELECT v FROM $na INTERSECT SELECT v FROM $nb)) AS n_common"""
        .stripMargin
    }
    s"""WITH ${ctes.mkString(",\n")},
       |p AS (
       |${pairs.mkString("\n  UNION ALL\n")}
       |)
       |SELECT col_a, col_b, n_a, n_b, n_common,
       |  round(CAST(n_common AS DOUBLE) / n_a, 6) AS containment_a,
       |  round(CAST(n_common AS DOUBLE) / n_b, 6) AS containment_b
       |FROM p WHERE n_common >= $minCommon
       |ORDER BY col_a, col_b""".stripMargin
  }
}
