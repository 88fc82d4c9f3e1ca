package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Johnson–Lindenstrauss random projection (Achlioptas 2003 /
  * Dasgupta–Gupta 2003): reduce an embedding column to `outDim`
  * dimensions via a fixed Gaussian matrix, y = (1/√k)·R·v — with
  * k = O(log n / ε²) pairwise distances are preserved within 1±ε,
  * so the 100 TB ANN/dedup passes (q26-q28, q37, q77) can run over
  * a 4× smaller vector at a bounded recall cost. The planes are the
  * SAME seeded deterministic Gaussians as the LSH family
  * (`VectorOps.hyperplanes`) — every executor, every run, and the
  * oracle agree without shipping state.
  *
  * Scale shape: a pure per-row projection — k dot products against
  * driver-literal planes, ZERO exchanges before whatever consumes
  * it; the long-form output (vec_id, j, y) is `posexplode`d for the
  * gate but `projectArray` keeps the packed column for composition.
  * Cross-engine exactness: each dot is the sequential index-order
  * fold both engines replay bit-identically (cosSql's precedent),
  * then ONE multiply by the literal 1/√k — no rounding needed.
  */
object RandomProjection {

  /** Packed projection column (array<double> of length outDim). */
  def projectArray(vecs: DataFrame, idCol: String, vecCol: String,
      outDim: Int, dim: Int = 64, seed: Long = 42L): DataFrame = {
    require(outDim >= 1, s"outDim must be >= 1, got $outDim")
    val planes = VectorOps.hyperplanes(outDim, dim, seed)
    val s = 1.0 / math.sqrt(outDim.toDouble)
    vecs.select(col(idCol).as("vec_id"),
      array(planes.map(p =>
        VectorOps.dot(col(vecCol), typedlit(p)) * lit(s)): _*).as("proj"))
  }

  /** Long-form (vec_id, j, y) — the oracle-gated shape. */
  def project(vecs: DataFrame, idCol: String, vecCol: String,
      outDim: Int, dim: Int = 64, seed: Long = 42L): DataFrame =
    projectArray(vecs, idCol, vecCol, outDim, dim, seed)
      .select(col("vec_id"), posexplode(col("proj")).as(Seq("j", "y")))

  /** The SAME projection as DuckDB SQL over `embTable` — the plane
    * doubles embed as literals (Double.toString is the shortest
    * round-trip representation, so both engines hold bit-identical
    * planes), the dot is the same sequential fold.
    */
  def sql(embTable: String, idCol: String, vecCol: String,
      outDim: Int, dim: Int = 64, seed: Long = 42L): String = {
    val planes = VectorOps.hyperplanes(outDim, dim, seed)
    val s = 1.0 / math.sqrt(outDim.toDouble)
    val rows = planes.zipWithIndex.map { case (p, j) =>
      s"($j, [${p.mkString(", ")}])"
    }.mkString(",\n    ")
    s"""WITH planes(j, p) AS (VALUES
       |    $rows),
       |v AS MATERIALIZED (
       |  SELECT $idCol AS vec_id,
       |    list_transform($vecCol, x -> CAST(x AS DOUBLE)) AS dv
       |  FROM $embTable)
       |SELECT vec_id, CAST(j AS INT) AS j,
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(range(1, len(dv) + 1), i -> dv[i] * p[i])),
       |    (acc, x) -> acc + x) * $s AS y
       |FROM v CROSS JOIN planes""".stripMargin
  }
}
