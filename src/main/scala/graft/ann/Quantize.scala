package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (int8) quantization of embedding vectors — the index-size
  * lever for retrieval at scale: a float32 corpus is 4·dim bytes per
  * row; symmetric int8 is dim bytes + one float scale (4.0× smaller,
  * and SIMD-friendly integer dot products downstream). PQ
  * (`ann.Pq`) compresses harder (m bytes/row) but needs trained
  * codebooks; scalar quantization is training-free, per-vector, and
  * the standard first rung (FAISS ScalarQuantizer, HNSWlib SQ8).
  *
  * Per-vector symmetric scheme: scale = max|x| / 127, q_i =
  * floor(x_i/scale + 0.5) ∈ [-127, 127]. Everything is a pure
  * projection over the array column — zero exchanges, composes with
  * any scan — and uses only engine-portable arithmetic (floor, not
  * round: identical HALF-tie behavior everywhere), so results are
  * exactly reproducible off-Spark.
  *
  * Max dequantization error is scale/2 per component by construction;
  * `dequantError` exposes the realized max for contract checks.
  */
object Quantize {

  private def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** scale for a vector (0.0 for an all-zero vector — its code is all
    * zeros and dequantization is exact).
    */
  def scaleOf(vec: Column): Column = maxAbs(vec) / lit(127.0)

  /** int8 codes: array<int> in [-127, 127] (kept as int for portable
    * arithmetic; a writer can cast to tinyint at the sink).
    */
  def int8(vec: Column): Column = {
    val s = scaleOf(vec)
    transform(vec, x =>
      when(s === 0.0, lit(0))
        .otherwise(floor(x.cast("double") / s + 0.5)).cast("int"))
  }

  /** Reconstruct doubles from codes + scale. */
  def dequant(codes: Column, scale: Column): Column =
    transform(codes, q => q.cast("double") * scale)

  /** Realized max |dequant − original| over the vector. */
  def dequantError(vec: Column): Column = {
    val s = scaleOf(vec)
    array_max(zip_with(vec, int8(vec),
      (x, q) => abs(q.cast("double") * s - x.cast("double"))))
  }

  /** Quantize a corpus: adds `codes` (int8 as int), `scale`. */
  def corpus(vecs: DataFrame, vecCol: String): DataFrame =
    vecs.withColumn("codes", int8(col(vecCol)))
      .withColumn("scale", scaleOf(col(vecCol)))
}
