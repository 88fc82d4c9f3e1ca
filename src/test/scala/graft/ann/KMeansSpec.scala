package graft.ann

import graft.SparkSpec

/** Lloyd-step semantics (q150): assignment, tie-break, exact means. */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  it("initCentroids picks the k smallest ids in id order") {
    val df = emb((5L, Seq(5.0)), (1L, Seq(1.0)), (3L, Seq(3.0)))
    KMeans.initCentroids(df, "vec_id", "embedding", 2) shouldBe
      Seq(Seq(1.0), Seq(3.0))
  }

  it("assigns to the nearest centroid and means members exactly") {
    val df = emb(
      (0L, Seq(0.0, 0.0)), (1L, Seq(10.0, 10.0)), // the seeds
      (2L, Seq(1.0, 1.0)),   // → cluster 0
      (3L, Seq(9.0, 11.0)),  // → cluster 1
      (4L, Seq(4.0, 4.0)))   // d²=32 vs 72 → cluster 0
    val cents = KMeans.initCentroids(df, "vec_id", "embedding", 2)
    val out = KMeans.lloydStep(df, "embedding", cents)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    out((0, 0)) shouldBe ((3L, 1.666666667)) // 5/3 rounded at 9dp
    out((1, 0)) shouldBe ((2L, 9.5))
    out((1, 1)) shouldBe ((2L, 10.5))
  }

  it("equidistant vectors go to the smaller centroid id") {
    val df = emb(
      (0L, Seq(0.0)), (1L, Seq(2.0)), // seeds
      (2L, Seq(1.0))) // exactly between → cluster 0
    val cents = KMeans.initCentroids(df, "vec_id", "embedding", 2)
    val out = KMeans.lloydStep(df, "embedding", cents)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    out(0) shouldBe 2L // seed 0 + the tied vector
    out(1) shouldBe 1L
  }

  it("quantized means handle negative components (floor rounding)") {
    val df = emb((0L, Seq(-1.25)), (1L, Seq(-1.75)))
    val cents = Seq(Seq(0.0)) // one cluster: everything joins it
    val out = KMeans.lloydStep(df, "embedding", cents).head()
    out.getLong(2) shouldBe 2L
    out.getDouble(3) shouldBe -1.5
  }
}
