package graft.ann

import graft.SparkSpec

class CentroidSpec extends SparkSpec {
  import spark.implicits._

  describe("Centroid.confusion") {
    it("perfectly separates well-separated clusters") {
      val rows = (1 to 10).map(i => (i.toLong, 0,
        Array(10f + (i % 3), 0f))) ++
        (11 to 20).map(i => (i.toLong, 1, Array(-10f - (i % 3), 0f)))
      val out = Centroid.confusion(rows.toDF("vid", "label", "v"),
        "vid", "v", "label").collect()
      out.length shouldBe 2
      out.foreach { r =>
        r.getAs[Long]("label_true") shouldBe r.getAs[Long]("label_pred")
        r.getAs[Long]("n_vecs") shouldBe 10L
      }
    }
    it("ties break to the smaller label id") {
      // a point equidistant from two centroids
      val rows = Seq((1L, 0, Array(1f, 0f)), (2L, 1, Array(-1f, 0f)),
        (3L, 5, Array(0f, 5f)))
      // vec 3's own centroid is (0,5) → classified as 5; vecs 1/2
      // sit ON their centroids
      val out = Centroid.confusion(rows.toDF("vid", "label", "v"),
        "vid", "v", "label").collect()
      out.foreach { r =>
        r.getAs[Long]("label_true") shouldBe r.getAs[Long]("label_pred")
      }
    }
  }

  describe("ml.Eval.prf1Report") {
    import graft.ml.Eval
    it("reports exact cells for a known confusion") {
      // tp=2 fp=1 fn=1 tn=6
      val df = (Seq((1L, 1L), (1L, 1L), (0L, 1L), (1L, 0L)) ++
        Seq.fill(6)((0L, 0L))).toDF("label", "pred")
      val out = Eval.prf1Report(df, "label", "pred").collect()
        .map(r => r.getAs[String]("clazz") -> r).toMap
      out("class_1").getAs[Double]("precision") shouldBe 2.0 / 3 +- 1e-9
      out("class_1").getAs[Double]("recall") shouldBe 2.0 / 3 +- 1e-9
      out("micro").getAs[Double]("f1") shouldBe 0.8
      out("macro").getAs[Double]("f1") shouldBe
        ((12.0 / 14) + (4.0 / 6)) / 2 +- 1e-9
    }
    it("nulls ratios with empty denominators") {
      val df = Seq((1L, 1L)).toDF("label", "pred") // no negatives
      val r = Eval.prf1Report(df, "label", "pred").collect()
        .find(_.getAs[String]("clazz") == "class_0").get
      r.isNullAt(r.fieldIndex("precision")) shouldBe true
    }
  }
}
