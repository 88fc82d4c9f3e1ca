package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TransformInferLinkSpec extends SparkSpec {
  import spark.implicits._

  describe("RankTransform.cdf") {
    it("assigns mid-rank CDF positions with ties sharing one slot") {
      // values 1,2,2,3 -> cdf_mid: 1 -> (2*1-1)/8 = 0.125;
      // 2 -> (2*3-2)/8 = 0.5; 3 -> (2*4-1)/8 = 0.875
      val df = Seq(1.0, 2.0, 2.0, 3.0).toDF("x")
      val r = RankTransform.cdf(df, "x").orderBy("v").collect()
      r.map(_.getAs[Double]("cdf_mid")).toSeq shouldBe
        Seq(0.125, 0.5, 0.875)
      r.map(_.getAs[Long]("cum")).toSeq shouldBe Seq(1L, 3L, 4L)
    }

    it("is monotone and spans (0,1) exclusive") {
      val df = (1 to 100).map(_.toDouble).toDF("x")
      val cdfs = RankTransform.cdf(df, "x").orderBy("v")
        .collect().map(_.getAs[Double]("cdf_mid"))
      cdfs.head should be > 0.0
      cdfs.last should be < 1.0
      cdfs.sliding(2).foreach { case Array(a, b) => a should be < b }
    }

    it("drops nulls from the census") {
      val df = Seq(Some(1.0), None, Some(2.0)).toDF("x")
      RankTransform.cdf(df, "x").count() shouldBe 2L
    }
  }

  describe("TypeInfer.infer") {
    it("walks the promotion ladder strictly") {
      val df = Seq(
        ("1", "1.5", "2024-01-01", "true", "1"),
        ("-42", "2", "1999-12-31", "FALSE", "oops"))
        .toDF("i", "f", "d", "b", "m")
      val r = TypeInfer.infer(df, Seq("i", "f", "d", "b", "m"))
        .collect().map(x => x.getString(0) -> x).toMap
      r("i").getAs[String]("inferred") shouldBe "bigint"
      // "2" is int-like, "1.5" float-like -> ints promote to double
      r("f").getAs[String]("inferred") shouldBe "double"
      r("d").getAs[String]("inferred") shouldBe "date"
      r("b").getAs[String]("inferred") shouldBe "boolean"
      r("m").getAs[String]("inferred") shouldBe "varchar"
      r("m").getAs[Double]("int_ratio") shouldBe 0.5
    }

    it("blanks and nulls don't vote but are counted") {
      val df = Seq(Some("7"), Some(""), None).toDF("c")
      val r = TypeInfer.infer(df, Seq("c")).collect().head
      r.getAs[Long]("n") shouldBe 1L
      r.getAs[Long]("n_blank") shouldBe 2L
      r.getAs[String]("inferred") shouldBe "bigint"
    }
  }

  describe("LinkPredict.jaccardCandidates") {
    import graft.ops.LinkPredict

    it("scores non-adjacent pairs by neighborhood overlap") {
      // square a-b-c-d-a: diagonals (a,c) and (b,d) each share 2
      // neighbors, J = 2/(2+2-2) = 1.0
      val sq = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
        .toDF("src", "dst")
      val r = LinkPredict.jaccardCandidates(sq, "src", "dst")
        .orderBy("u", "v").collect()
      r.map(x => (x.getString(0), x.getString(1))).toSeq shouldBe
        Seq(("a", "c"), ("b", "d"))
      all(r.map(_.getAs[Double]("jaccard"))) shouldBe 1.0
    }

    it("never proposes an existing edge") {
      val tri = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
      LinkPredict.jaccardCandidates(tri, "src", "dst").count() shouldBe 0L
    }

    it("capped hub pivots stop contributing wedges") {
      // star: hub h connected to x1..x5; all candidate pairs flow
      // through h; capping h's degree kills them
      val star = (1 to 5).map(i => ("h", s"x$i")).toDF("src", "dst")
      LinkPredict.jaccardCandidates(star, "src", "dst")
        .count() shouldBe 10L
      LinkPredict.jaccardCandidates(star, "src", "dst",
        maxPivotDegree = 4).count() shouldBe 0L
    }
  }
}
