package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.ops.Sampling

class UnicodeSamplingSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  describe("UnicodeExprs") {
    val nfd = "café naïve" // combining marks, 12 chars
    val nfc = "caf\u00e9 na\u00efve" // precomposed, 10 chars

    it("NFC-composes decomposed input and is identity on NFC/ASCII") {
      val out = Seq(nfd, nfc, "plain ascii").toDF("s")
        .select(UnicodeFns.nfcNormalize(col("s"))).as[String].collect()
      out(0) shouldBe nfc
      out(1) shouldBe nfc
      out(2) shouldBe "plain ascii"
    }

    it("foldAccents strips combining marks from either form") {
      val out = Seq(nfd, nfc).toDF("s")
        .select(UnicodeFns.foldAccents(col("s"))).as[String].collect()
      out.toSeq shouldBe Seq("cafe naive", "cafe naive")
    }

    it("codegen and interpreted paths agree") {
      val df = Seq(nfd, nfc, "x", "").toDF("s")
      val viaExpr = df.select(UnicodeFns.nfcNormalize(col("s"))).as[String]
        .collect().toSeq
      val expected = df.as[String].collect().toSeq
        .map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
      viaExpr shouldBe expected
    }

    it("propagates null") {
      Seq(Some("a"), None).toDF("s")
        .select(UnicodeFns.nfcNormalize(col("s"))).collect()
        .map(r => Option(r.get(0))).toSeq shouldBe Seq(Some("a"), None)
    }
  }

  describe("Sampling.weightedSampleKey") {
    it("is deterministic and in (0, 1]") {
      val df = spark.range(1000).select(col("id"),
        (pmod(col("id"), lit(50)) + 1).as("w"))
      val keys = df.select(Sampling.weightedSampleKey(col("id"), col("w"))
        .as("k")).as[Double].collect()
      all(keys) should be > 0.0
      all(keys) should be <= 1.0
      val again = df.select(Sampling.weightedSampleKey(col("id"), col("w"))
        .as("k")).as[Double].collect()
      again.toSeq shouldBe keys.toSeq
    }

    it("samples heavy rows more often (A-ES bias check)") {
      // two strata: weight 100 vs weight 1, equal counts; the top-k
      // by score should be dominated by the heavy stratum
      val df = spark.range(2000).select(col("id"),
        when(col("id") < 1000, lit(100L)).otherwise(lit(1L)).as("w"))
      val top = df.withColumn("k",
          Sampling.weightedSampleKey(col("id"), col("w")))
        .orderBy(col("k").desc).limit(200)
        .filter(col("w") === 100L).count()
      top.toDouble should be > 150.0
    }
  }
}
