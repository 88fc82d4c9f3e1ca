package graft.quality

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class PseudonymSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  describe("Pseudonym") {
    it("is deterministic and matches the published sha256 test vector") {
      val got = Seq(42L).toDF("v")
        .select(Pseudonym.token("k", col("v")).as("t"))
        .head().getString(0)
      // sha256("k:42") — cross-checked against hashlib
      got shouldBe "c24cd9d85f770080"
    }

    it("same value same token; different secrets diverge") {
      val df = Seq(1L, 2L, 1L).toDF("v")
        .select(col("v"), Pseudonym.token("s1", col("v")).as("a"),
          Pseudonym.token("s2", col("v")).as("b"))
        .collect()
      df(0).getString(1) shouldBe df(2).getString(1)
      df(0).getString(1) should not be df(0).getString(2)
    }

    it("token join reproduces the raw-key join exactly") {
      val left = (1 to 200).map(i => (i.toLong, s"L$i")).toDF("k", "l")
      val right = (1 to 300).filter(_ % 2 == 0)
        .map(i => (i.toLong, s"R$i")).toDF("k", "r")
      val raw = left.join(right, "k").select("l", "r")
        .collect().map(r => (r.getString(0), r.getString(1))).sorted
      val tl = Pseudonym.tokenize(left, "sec", Seq("k"))
      val tr = Pseudonym.tokenize(right, "sec", Seq("k"))
      val tok = tl.join(tr, "k").select("l", "r")
        .collect().map(r => (r.getString(0), r.getString(1))).sorted
      tok shouldBe raw
    }

    it("tokenize preserves schema shape and distinct cardinality") {
      val df = (1 to 500).map(i => (i.toLong % 97, i)).toDF("k", "x")
      val t = Pseudonym.tokenize(df, "sec", Seq("k"))
      t.columns.toSeq shouldBe df.columns.toSeq
      t.select("k").distinct().count() shouldBe
        df.select("k").distinct().count()
    }

    it("rejects empty secret and out-of-range lengths") {
      an[IllegalArgumentException] should be thrownBy
        Pseudonym.token("", col("v"))
      an[IllegalArgumentException] should be thrownBy
        Pseudonym.token("s", col("v"), len = 4)
    }
  }
}
