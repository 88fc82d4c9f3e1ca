package graft.quality

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class OutliersSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  describe("Outliers") {
    it("median/MAD are exact type-1 quantiles") {
      // values 1..9 plus a wild outlier that would wreck mean/stddev
      val df = ((1 to 9).map(_.toDouble) :+ 1e9).toDF("v")
      val (med, mad) = Outliers.medianMad(df, "v")
      med shouldBe 5.0 // ceil(0.5*10)=5th of sorted
      // deviations |x-5|: 0,1,1,2,2,3,3,4,4,1e9-5 → 5th = 2
      mad shouldBe 2.0
    }

    it("flags only the planted anomaly at k=3") {
      val df = ((1 to 9).map(_.toDouble) :+ 1e9).toDF("v")
      val out = Outliers.flag(df, "v")
      out.filter(col("is_outlier")).as[(Double, Boolean, Double, Double)]
        .collect().map(_._1).toSeq shouldBe Seq(1e9)
    }

    it("robustness: the outlier does not move the threshold (vs mean/std)") {
      val clean = (1 to 9).map(_.toDouble).toDF("v")
      val dirty = ((1 to 9).map(_.toDouble) :+ 1e9).toDF("v")
      val (medC, madC) = Outliers.medianMad(clean, "v")
      val (medD, madD) = Outliers.medianMad(dirty, "v")
      medC shouldBe medD
      math.abs(madC - madD) should be <= 1.0
    }
  }

  describe("FileSource orc") {
    import graft.sources.FileSource
    it("round-trips and pushes filters to the ORC scan") {
      val base = "target/scratch/orc_spec"
      (1 to 100).map(i => (i.toLong, s"lang${i % 3}", i * 10L))
        .toDF("id", "lang", "n")
        .write.mode("overwrite").orc(base)
      val back = FileSource.read(spark, "orc", base, Some("*.orc"))
      back.count() shouldBe 100L
      val q = back.filter(col("lang") === "lang1").select("id", "n")
      q.count() shouldBe 34L // 1,4,...,100
      val scan = q.queryExecution.executedPlan.toString
      scan should include("PushedFilters: [IsNotNull(lang), EqualTo(lang,lang1)]")
    }
  }
}
