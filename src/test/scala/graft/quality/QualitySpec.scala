package graft.quality

import org.apache.spark.sql.functions._
import graft.SparkSpec

class QualitySpec extends SparkSpec {

  describe("Checks") {
    import spark.implicits._
    lazy val df = Seq(
      (Some(1L), "a"), (Some(1L), "b"), (Some(2L), "zz"), (None, "a"))
      .toDF("k", "s")

    it("fuses scalar checks into one pass and counts correctly") {
      val out = Checks.run(df, Map(
        "k" -> Seq(Checks.NotNull, Checks.Unique),
        "s" -> Seq(Checks.AcceptedValues(Seq("a", "b")))))
        .as[(String, String, Long)].collect().toSet
      out shouldBe Set(
        ("not_null", "k", 1L),
        ("unique", "k", 1L), // value 1 occurs twice
        ("accepted_values", "s", 1L)) // "zz"
    }
    it("returns an empty frame for an empty config") {
      Checks.run(df, Map.empty).count() shouldBe 0
    }
    it("withStatus maps violations through per-check severity") {
      import spark.implicits._
      val out = Checks.withStatus(
        Checks.run(df, Map(
          "k" -> Seq(Checks.NotNull),
          "s" -> Seq(Checks.AcceptedValues(Seq("a", "b", "zz"))))),
        severity = Map(("not_null", "k") -> "warn"))
        .select("check_name", "status").as[(String, String)].collect().toMap
      out("not_null") shouldBe "warn" // 1 violation, severity warn
      out("accepted_values") shouldBe "pass" // 0 violations
    }
    it("relationships counts child rows without parents") {
      val parent = Seq(1L).toDF("pk")
      val out = Checks.run(df, Map(
        "k" -> Seq(Checks.Relationships(parent, "pk"))))
        .as[(String, String, Long)].head()
      out._3 shouldBe 1L // k=2 orphan; null k not counted
    }
  }

  describe("Freshness") {
    import spark.implicits._
    it("reports error for an empty (never-loaded) source") {
      val empty = Seq.empty[Long].toDF("ms")
      val row = Freshness.check(empty, "t", col("ms"), 1000L, 1L, 2L).head()
      row.getAs[String]("status") shouldBe Freshness.Error
    }
    it("buckets pass/warn/error by age") {
      val df = Seq(900000L).toDF("ms") // age 100s @ asOf 1_000_000
      def status(warn: Long, err: Long) =
        Freshness.check(df, "t", col("ms"), 1000000L, warn, err)
          .head().getAs[String]("status")
      status(200, 500) shouldBe Freshness.Pass
      status(50, 500) shouldBe Freshness.Warn
      status(10, 50) shouldBe Freshness.Error
    }
  }
}
