package graft.quality

import graft.SparkSpec

/** Anonymity.audit contract: k flags small classes, l flags
  * sensitive-homogeneous classes, compliant classes stay out of the
  * report, and both flags can fire on one class.
  */
class AnonymitySpec extends SparkSpec {
  import spark.implicits._

  // (zip, age_band, diagnosis)
  private val rows = Seq(
    // class A: 3 members, 2 diagnoses → k-violation only (k=3 ok? no: size 3 >= 3)
    ("94001", "30s", "flu"), ("94001", "30s", "cold"), ("94001", "30s", "flu"),
    // class B: 2 members, 1 diagnosis → k AND l violation at k=3, l=2
    ("94002", "40s", "flu"), ("94002", "40s", "flu"),
    // class C: 4 members, 1 diagnosis → l violation only
    ("94003", "50s", "cold"), ("94003", "50s", "cold"),
    ("94003", "50s", "cold"), ("94003", "50s", "cold"),
    // class D: 3 members, 3 diagnoses → compliant, absent
    ("94004", "60s", "flu"), ("94004", "60s", "cold"), ("94004", "60s", "covid")
  ).toDF("zip", "age_band", "diagnosis")

  private def audit(k: Long, l: Long) =
    Anonymity.audit(rows, Seq("zip", "age_band"), "diagnosis", k, l)
      .select("zip", "class_size", "n_sensitive", "k_violation", "l_violation")
      .as[(String, Long, Long, Boolean, Boolean)].collect().sortBy(_._1).toSeq

  describe("Anonymity.audit") {
    it("flags k, l, and combined violations; compliant classes absent") {
      audit(k = 3, l = 2) shouldBe Seq(
        ("94002", 2L, 1L, true, true),
        ("94003", 4L, 1L, false, true))
    }
    it("raising k pulls borderline classes into the report") {
      audit(k = 4, l = 1).map(r => (r._1, r._4)) shouldBe Seq(
        ("94001", true), ("94002", true), ("94004", true))
    }
    it("k=1, l=1 reports nothing (every nonempty class complies)") {
      audit(k = 1, l = 1) shouldBe empty
    }
  }
}
