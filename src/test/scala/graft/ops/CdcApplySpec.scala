package graft.ops

import graft.SparkSpec

/** Change-feed application semantics (q151). */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("k", "seg", "bal")

  // (op, k, seq, change_id, seg, bal)
  private def apply(changes: (String, Long, Int, Long, String, Double)*) =
    CdcApply(base,
        changes.toDF("op", "k", "seq", "change_id", "seg", "bal"), "k")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap

  it("the highest-seq change wins per key; D removes; I adds; rest pass through") {
    val out = apply(
      ("U", 1L, 1, 11L, "a", 11.0),
      ("U", 1L, 2, 12L, "a", 12.0), // later seq wins
      ("D", 2L, 1, 21L, "b", 0.0),  // delete key 2
      ("I", 9L, 1, 91L, "new", 9.0), // insert
      ("D", 99L, 1, 991L, "x", 0.0)) // delete of a ghost key: no-op
    out shouldBe Map(
      1L -> ("a", 12.0), 3L -> ("c", 30.0), 9L -> ("new", 9.0))
  }

  it("a delete beats an earlier update; seq ties break on change_id") {
    val out = apply(
      ("U", 1L, 1, 11L, "a", 99.0),
      ("D", 1L, 2, 12L, "a", 0.0),  // later delete wins
      ("U", 3L, 5, 31L, "c", 1.0),
      ("U", 3L, 5, 32L, "c", 2.0)) // tied seq: higher change_id wins
    out shouldBe Map(2L -> ("b", 20.0), 3L -> ("c", 2.0))
  }

  it("a delete then a re-insert at higher seq restores the key") {
    val out = apply(
      ("D", 1L, 1, 11L, "a", 0.0),
      ("I", 1L, 2, 12L, "a2", 7.0))
    out(1L) shouldBe ("a2", 7.0)
  }

  it("an empty changelog is the identity") {
    val out = apply()
    out shouldBe Map(1L -> ("a", 10.0), 2L -> ("b", 20.0), 3L -> ("c", 30.0))
  }
}
