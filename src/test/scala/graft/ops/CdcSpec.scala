package graft.ops

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  describe("Cdc.diff") {
    def jd(d: Double): java.lang.Double = java.lang.Double.valueOf(d)
    val before = Seq[(Long, String, java.lang.Double)](
      (1L, "A", jd(10.0)), (2L, "B", jd(20.0)), (3L, "C", jd(30.0)), (4L, "D", null))
      .toDF("k", "status", "price")
    val after = Seq[(Long, String, java.lang.Double)](
      (1L, "A", jd(10.0)),  // unchanged
      (2L, "B", jd(21.0)),  // price update
      (4L, "D", null),      // unchanged (null-safe)
      (5L, "E", jd(50.0)))  // insert; 3 deleted
      .toDF("k", "status", "price")

    it("classifies inserts, updates, deletes and drops unchanged rows") {
      val out = Cdc.diff(before, after, Seq("k"), Seq("status", "price"))
        .orderBy("k")
        .select("k", "change").as[(Long, String)].collect()
      out shouldBe Array((2L, "update"), (3L, "delete"), (5L, "insert"))
    }
    it("carries before/after values on the right sides") {
      val rows = Cdc.diff(before, after, Seq("k"), Seq("status", "price"))
        .orderBy("k").collect()
      val upd = rows(0)
      upd.getAs[Double]("before_price") shouldBe 20.0
      upd.getAs[Double]("after_price") shouldBe 21.0
      val del = rows(1)
      del.getAs[Double]("before_price") shouldBe 30.0
      assert(del.isNullAt(del.fieldIndex("after_price")))
      val ins = rows(2)
      assert(ins.isNullAt(ins.fieldIndex("before_price")))
      ins.getAs[Double]("after_price") shouldBe 50.0
    }
    it("a null-valued compare column only flags when it actually changes") {
      val a2 = Seq((4L, "D", java.lang.Double.valueOf(40.0)))
        .toDF("k", "status", "price")
      val out = Cdc.diff(before.filter($"k" === 4L), a2, Seq("k"), Seq("status", "price"))
        .select("k", "change").as[(Long, String)].collect()
      out shouldBe Array((4L, "update"))
    }
    it("columnCensus attributes updates to the columns that moved") {
      val b2 = Seq((1L, "A", 1.0), (2L, "B", 2.0), (3L, "C", 3.0),
        (4L, "D", 4.0)).toDF("k", "status", "price")
      val a2 = Seq((1L, "Z", 1.0), (2L, "B", 9.0), (3L, "Z", 9.0),
        (4L, "D", 4.0)).toDF("k", "status", "price")
      val census = Cdc.columnCensus(
          Cdc.diff(b2, a2, Seq("k"), Seq("status", "price")),
          Seq("status", "price"))
        .orderBy("column_name").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getDouble(3)))
      // 3 updates: k1 status-only, k2 price-only, k3 both
      census shouldBe Array(("price", 2L, 3L, 0.666667),
        ("status", 2L, 3L, 0.666667))
    }
  }
}
