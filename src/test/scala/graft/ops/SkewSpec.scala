package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {

  describe("Skew.saltedAgg") {
    it("matches the plain aggregation on a skewed key distribution") {
      import spark.implicits._
      // key 0 holds 90% of rows (the hot key)
      val df = spark.range(0, 10000)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val expected = df.groupBy("k")
        .agg(sum("v").as("s"), count(lit(1)).as("n"),
          min("v").as("lo"), max("v").as("hi"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val salted = Skew.saltedAgg(df, Seq("k"), salt = 8, Seq(
        ("s", col("v"), "sum"), ("n", lit(1), "count"),
        ("lo", col("v"), "min"), ("hi", col("v"), "max")))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      salted shouldBe expected
    }
    it("rejects non-decomposable aggregates") {
      import spark.implicits._
      val df = Seq((1L, 2L)).toDF("k", "v")
      an[IllegalArgumentException] should be thrownBy
        Skew.saltedAgg(df, Seq("k"), 4, Seq(("m", col("v"), "median"))).collect()
    }
  }
}
