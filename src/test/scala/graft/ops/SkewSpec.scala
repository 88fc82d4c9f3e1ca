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

  describe("Skew.saltedJoin") {
    import spark.implicits._

    it("matches the plain join exactly on a hot-key distribution") {
      val fact = spark.range(0, 5000)
        .select(when(col("id") % 3 === 0, lit(0L)).otherwise(col("id")).as("k"),
          col("id").as("v"))
      val dim = fact.select("k").distinct()
        .withColumn("attr", col("k") % 11)
      val expected = fact.join(dim, "k")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      val got = Skew.saltedJoin(fact, dim, "k", r = 8)
        .select("k", "v", "attr")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      got shouldBe expected
    }

    it("joins on (key, salt) — the salt reaches the join keys") {
      val fact = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
      val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "attr")
      val out = Skew.saltedJoin(fact, dim, "k", r = 4)
      out.collect()
      val joins = out.queryExecution.executedPlan.toString()
      joins should include("__salt")
    }

    it("unmatched fact keys drop (inner), and the salt column is gone") {
      val fact = Seq((1L, 10L), (9L, 90L)).toDF("k", "v")
      val dim = Seq((1L, "a")).toDF("k", "attr")
      val out = Skew.saltedJoin(fact, dim, "k", r = 3)
      out.columns should not contain "__salt"
      out.collect().map(_.getLong(0)).toSeq shouldBe Seq(1L)
    }
  }
}
