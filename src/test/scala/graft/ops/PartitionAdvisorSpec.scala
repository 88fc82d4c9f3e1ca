package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class PartitionAdvisorSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private val df = (1 to 1000).map { i =>
    (i % 20,                       // balanced 20-way key
      i % 6,                       // too few (balanced: share 1/6 < cap)
      if (i % 2 == 0) 0 else i,    // half the rows on one value
      if (i % 100 == 0) Some(i) else None, // 99% null
      i)                           // unique per row
  }.toDF("balanced", "few", "hot", "holey", "uid")

  private def verdicts(minParts: Int = 8, maxParts: Int = 500) =
    PartitionAdvisor.advise(df,
        Seq("balanced" -> col("balanced"), "few" -> col("few"),
          "hot" -> col("hot"), "holey" -> col("holey"),
          "uid" -> col("uid")),
        minParts = minParts, maxParts = maxParts)
      .collect().map(r => r.getString(0) -> r.getString(6)).toMap

  describe("PartitionAdvisor.advise") {
    it("issues every verdict with the documented priority") {
      val v = verdicts()
      v("balanced") shouldBe "ok"
      v("few") shouldBe "too_few_partitions"
      v("hot") shouldBe "skewed"
      v("holey") shouldBe "null_heavy"
      v("uid") shouldBe "too_many_partitions"
    }

    it("reports exact stats for the balanced candidate") {
      val r = PartitionAdvisor.advise(df, Seq("balanced" -> col("balanced")))
        .collect().head
      r.getLong(1) shouldBe 1000
      r.getLong(2) shouldBe 20
      r.getLong(3) shouldBe 50
      r.getDouble(4) shouldBe 0.05
      r.getDouble(5) shouldBe 0.0
    }

    it("null share outranks skew (the hole hides the hot key)") {
      // 60% null, and the remaining rows all share one value
      val d2 = (1 to 100).map(i =>
        (if (i <= 60) None else Some(7), i)).toDF("c", "x")
      val r = PartitionAdvisor.advise(d2, Seq("c" -> col("c")))
        .collect().head
      r.getString(6) shouldBe "null_heavy"
    }
  }
}
