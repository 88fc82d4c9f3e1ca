package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

class CidrSpec extends SparkSpec {
  import spark.implicits._

  private val rules = Seq(
    Cidr.Rule(0x0A000000L, 8, "ten-net"), // 10.0.0.0/8
    Cidr.Rule(0x0A010000L, 16, "ten-one"), // 10.1.0.0/16
    Cidr.Rule(0x0A010200L, 24, "ten-one-two")) // 10.1.2.0/24

  private def ip(a: Int, b: Int, c: Int, d: Int): Long =
    a * 16777216L + b * 65536L + c * 256L + d

  private def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
    case _ => p +: p.children.flatMap(nodes)
  }

  describe("Cidr.lpm") {
    it("picks the longest matching prefix and nulls non-matches") {
      val df = Seq(
        ip(10, 1, 2, 77), // all three match -> /24
        ip(10, 1, 9, 1), // /8 and /16 -> /16
        ip(10, 200, 0, 1), // /8 only
        ip(192, 168, 0, 1) // none
      ).toDF("ip")
      val out = Cidr.lpm(df, "ip", rules)
        .select("ip", "cidr_label", "cidr_len")
        .collect().map(r => r.getLong(0) ->
          ((Option(r.getString(1)), Option(r.get(2))))).toMap
      out(ip(10, 1, 2, 77)) shouldBe (Some("ten-one-two"), Some(24))
      out(ip(10, 1, 9, 1)) shouldBe (Some("ten-one"), Some(16))
      out(ip(10, 200, 0, 1)) shouldBe (Some("ten-net"), Some(8))
      out(ip(192, 168, 0, 1)) shouldBe (None, None)
    }
    it("matches block edges inclusively and the next block not at all") {
      val df = Seq(ip(10, 1, 2, 0), ip(10, 1, 2, 255), ip(10, 1, 3, 0))
        .toDF("ip")
      val out = Cidr.lpm(df, "ip", rules)
        .select("ip", "cidr_label").collect()
        .map(r => (r.getLong(0), r.getString(1))).toMap
      out(ip(10, 1, 2, 0)) shouldBe "ten-one-two"
      out(ip(10, 1, 2, 255)) shouldBe "ten-one-two"
      out(ip(10, 1, 3, 0)) shouldBe "ten-one"
    }
    it("rejects misaligned rules and duplicates") {
      an[IllegalArgumentException] should be thrownBy
        Cidr.Rule(ip(10, 1, 2, 3), 24, "bad") // host bits set
      an[IllegalArgumentException] should be thrownBy
        Cidr.lpm(Seq(1L).toDF("ip"), "ip",
          rules :+ Cidr.Rule(0x0A000000L, 8, "dup"))
    }
    it("classifies with zero shuffles of the probe side") {
      val df = spark.range(1000).selectExpr("id * 65536 AS ip")
      val out = Cidr.lpm(df, "ip", rules)
      out.collect()
      nodes(out.queryExecution.executedPlan)
        .count(_.isInstanceOf[ShuffleExchangeLike]) shouldBe 0
    }
  }
}
