package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

class GeoSpec extends SparkSpec {
  import spark.implicits._

  describe("Geo.radiusJoin") {
    it("keeps exactly the pairs within r, including cross-cell ones") {
      // site at origin of a cell; points: inside same cell, inside
      // radius but in the NEIGHBOR cell (the case a naive same-cell
      // join would drop), at the exact radius, just outside
      val sites = Seq((1L, 1000L, 1000L)).toDF("site_id", "s_lat", "s_lon")
      val pts = Seq(
        (10L, 1010L, 1010L), // same cell, d2 = 200
        (11L, 960L, 1000L), // neighbor cell (lat 960 < 1000), d2 = 1600
        (12L, 1000L, 1050L), // exact radius: d2 = 2500 = r^2
        (13L, 1051L, 1000L), // d2 = 2601 > r^2
        (14L, 5000L, 5000L) // far away
      ).toDF("id", "lat", "lon")
      val out = Geo.radiusJoin(pts, "lat", "lon",
          sites, "s_lat", "s_lon", 50L)
        .select("id", "dist2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      out shouldBe Map(10L -> 200L, 11L -> 1600L, 12L -> 2500L)
    }
    it("handles negative coordinates (floor cells, not truncation)") {
      val sites = Seq((1L, -10L, -10L)).toDF("site_id", "s_lat", "s_lon")
      val pts = Seq((1L, 10L, 10L), (2L, -60L, -10L))
        .toDF("id", "lat", "lon")
      val out = Geo.radiusJoin(pts, "lat", "lon",
        sites, "s_lat", "s_lon", 50L)
      out.select("id").as[Long].collect().sorted shouldBe Seq(1L, 2L)
    }
    it("never shuffles the point side (broadcast site exchange only)") {
      def nodes(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => nodes(a.executedPlan)
        case _ => p +: p.children.flatMap(nodes)
      }
      val pts = spark.range(1000)
        .selectExpr("id", "id % 97 AS lat", "id % 89 AS lon")
      val sites = Seq((1L, 50L, 50L)).toDF("site_id", "s_lat", "s_lon")
      val out = Geo.radiusJoin(pts, "lat", "lon",
        sites, "s_lat", "s_lon", 25L)
      out.collect()
      nodes(out.queryExecution.executedPlan)
        .count(_.isInstanceOf[ShuffleExchangeLike]) shouldBe 0
    }
  }

  describe("Geo.gridDensity") {
    it("box-smooths counts over the 3x3 neighborhood") {
      // cells (0,0): 2 pts, (0,1): 1 pt, (5,5): 1 pt (isolated)
      val pts = Seq((1L, 10L, 10L), (2L, 20L, 20L), (3L, 10L, 110L),
        (4L, 510L, 510L)).toDF("id", "lat", "lon")
      val out = Geo.gridDensity(pts, "lat", "lon", 100L)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3)))).toMap
      out((0L, 0L)) shouldBe (2L, 3L) // own 2 + neighbor 1
      out((0L, 1L)) shouldBe (1L, 3L)
      out((5L, 5L)) shouldBe (1L, 1L)
      out.keySet shouldBe Set((0L, 0L), (0L, 1L), (5L, 5L)) // no halo rows
    }
  }
}
