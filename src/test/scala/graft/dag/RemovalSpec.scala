package graft.dag

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.Snapshot

/** Model/snapshot removal lifecycle: dependency guard, artifact
  * drop, existed-flag contract, and post-removal DAG health.
  */
class RemovalSpec extends SparkSpec {
  import spark.implicits._

  private def models = Seq(
    Dag.Model("base", Nil, _ => Seq((1, "a"), (2, "b")).toDF("id", "v")),
    Dag.Model("left", Seq("base"),
      m => m("base").filter(col("id") === 1), Dag.Table),
    Dag.Model("right", Seq("base"),
      m => m("base").filter(col("id") === 2), Dag.Table))

  describe("Dag.removeModel") {
    it("refuses to remove a model with downstream dependents") {
      val wh = java.nio.file.Files.createTempDirectory("wh").toString
      Dag.runMaterialized(spark, models, wh)
      val e = the[IllegalArgumentException] thrownBy
        Dag.removeModel(spark, models, "base", wh)
      e.getMessage should include("left")
      e.getMessage should include("right")
    }

    it("drops the artifact, deregisters, and the rest still runs") {
      val wh = java.nio.file.Files.createTempDirectory("wh").toString
      Dag.runMaterialized(spark, models, wh)
      new java.io.File(s"$wh/right").exists() shouldBe true
      val remaining = Dag.removeModel(spark, models, "right", wh)
      new java.io.File(s"$wh/right").exists() shouldBe false
      remaining.map(_.name) shouldBe Seq("base", "left")
      Dag.select(remaining, "base+") shouldBe Set("base", "left")
      Dag.runMaterialized(spark, remaining, wh)("left").count() shouldBe 1
    }

    it("rejects an unknown model name") {
      an[IllegalArgumentException] should be thrownBy
        Dag.removeModel(spark, models, "nope", "/tmp")
    }
  }

  describe("Snapshot.remove") {
    it("returns true when history existed, false on a second remove") {
      val path = java.nio.file.Files.createTempDirectory("snap").toString + "/h"
      Snapshot.timestamp(None,
          Seq((1L, "x", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
            .toDF("id", "v", "updated_at"),
          Seq("id"), "updated_at")
        .write.mode("overwrite").parquet(path)
      Snapshot.remove(spark, path) shouldBe true
      Snapshot.remove(spark, path) shouldBe false
    }
  }
}
