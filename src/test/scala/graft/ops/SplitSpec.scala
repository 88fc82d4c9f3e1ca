package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SplitSpec extends SparkSpec {
  import spark.implicits._

  describe("Split.byCluster") {
    it("keeps exact duplicates in the same split, wherever their ids land") {
      // ids chosen so a naive id-hash split WOULD separate the copies
      val docs = Seq(
        (3L, "the quick brown fox"),
        (19L, "the quick brown fox"),   // 19 % 10 = 9 → naive test split
        (8L, "lorem ipsum dolor"),
        (28L, "lorem ipsum dolor"),
        (9L, "unique doc")).toDF("doc_id", "text")
      val out = Split.byCluster(docs, "doc_id", "text")
      val byText = out.groupBy("text")
        .agg(countDistinct($"split").as("n"), min($"split").as("s"))
        .as[(String, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
      byText.values.map(_._1).toSet shouldBe Set(1L)
      // cluster rep = min id: 3 → bucket 3 → train; 9 → test
      byText("the quick brown fox")._2 shouldBe "train"
      byText("unique doc")._2 shouldBe "test"
    }
    it("assignment is a deterministic function of the representative") {
      val docs = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      val splits = Split.byCluster(docs, "doc_id", "text")
        .groupBy("split").count().as[(String, Long)].collect().toMap
      splits shouldBe Map("train" -> 80L, "val" -> 10L, "test" -> 10L)
    }
    it("rejects degenerate bucket bounds") {
      val docs = Seq((1L, "a")).toDF("doc_id", "text")
      an[IllegalArgumentException] should be thrownBy
        Split.byCluster(docs, "doc_id", "text", nBuckets = 10, trainHi = 9, valHi = 9)
    }
  }

  describe("Split.byRepresentative") {
    it("is a pure projection on a resolved cluster id (no window)") {
      val docs = Seq((1L, 7L), (2L, 7L), (3L, 12L)).toDF("doc_id", "rep")
      val out = Split.byRepresentative(docs, "rep")
      out.filter($"rep" === 7L).select("split").distinct().count() shouldBe 1
      // zero exchanges: the plan must stay shuffle-free
      val plan = out.queryExecution.executedPlan.toString
      plan should not include "Exchange"
    }
  }
}
