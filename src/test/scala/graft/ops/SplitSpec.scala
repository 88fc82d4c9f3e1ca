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

    it("composed with Dedup.clusters, NEAR-dups never straddle splits") {
      import graft.dedup.Dedup
      // base docs + a near-copy of each (one token prepended) with an
      // id chosen to land in a different naive id-hash bucket
      val base = (0L until 20L)
        .map(i => (i, s"shared prefix tokens for doc number $i body"))
      val near = base.map { case (i, t) => (1000L + i, s"zq $t") }
      val docs = (base ++ near).toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 4, tau = 0.8)
      val cl = Dedup.clusters(pairs)
      val assigned = Split.byRepresentative(
        docs.join(cl, Seq("doc_id"), "left")
          .withColumn("rep", coalesce($"cluster_id", $"doc_id")),
        "rep")
      val straddling = pairs
        .join(assigned.select($"doc_id".as("a"), $"split".as("sa")), "a")
        .join(assigned.select($"doc_id".as("b"), $"split".as("sb")), "b")
        .filter($"sa" =!= $"sb").count()
      straddling shouldBe 0L
      // and the near-pairs were actually detected (the gate is real)
      pairs.count() should be >= 20L
    }
  }
}
