package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ContentFilterSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "clean words only here"),
    (2L, "this has zzbad in it"),
    (3L, "both zzbad and aabad present"),
    (4L, "aabad leads alphabetically")).toDF("id", "text")

  private val lex = Seq("zzbad", "aabad")

  describe("ContentFilter.firstBlockedWord") {
    it("returns NULL for clean docs and the MIN matching word otherwise") {
      val out = docs.select(col("id"),
          ContentFilter.firstBlockedWord(col("text"), lex).as("w"))
        .orderBy("id").as[(Long, Option[String])].collect()
      out shouldBe Array((1L, None), (2L, Some("zzbad")),
        (3L, Some("aabad")), (4L, Some("aabad")))
    }
    it("rejects an empty lexicon") {
      an[IllegalArgumentException] should be thrownBy
        ContentFilter.firstBlockedWord(col("text"), Nil)
    }
  }

  describe("ContentFilter.filterByLexicon") {
    it("agrees with the scan-predicate path") {
      val kept = ContentFilter.filterByLexicon(docs, "id", "text",
        lex.toDF("word"))
      kept.select("id").as[Long].collect().sorted shouldBe Array(1L)
      val scanKept = docs
        .filter(ContentFilter.firstBlockedWord(col("text"), lex).isNull)
        .select("id").as[Long].collect().sorted
      scanKept shouldBe Array(1L)
    }
    it("broadcasts the lexicon (no shuffle on the corpus for the probe)") {
      val plan = ContentFilter.filterByLexicon(docs, "id", "text",
        lex.toDF("word")).queryExecution.executedPlan.toString
      plan should include("BroadcastHashJoin")
    }
  }
}
