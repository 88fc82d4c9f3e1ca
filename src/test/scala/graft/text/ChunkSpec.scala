package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Document chunking: window/stride arithmetic, short-doc identity,
  * tail handling, overlap content, and the zero-shuffle plan.
  */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def doc(n: Int) =
    Seq((1L, (1 to n).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")

  it("a doc at or under the window is exactly one chunk (itself)") {
    val out = TextAnalysis.chunk(doc(5), "doc_id", "text", window = 8, step = 4)
      .collect()
    out.length shouldBe 1
    out.head.getAs[String]("chunk_text") shouldBe "t1 t2 t3 t4 t5"
    out.head.getAs[Long]("chunk_tokens") shouldBe 5
  }

  it("strides with overlap and keeps a short tail, never an empty chunk") {
    // 11 tokens, window 4, step 3 -> 1 + ceil(7/3) = 4 chunks at
    // offsets 0,3,6,9; the last is a genuine 2-token tail
    val out = TextAnalysis.chunk(doc(11), "doc_id", "text", window = 4, step = 3)
      .orderBy("chunk_id").collect()
    out.map(_.getAs[String]("chunk_text")).toSeq shouldBe Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10", "t10 t11")
    out.map(_.getAs[Long]("chunk_tokens")).toSeq shouldBe Seq(4, 4, 4, 2)
  }

  it("every token lands in ceil coverage; adjacent chunks overlap by window-step") {
    val out = TextAnalysis.chunk(doc(100), "doc_id", "text", window = 16, step = 12)
      .orderBy("chunk_id").collect()
    // 1 + ceil((100-16)/12) = 8 chunks
    out.length shouldBe 8
    out.sliding(2).foreach { case Array(a, b) =>
      val at = a.getAs[String]("chunk_text").split(" ")
      val bt = b.getAs[String]("chunk_text").split(" ")
      at.takeRight(4).toSeq shouldBe bt.take(4).toSeq // 16-12 = 4 overlap
    }
  }

  it("rejects invalid window/step") {
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.chunk(doc(5), "doc_id", "text", 0, 1)
    an[IllegalArgumentException] should be thrownBy
      TextAnalysis.chunk(doc(5), "doc_id", "text", 4, 5)
  }

  it("plans with zero exchanges (pure scan-level explode)") {
    val plan = TextAnalysis.chunk(doc(10), "doc_id", "text", 4, 3)
      .queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).size shouldBe 0
  }
}
