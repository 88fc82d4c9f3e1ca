package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bloom prefilter correctness: the sketch may only ADD candidates
  * (false positives, removed by the exact join) — never drop one.
  * contaminationBloom must therefore be row-identical to the exact
  * Dedup.contamination on any corpus.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def collectPairs(df: org.apache.spark.sql.DataFrame) =
    df.select("train_id", "eval_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSet

  describe("Bloom.build / mightContain") {
    it("has zero false negatives over the built key set") {
      val keys = (1L to 5000L).map(_ * 2654435761L)
      val df = keys.toDF("k")
      val sketch = Bloom.build(df, col("k"), keys.size.toLong, 1L << 20)
      val misses = df.filter(!Bloom.mightContain(sketch, col("k"))).count()
      misses shouldBe 0L
    }
    it("rules out most non-members at the sized fp rate") {
      val keys = (1L to 5000L).map(_ * 2654435761L)
      val sketch = Bloom.build(keys.toDF("k"), col("k"),
        keys.size.toLong, keys.size.toLong * 16)
      val probes = (1000001L to 1005000L).map(_ * 40503L).toDF("k")
      val hits = probes.filter(Bloom.mightContain(sketch, col("k"))).count()
      // 16 bits/key ⇒ ~0.05% fp; allow generous slack for a 5k sample
      hits should be < 50L
    }
    it("returns null for an empty key set (documented contract)") {
      val empty = Seq.empty[Long].toDF("k")
      val sketch = Bloom.build(empty, col("k"), 1L, 1L << 10)
      sketch shouldBe null
    }
  }

  describe("Bloom.contaminationBloom") {
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated text about spark catalyst planning"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"),
      (4L, "short text"),
      (5L, "another benchmark sentence that overlaps the shared eval suite heavily")
    ).toDF("doc_id", "text")
    val evalSet = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight exactly"),
      (101L, "another benchmark sentence that overlaps the shared eval suite heavily")
    ).toDF("doc_id", "text")

    it("matches the exact Dedup.contamination row-for-row") {
      val exact = collectPairs(
        Dedup.contamination(train, evalSet, "doc_id", "text", n = 4, minShared = 2))
      val bloomed = collectPairs(
        Bloom.contaminationBloom(train, evalSet, "doc_id", "text", n = 4, minShared = 2))
      exact should not be empty
      bloomed shouldBe exact
    }
    it("degrades gracefully on an empty eval set (no pairs, no crash)") {
      val emptyEval = evalSet.filter(col("doc_id") < 0)
      Bloom.contaminationBloom(train, emptyEval, "doc_id", "text",
        n = 4, minShared = 1).count() shouldBe 0L
    }
  }
}
