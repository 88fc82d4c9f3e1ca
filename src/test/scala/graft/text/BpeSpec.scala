package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.Bpe.Merge

/** BPE training semantics (q143/q144): merge election, greedy
  * left-to-right replace, tie-breaking, early stop, encode+census.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def words(ws: (String, Long)*) = ws.toDF("word", "cnt")

  describe("symbolize") {
    it("emits two-space-separated chars padded two spaces each end") {
      val r = words(("cat", 1L))
        .select(Bpe.symbolize(col("word"))).head().getString(0)
      r shouldBe "  c  a  t  "
    }
  }

  describe("train") {
    it("elects pairs by weighted count and merges greedily") {
      // ab×3, abc×2: pairs a-b:5, b-c:2 → merge1 (a,b,5);
      // then ab-c:2 → merge2 (ab,c,2); then nothing pairable → stop.
      val m = Bpe.train(spark, words(("ab", 3L), ("abc", 2L)), nMerges = 5)
      m shouldBe Seq(Merge(1, "a", "b", 5L), Merge(2, "ab", "c", 2L))
    }

    it("breaks count ties lexicographically on (lhs, rhs)") {
      // ba and ab both once: b-a:1 vs a-b:1 → (a,b) wins.
      val m = Bpe.train(spark, words(("ba", 1L), ("ab", 1L)), nMerges = 1)
      m shouldBe Seq(Merge(1, "a", "b", 1L))
    }

    it("merges non-overlapping occurrences left-to-right (aaa case)") {
      // 'aaa': pair a-a has multiplicity 2; after merging (a,a) the
      // word must be [aa, a] (greedy, not [a, aa], never [aa, aa]).
      val m1 = Bpe.train(spark, words(("aaa", 1L)), nMerges = 1)
      m1 shouldBe Seq(Merge(1, "a", "a", 2L))
      val enc = Bpe.tokenCensus(Bpe.applyMerges(words(("aaa", 1L)), m1))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      enc shouldBe Map("aa" -> 1L, "a" -> 1L)
    }

    it("a merged symbol participates in later merges") {
      // 'abab'×2: a-b:4 (vs b-a:2) → (a,b); then ab-ab:2 → (ab,ab).
      val m = Bpe.train(spark, words(("abab", 2L)), nMerges = 2)
      m shouldBe Seq(Merge(1, "a", "b", 4L), Merge(2, "ab", "ab", 2L))
    }
  }

  describe("applyMerges + tokenCensus") {
    it("encodes with the learned vocabulary and weights by word count") {
      val w = words(("ab", 3L), ("abc", 2L), ("d", 7L))
      val m = Bpe.train(spark, w, nMerges = 2)
      val census = Bpe.tokenCensus(Bpe.applyMerges(w, m))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      census shouldBe Map("ab" -> 3L, "abc" -> 2L, "d" -> 7L)
    }

    it("applyMerges with no merges yields plain characters") {
      val census = Bpe.tokenCensus(Bpe.applyMerges(words(("cat", 2L)), Nil))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      census shouldBe Map("c" -> 2L, "a" -> 2L, "t" -> 2L)
    }
  }

  describe("wordCounts") {
    it("lowercases, splits on single space, and drops non-[a-z]+ tokens") {
      val docs = Seq("The cat the CAT", "dog 42 the").toDF("text")
      val wc = Bpe.wordCounts(docs, "text")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      wc shouldBe Map("the" -> 3L, "cat" -> 2L, "dog" -> 1L)
    }
  }

  describe("encodedSym / fertility arithmetic (q336)") {
    it("counts tokens per word under a known merge list") {
      // merges: (a,b) then (ab,c) — "abc" fuses to 1 token, "abd"
      // keeps (ab, d) = 2, "xyz" stays 3 chars
      val merges = Seq(Merge(1, "a", "b", 9L), Merge(2, "ab", "c", 5L))
      val m = words(("abc", 1L), ("abd", 1L), ("xyz", 1L))
        .select(col("word"), Bpe.encodedSym(col("word"), merges).as("sym"))
        .select(col("word"),
          org.apache.spark.sql.functions.size(
            expr("filter(split(sym, '  '), x -> x != '')")).as("t"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      m shouldBe Map("abc" -> 1, "abd" -> 2, "xyz" -> 3)
    }
  }
}
