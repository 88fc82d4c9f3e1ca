package graft.text

import graft.SparkSpec

/** PathRollup.rollup contract: every prefix counted, depth capping,
  * query/fragment stripping, rootless URLs contribute nothing.
  */
class PathRollupSpec extends SparkSpec {
  import spark.implicits._

  private def roll(maxDepth: Int, urls: String*) =
    PathRollup.rollup(urls.toSeq.toDF("url"), "url", maxDepth)
      .as[(Int, String, Long)].collect()
      .sortBy(r => (r._1, r._2)).toSeq

  describe("PathRollup.rollup") {
    it("counts a URL under every prefix of its path") {
      roll(3, "https://x.com/a/b/c") shouldBe Seq(
        (1, "/a", 1L), (2, "/a/b", 1L), (3, "/a/b/c", 1L))
    }
    it("aggregates shared prefixes across URLs") {
      roll(3, "https://x.com/a/b", "https://x.com/a/c") shouldBe Seq(
        (1, "/a", 2L), (2, "/a/b", 1L), (2, "/a/c", 1L))
    }
    it("caps at maxDepth and strips query/fragment") {
      roll(2, "https://x.com/a/b/c/d?q=1#f") shouldBe Seq(
        (1, "/a", 1L), (2, "/a/b", 1L))
    }
    it("rootless and bare-domain URLs contribute nothing") {
      roll(3, "https://x.com", "https://x.com/", "https://x.com/?q=1")
        .toSeq shouldBe empty
    }
  }
}
