package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MojibakeSpec extends SparkSpec {
  import spark.implicits._

  private def repairOne(s: String): String =
    Seq(s).toDF("t").select(Mojibake.repair(col("t"))).as[String].head()

  describe("Mojibake.Table") {
    it("is derived, longest-first, and excludes irreparable chars") {
      // every entry round-trips at the byte level by construction
      Mojibake.Table.foreach { case (moji, fixed) =>
        Mojibake.mojibake(fixed) shouldBe moji
      }
      val lens = Mojibake.Table.map(_._1.length)
      lens shouldBe lens.sortBy(-_)
      // ” (U+201D) hits cp1252-undefined 0x9D → must be absent
      Mojibake.Table.map(_._2) should not contain "”"
      // é must be present
      Mojibake.Table.map(_._2) should contain("é")
    }
  }

  describe("Mojibake.repair") {
    it("round-trips the full covered repertoire") {
      val clean = Mojibake.Table.map(_._2).mkString(" ")
      repairOne(Mojibake.mojibake(clean)) shouldBe clean
    }

    it("repairs mixed corrupted/clean text") {
      val s = "before " + Mojibake.mojibake("café — naïve") + " after"
      repairOne(s) shouldBe "before café — naïve after"
    }

    it("is the identity on pure ASCII") {
      val s = "plain ascii text, nothing to fix: 123!"
      repairOne(s) shouldBe s
    }

    it("3-byte sequences repair before their 2-byte prefixes could bite") {
      // "â€”" (corrupted em dash) must become "—", never a repaired
      // "â" fragment plus junk
      repairOne(Mojibake.mojibake("—–…")) shouldBe "—–…"
    }

    it("SQL chain is generated from the same table") {
      val sql = Mojibake.repairSql("t")
      sql should include("replace(")
      Mojibake.Table.take(3).foreach { case (moji, _) =>
        sql should include(moji.replace("'", "''"))
      }
    }
  }

  describe("Mojibake.looksCorrupted") {
    it("flags corrupted text and passes clean text") {
      val rows = Seq(
        Mojibake.mojibake("café"), // corrupted
        "clean text", // clean ASCII
        "café déjà vu" // clean non-ASCII (no lead-byte junk)
      ).toDF("t").select(Mojibake.looksCorrupted(col("t"))).as[Boolean]
        .collect().toSeq
      rows shouldBe Seq(true, false, false)
    }
  }
}
