package graft.text

import org.apache.spark.sql.functions.col
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class ContactsSpec extends AnyFunSpec with Matchers with SparkSpec {

  import spark.implicits._

  private def email(s: String): Option[String] =
    Seq(s).toDF("e").select(Contacts.canonicalEmail(col("e")).as("c"))
      .collect().map(r => Option(r.getString(0))).head

  private def phone(s: String): Option[String] =
    Seq(s).toDF("p").select(Contacts.canonicalPhone(col("p")).as("c"))
      .collect().map(r => Option(r.getString(0))).head

  describe("Contacts.canonicalEmail") {
    it("merges gmail dot/tag/googlemail variants") {
      email("John.Doe+promo@GMAIL.com") shouldBe Some("johndoe@gmail.com")
      email("johndoe@googlemail.com") shouldBe Some("johndoe@gmail.com")
      email(" JohnDoe@Gmail.Com ") shouldBe Some("johndoe@gmail.com")
    }

    it("keeps dots on non-gmail domains, still strips tags") {
      email("john.doe+x@example.org") shouldBe Some("john.doe@example.org")
      email("John.Doe@Example.ORG") shouldBe Some("john.doe@example.org")
    }

    it("malformed addresses canonicalize to null") {
      email("not-an-email") shouldBe None
      email("two@at@signs") shouldBe None
      email("+tagonly@gmail.com") shouldBe None
    }
  }

  describe("Contacts.canonicalPhone") {
    it("normalizes NANP punctuation and country prefix") {
      phone("+1 (202) 555-0147") shouldBe Some("2025550147")
      phone("202.555.0147") shouldBe Some("2025550147")
      phone("12025550147") shouldBe Some("2025550147")
    }

    it("wrong lengths are null, not empty") {
      phone("555-0147") shouldBe None
      phone("+44 20 7946 0958") shouldBe None
      phone("") shouldBe None
    }
  }
}
