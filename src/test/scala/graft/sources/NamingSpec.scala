package graft.sources

import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** Reference naming rules (datanika services/naming.py): display-name
  * validation and snake_case identifier derivation.
  */
class NamingSpec extends AnyFunSpec with Matchers {

  describe("FileSource.toSnakeCase") {
    it("collapses whitespace runs to one underscore and lowercases") {
      FileSource.toSnakeCase("  Orders  Raw Feed ") shouldBe "orders_raw_feed"
      FileSource.toSnakeCase("ALREADY_SNAKE") shouldBe "already_snake"
    }
  }

  describe("FileSource.validateName") {
    it("accepts alphanumeric + space names") {
      noException should be thrownBy
        FileSource.validateName("Orders 2024", "pipeline")
    }
    it("rejects empty and punctuated names with the entity label") {
      the[IllegalArgumentException] thrownBy
        FileSource.validateName("   ", "pipeline") should have message
        "requirement failed: pipeline name cannot be empty"
      an[IllegalArgumentException] should be thrownBy
        FileSource.validateName("orders;drop", "model")
      an[IllegalArgumentException] should be thrownBy
        FileSource.validateName("café", "model") // non-ASCII, as the reference rejects
    }
  }
}
