package graft.quality

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** Agreement.kappa contract: hand-computed κ, the perfect/degenerate
  * identities, and chance-level agreement scoring 0.
  */
class AgreementSpec extends SparkSpec {
  import spark.implicits._

  private def kappa(pairs: (Boolean, Boolean)*) =
    Agreement.kappa(
        pairs.toSeq.map { case (a, b) => ("g", a, b) }.toDF("g", "a", "b"),
        col("a"), col("b"), "g")
      .select("n", "n11", "n10", "n01", "n00", "p_observed", "kappa")
      .as[(Long, Long, Long, Long, Long, Double, Option[Double])].head()

  describe("Agreement.kappa") {
    it("matches the hand-computed value on a balanced table") {
      // n11=4 n10=1 n01=1 n00=4 → po=0.8, pe=0.5, κ=0.6
      val r = kappa(Seq.fill(4)((true, true)) ++ Seq((true, false)) ++
        Seq((false, true)) ++ Seq.fill(4)((false, false)): _*)
      r shouldBe ((10L, 4L, 1L, 1L, 4L, 0.8, Some(0.6)))
    }
    it("scores perfect agreement 1") {
      kappa((true, true), (false, false), (true, true))._7 shouldBe Some(1.0)
    }
    it("scores chance-level agreement 0") {
      // independent raters with 50/50 marginals: po = pe = 0.5
      kappa((true, true), (true, false), (false, true),
        (false, false))._7 shouldBe Some(0.0)
    }
    it("nulls kappa when both raters are constant (pe = 1)") {
      kappa((true, true), (true, true))._7 shouldBe None
    }
  }
}
