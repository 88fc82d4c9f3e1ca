package graft.ann

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** JL projection contract (RandomProjection): output arity, the
  * distance-preservation property on real-ish vectors (loose ε —
  * it's a statistical lemma, not an identity), determinism across
  * invocations, and the zero-exchange plan shape.
  */
class RandomProjectionSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7L)
  private val vecs = (0L until 60L)
    .map(i => (i, Seq.fill(64)(rnd.nextGaussian().toFloat)))
    .toDF("id", "v")

  describe("RandomProjection") {
    it("emits outDim components per vector") {
      val r = RandomProjection.project(vecs, "id", "v", outDim = 16)
      r.count() shouldBe 60L * 16
      r.agg(countDistinct($"j")).as[Long].head() shouldBe 16L
    }
    it("preserves pairwise distances within JL slack at k=16") {
      val p = RandomProjection.projectArray(vecs, "id", "v", outDim = 16)
      val joined = vecs.select($"id".as("a"), $"v".as("va"))
        .join(p.select($"vec_id".as("a"), $"proj".as("pa")), "a")
        .crossJoin(vecs.select($"id".as("b"), $"v".as("vb"))
          .join(p.select($"vec_id".as("b"), $"proj".as("pb")), "b"))
        .filter($"a" < $"b")
      def sq(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
        aggregate(zip_with(x, y, (u, w) => (u - w) * (u - w)),
          lit(0.0), (acc, t) => acc + t)
      val ratios = joined
        .select((sq($"pa", $"pb") / sq($"va", $"vb")).as("r"))
        .as[Double].collect()
      // k=16 ⇒ ε ≈ sqrt(8·ln(n)/k) is ~1.4 — JL only bites at larger
      // k; still, the MEDIAN ratio concentrates near 1 and no pair
      // collapses to zero or explodes
      val sorted = ratios.sorted
      sorted(sorted.length / 2) shouldBe 1.0 +- 0.35
      all(ratios) should be > 0.05
      all(ratios) should be < 5.0
    }
    it("is deterministic across invocations") {
      val a = RandomProjection.project(vecs, "id", "v", 8)
        .orderBy("vec_id", "j").as[(Long, Int, Double)].collect()
      val b = RandomProjection.project(vecs, "id", "v", 8)
        .orderBy("vec_id", "j").as[(Long, Int, Double)].collect()
      a shouldBe b
    }
    it("is a pure projection — no exchange before the explode") {
      val plan = RandomProjection.projectArray(vecs, "id", "v", 16)
        .queryExecution.executedPlan.toString
      plan should not include "Exchange"
    }
  }
}
