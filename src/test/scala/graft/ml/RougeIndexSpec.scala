package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The persisted ROUGE reference-count index (Rouge.refCountIndex /
  * indexedRougeN — VERDICT r10 item 2) and the reconciled gram-key
  * convention (item 5): index transparency vs the fresh recompute,
  * metadata dispatch, and hashed-vs-text key equality.
  */
class RougeIndexSpec extends SparkSpec {
  import spark.implicits._

  private val cand = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "a b a b a"),
    (3L, "totally different words here"))
  private val ref = Seq(
    (1L, "the cat sat on a mat"),
    (2L, "a b a b c"),
    (3L, "no overlap at all whatsoever"),
    (4L, "an unprobed reference pair"))

  private def sorted(df: DataFrame) =
    df.orderBy("pair_id").collect().map(_.toSeq).toList

  private def fresh(name: String): String = {
    val path = s"target/scratch/rouge_spec_$name"
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    path
  }

  describe("Rouge gram-key convention") {
    it("hashKeys = true scores exactly as the text-key oracle mode") {
      val text = Rouge.rougeN(cand.toDF("pair_id", "text"),
        ref.toDF("pair_id", "text"), "pair_id", "text", n = 2)
      val hashed = Rouge.rougeN(cand.toDF("pair_id", "text"),
        ref.toDF("pair_id", "text"), "pair_id", "text", n = 2,
        hashKeys = true)
      sorted(hashed) shouldBe sorted(text)
    }
  }

  describe("Rouge persisted reference counts") {
    it("scoring through the index equals the fresh recompute on a " +
        "candidate-batch subset, for both key conventions") {
      for (hk <- Seq(false, true)) {
        val sig = graft.ops.ArtifactIndex.fingerprint(
          ref.toDF("pair_id", "text"), "text")
        val idx = Rouge.refCountIndex(ref.toDF("pair_id", "text"),
          "pair_id", "text", n = 2, sig, hashKeys = hk)
        val batch = cand.filter(_._1 != 2L)
        val viaIndex = Rouge.scoreAgainstIndex(idx,
          batch.toDF("pair_id", "text"), "pair_id", "text")
        val freshScores = Rouge.rougeN(batch.toDF("pair_id", "text"),
          ref.toDF("pair_id", "text"), "pair_id", "text", n = 2)
        sorted(viaIndex) shouldBe sorted(freshScores)
      }
    }

    it("rejects missing metadata, a foreign family, a foreign key " +
        "convention, and an empty index") {
      val sig = (4L, 99L)
      val idx = Rouge.refCountIndex(ref.toDF("pair_id", "text"),
        "pair_id", "text", n = 2, sig)
      def probe(i: DataFrame) = Rouge.scoreAgainstIndex(i,
        cand.toDF("pair_id", "text"), "pair_id", "text")
      an[IllegalArgumentException] should be thrownBy
        probe(idx.drop("rouge_fam"))
      an[IllegalArgumentException] should be thrownBy
        probe(idx.withColumn("rouge_fam", lit("other-fam")))
      an[IllegalArgumentException] should be thrownBy
        probe(idx.withColumn("rouge_keys", lit("sha256")))
      val e = intercept[IllegalArgumentException] {
        probe(Rouge.refCountIndex(
          Seq.empty[(Long, String)].toDF("pair_id", "text"),
          "pair_id", "text", n = 2, sig))
      }
      e.getMessage should include("empty")
    }

    it("build-or-reuse: reuses on a matching reference set, rebuilds " +
        "on a changed one") {
      val path = fresh("bor")
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      def run(r: Seq[(Long, String)]) =
        sorted(Rouge.indexedRougeN(spark, path, r.toDF("pair_id", "text"),
          cand.toDF("pair_id", "text"), "pair_id", "text", n = 2))
      val first = run(ref)
      val t1 = fs.getFileStatus(p).getModificationTime
      run(ref) shouldBe first
      fs.getFileStatus(p).getModificationTime shouldBe t1 // reused
      val ref2 = ref.map { case (id, tx) =>
        if (id == 1L) (id, "the cat sat on the mat") else (id, tx) }
      val second = run(ref2)
      second should not be first // pair 1's reference changed
      second shouldBe sorted(Rouge.rougeN(cand.toDF("pair_id", "text"),
        ref2.toDF("pair_id", "text"), "pair_id", "text", n = 2))
    }

    it("fingerprint signs the PAIR BINDING: re-keying the same " +
        "reference texts rebuilds instead of silently reusing " +
        "(ADVICE r11)") {
      val path = fresh("rekey")
      def run(r: Seq[(Long, String)]) =
        sorted(Rouge.indexedRougeN(spark, path, r.toDF("pair_id", "text"),
          cand.toDF("pair_id", "text"), "pair_id", "text", n = 2))
      val first = run(ref)
      // permute pair_ids over the SAME text multiset: a text-only
      // (count, XOR+SUM) fingerprint is identical under this re-keying
      val texts = ref.map(_._2)
      val rekeyed = ref.map(_._1).zip(texts.reverse)
      val second = run(rekeyed)
      second shouldBe sorted(Rouge.rougeN(cand.toDF("pair_id", "text"),
        rekeyed.toDF("pair_id", "text"), "pair_id", "text", n = 2))
      second should not be first
    }

    it("token freshness: a matching token never rescans the reference") {
      val path = fresh("tok")
      val tok = graft.ops.ArtifactIndex.Token(5L)
      val built = sorted(Rouge.indexedRougeN(spark, path,
        ref.toDF("pair_id", "text"), cand.toDF("pair_id", "text"),
        "pair_id", "text", n = 2, freshness = tok))
      val poisoned = spark.range(1).select(col("id").as("pair_id"),
        raise_error(lit("reference was scanned")).cast("string")
          .as("text"))
      sorted(Rouge.indexedRougeN(spark, path, poisoned,
        cand.toDF("pair_id", "text"), "pair_id", "text", n = 2,
        freshness = tok)) shouldBe built
    }
  }
}
