package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.TextHashExprs._

/** Spark session extension registering graft's native expressions as
  * SQL functions, so `spark.sql("SELECT graft_simhash64(text) ...")`
  * works in the SQL-editor path too:
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * (For an already-built session, `GraftExtensions.register(spark)`
  * installs the same functions imperatively.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_word_shingle_hashes"),
      info("graft_word_shingle_hashes",
        "_FUNC_(text, k) - sorted distinct xxh64 hashes of word k-shingles"),
      (children: Seq[Expression]) => children match {
        case Seq(t, k) => WordShingleHashes(t, intLit(k, "k"))
        case _ => throw new IllegalArgumentException(
          "graft_word_shingle_hashes(text, k) takes 2 arguments")
      }),
    (FunctionIdentifier("graft_minhash_signature"),
      info("graft_minhash_signature",
        "_FUNC_(hashes, n) - n-slot MinHash signature of a hashed feature set"),
      (children: Seq[Expression]) => children match {
        case Seq(h, n) => MinHashSignature(h, intLit(n, "n"))
        case _ => throw new IllegalArgumentException(
          "graft_minhash_signature(hashes, n) takes 2 arguments")
      }),
    (FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64", "_FUNC_(text) - 64-bit SimHash fingerprint"),
      (children: Seq[Expression]) => children match {
        case Seq(t) => SimHash64(t)
        case _ => throw new IllegalArgumentException(
          "graft_simhash64(text) takes 1 argument")
      }),
    (FunctionIdentifier("graft_simhash_poly64"),
      info("graft_simhash_poly64",
        "_FUNC_(text) - 60-bit SimHash over polynomial+mix30 bigram hashes (cross-engine-computable)"),
      (children: Seq[Expression]) => children match {
        case Seq(t) => SimHashPoly64(t)
        case _ => throw new IllegalArgumentException(
          "graft_simhash_poly64(text) takes 1 argument")
      }),
    (FunctionIdentifier("graft_word_bigrams"),
      info("graft_word_bigrams",
        "_FUNC_(text) - word bigram strings (single-space tokenization)"),
      (children: Seq[Expression]) => children match {
        case Seq(t) => WordBigrams(t)
        case _ => throw new IllegalArgumentException(
          "graft_word_bigrams(text) takes 1 argument")
      }),
    (FunctionIdentifier("graft_bigram_max_mult"),
      info("graft_bigram_max_mult",
        "_FUNC_(text) - max word-bigram multiplicity (Gopher repetition core)"),
      (children: Seq[Expression]) => children match {
        case Seq(t) => BigramMaxMultiplicity(t)
        case _ => throw new IllegalArgumentException(
          "graft_bigram_max_mult(text) takes 1 argument")
      }),
    (FunctionIdentifier("graft_lang_predict"),
      info("graft_lang_predict",
        "_FUNC_(text) - marker-stopword language ID (argmax, 'und' on no hits)"),
      (children: Seq[Expression]) => children match {
        case Seq(t) => LangPredict(t)
        case _ => throw new IllegalArgumentException(
          "graft_lang_predict(text) takes 1 argument")
      }),
    (FunctionIdentifier("graft_cosine"),
      info("graft_cosine",
        "_FUNC_(a, b) - fused cosine similarity of two float/double arrays"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => graft.functions.VectorExprs.CosineSim(a, b)
        case _ => throw new IllegalArgumentException(
          "graft_cosine(a, b) takes 2 arguments")
      }),
    (FunctionIdentifier("graft_mix30"),
      info("graft_mix30",
        "_FUNC_(k) - cross-engine 30-bit avalanche (deterministic sampling " +
          "hash; input must be < 2^30)"),
      (children: Seq[Expression]) => children match {
        case Seq(k) => mix30Expr(k)
        case _ => throw new IllegalArgumentException(
          "graft_mix30(k) takes 1 argument")
      }),

    // ---- mergeable sketch family (aggregates return sketch BYTES;
    // ---- the registry wraps AggregateFunctions automatically) ----
    (FunctionIdentifier("graft_kll_sketch"),
      info("graft_kll_sketch",
        "_FUNC_(x[, k]) - mergeable KLL quantile sketch bytes of a numeric column"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => graft.functions.KllSketchAgg(castDouble(c))
        case Seq(c, k) => graft.functions.KllSketchAgg(castDouble(c), intLit(k, "k"))
        case _ => throw new IllegalArgumentException(
          "graft_kll_sketch(x[, k]) takes 1-2 arguments")
      }),
    (FunctionIdentifier("graft_kll_merge"),
      info("graft_kll_merge",
        "_FUNC_(sketch[, k]) - merge previously-built KLL sketches (bytes only)"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => graft.functions.KllMergeAgg(c)
        case Seq(c, k) => graft.functions.KllMergeAgg(c, intLit(k, "k"))
        case _ => throw new IllegalArgumentException(
          "graft_kll_merge(sketch[, k]) takes 1-2 arguments")
      }),
    (FunctionIdentifier("graft_kll_quantiles"),
      info("graft_kll_quantiles",
        "_FUNC_(sketch, array(p1, p2, ...)) - quantiles from KLL sketch bytes"),
      (children: Seq[Expression]) => children match {
        case Seq(sk, ps) => graft.functions.KllQuantilesExpr(sk, doubleArrayLit(ps, "probs"))
        case _ => throw new IllegalArgumentException(
          "graft_kll_quantiles(sketch, probs) takes 2 arguments")
      }),
    (FunctionIdentifier("graft_freq_sketch"),
      info("graft_freq_sketch",
        "_FUNC_(item[, maxMapSize]) - mergeable Misra-Gries heavy-hitters sketch bytes"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => graft.functions.FreqSketchBuildAgg(c)
        case Seq(c, m) => graft.functions.FreqSketchBuildAgg(c, intLit(m, "maxMapSize"))
        case _ => throw new IllegalArgumentException(
          "graft_freq_sketch(item[, maxMapSize]) takes 1-2 arguments")
      }),
    (FunctionIdentifier("graft_freq_merge"),
      info("graft_freq_merge",
        "_FUNC_(sketch[, maxMapSize]) - merge heavy-hitters sketches (bytes only)"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => graft.functions.FreqMergeAgg(c)
        case Seq(c, m) => graft.functions.FreqMergeAgg(c, intLit(m, "maxMapSize"))
        case _ => throw new IllegalArgumentException(
          "graft_freq_merge(sketch[, maxMapSize]) takes 1-2 arguments")
      }),
    (FunctionIdentifier("graft_freq_top_k"),
      info("graft_freq_top_k",
        "_FUNC_(sketch, k) - top-k heavy hitters: array of (item, estimate, lower_bound, upper_bound)"),
      (children: Seq[Expression]) => children match {
        case Seq(sk, k) => graft.functions.FreqTopKExpr(sk, intLit(k, "k"))
        case _ => throw new IllegalArgumentException(
          "graft_freq_top_k(sketch, k) takes 2 arguments")
      }),
    (FunctionIdentifier("graft_theta_sketch"),
      info("graft_theta_sketch",
        "_FUNC_(x[, lgK]) - mergeable theta distinct sketch bytes (set algebra capable)"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => graft.functions.ThetaSketchAgg(c)
        case Seq(c, lgK) => graft.functions.ThetaSketchAgg(c, intLit(lgK, "lgK"))
        case _ => throw new IllegalArgumentException(
          "graft_theta_sketch(x[, lgK]) takes 1-2 arguments")
      }),
    (FunctionIdentifier("graft_theta_union"),
      info("graft_theta_union",
        "_FUNC_(sketch[, lgK]) - union previously-built theta sketches (bytes only)"),
      (children: Seq[Expression]) => children match {
        case Seq(c) => graft.functions.ThetaUnionAgg(c)
        case Seq(c, lgK) => graft.functions.ThetaUnionAgg(c, intLit(lgK, "lgK"))
        case _ => throw new IllegalArgumentException(
          "graft_theta_union(sketch[, lgK]) takes 1-2 arguments")
      }),
    (FunctionIdentifier("graft_theta_estimate"),
      info("graft_theta_estimate",
        "_FUNC_(sketch) - distinct estimate of theta sketch bytes (long)"),
      (children: Seq[Expression]) => children match {
        case Seq(sk) => graft.functions.ThetaEstimateExpr(sk)
        case _ => throw new IllegalArgumentException(
          "graft_theta_estimate(sketch) takes 1 argument")
      }),
    (FunctionIdentifier("graft_theta_intersect"),
      info("graft_theta_intersect",
        "_FUNC_(a, b) - intersection of two theta sketches (bytes)"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => graft.functions.ThetaSetOpExpr(a, b, "intersect")
        case _ => throw new IllegalArgumentException(
          "graft_theta_intersect(a, b) takes 2 arguments")
      }),
    (FunctionIdentifier("graft_theta_a_not_b"),
      info("graft_theta_a_not_b",
        "_FUNC_(a, b) - difference a \\ b of two theta sketches (bytes)"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => graft.functions.ThetaSetOpExpr(a, b, "a_not_b")
        case _ => throw new IllegalArgumentException(
          "graft_theta_a_not_b(a, b) takes 2 arguments")
      }),
    (FunctionIdentifier("graft_theta_union_of"),
      info("graft_theta_union_of",
        "_FUNC_(a, b[, lgK]) - pairwise union of two theta sketches (bytes); " +
          "lgK must cover the inputs' build size"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => graft.functions.ThetaSetOpExpr(a, b, "union")
        case Seq(a, b, lgK) =>
          graft.functions.ThetaSetOpExpr(a, b, "union", intLit(lgK, "lgK"))
        case _ => throw new IllegalArgumentException(
          "graft_theta_union_of(a, b[, lgK]) takes 2-3 arguments")
      }))

  private def castDouble(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Cast(
      e, org.apache.spark.sql.types.DoubleType)

  /** Evaluate a foldable array expression to literal probs (cast to
    * array<double> first so decimal literals like 0.5 work).
    */
  private def doubleArrayLit(e: Expression, what: String): Seq[Double] = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    require(e.foldable, s"$what must be a literal array of doubles, got: $e")
    Cast(e, ArrayType(DoubleType)).eval() match {
      case a: ArrayData =>
        val n = a.numElements()
        require((0 until n).forall(i => !a.isNullAt(i)),
          s"$what must not contain nulls or non-numeric values")
        a.toDoubleArray().toSeq
      case other => throw new IllegalArgumentException(
        s"$what must be a literal array of doubles, got: $other")
    }
  }

  /** TextHashExprs.mix30 as a resolved catalyst tree (the registry
    * builder can't analyze Column-form unresolved functions, so the
    * composition is spelled in catalyst nodes here; constants mirror
    * TextHashExprs.mix30 and Sampling.mix30 — GraftFunctionsSpec pins
    * all three equal).
    */
  private def mix30Expr(k: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{BitwiseXor, Cast, Multiply, Pmod, ShiftRight}
    import org.apache.spark.sql.types.LongType
    val p = Literal(1073741789L) // largest prime < 2^30
    val x0 = Cast(k, LongType)
    val x1 = BitwiseXor(x0, ShiftRight(x0, Literal(16)))
    val x2 = Pmod(Multiply(x1, Literal(0x9E3779B1L)), p)
    val x3 = BitwiseXor(x2, ShiftRight(x2, Literal(13)))
    val x4 = Pmod(Multiply(x3, Literal(0x85EBCA77L)), p)
    BitwiseXor(x4, ShiftRight(x4, Literal(16)))
  }

  /** Imperative registration into a live session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, id, inf, builder)
    }
}
