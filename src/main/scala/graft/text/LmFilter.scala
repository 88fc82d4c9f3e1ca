package graft.text

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Language-model quality filtering, the counting-proxy variant —
  * CCNet/C4 score pages with a reference LM (KenLM perplexity) and
  * drop the worst tail; the engine-portable, integer-exact proxy for
  * that signal is the UNSEEN-n-gram ratio: the fraction of a
  * document's distinct word n-grams never observed in a trusted
  * reference corpus. Gibberish, boilerplate soup, and
  * wrong-language text all score high; fluent in-domain text scores
  * low. (A true LM score is a model artifact — out of scope with
  * zero egress — but the JOIN SHAPE below is exactly what scoring
  * against a corpus-derived table costs.)
  *
  * Scale shape — and the reason this is NOT q129's contamination
  * probe: a benchmark gram set is metadata-sized and broadcasts,
  * but a REFERENCE-CORPUS vocabulary is corpus-sized. So this is
  * the canonical big-big join: both sides reduce to 8-byte gram
  * HASHES (`TextHashes.wordShingleHashes`, codegen'd, distinct per
  * doc — gram text never shuffles), the reference side dedups to
  * one row per gram (partial-aggregated), and the join keys on the
  * hash. A Zipf-head gram is ONE row on the reference side joining
  * many doc rows — no row explosion, and AQE's skew split covers
  * the stragglers.
  */
object LmFilter {

  /** The smoothing family a bigram LM scores with — generalizing
    * r9's hard-wired add-one (VERDICT r9 "Missing #3"). The count
    * tables are smoothing-INDEPENDENT; the index's metadata pins
    * which scorer a persisted artifact was built to serve, and the
    * integer `code` is what lands in its `smoothing_k` column:
    * positive k = add-k, negative = interpolated with λ = -code ‰.
    */
  sealed trait Smoothing { def code: Int }

  /** Add-k (Lidstone): P(b|a) = (c_ab + k) / (c_a + k·V). k=1 is
    * the historical add-one contract — exact-integer ratio, one
    * 6dp-rounded ln per bigram occurrence. */
  final case class AddK(k: Int) extends Smoothing {
    require(k >= 1, s"add-k needs k >= 1: $k")
    def code: Int = k
  }

  /** Jelinek-Mercer interpolation:
    * P(b|a) = λ·c_ab/c_a + (1−λ)·(c_b + 1)/(T + V), with λ fixed as
    * an integer permille (so both engines derive the identical
    * double from `lambdaPermille / 1000.0`). The backoff leg is the
    * add-one UNIGRAM model (c_b = reference count of the second
    * token, T = total reference tokens), so unseen-first-token
    * bigrams still get a finite, vocabulary-calibrated score — the
    * classic fix for add-k's over-penalizing of large vocabularies
    * (Chen & Goodman 1999's baseline interpolated model).
    */
  final case class Interpolated(lambdaPermille: Int) extends Smoothing {
    require(lambdaPermille >= 1 && lambdaPermille <= 999,
      s"lambda permille in [1, 999]: $lambdaPermille")
    def code: Int = -lambdaPermille
  }

  /** Interpolated Kneser-Ney (Chen & Goodman 1999's best performer,
    * KenLM's default — the family CCNet actually scores with):
    *
    *   P(b|a) = max(c_ab − D, 0)/c_a + (D·N1+(a)/c_a)·P_cont(b)
    *
    * with D a fixed permille discount, N1+(a) the number of distinct
    * continuations of `a`, and the continuation probability
    * P_cont(b) = (N_ctx(b) + 1)/(B + V) — N_ctx(b) the distinct LEFT
    * contexts of `b`, B the distinct bigram types — add-one smoothed
    * so it is strictly positive. Engine contract for degenerate
    * contexts (pinned by spec, restated by the oracle): an unseen
    * first token (c_a = 0) or a continuation-free one (N1+(a) = 0 —
    * a token seen only at document ends) backs off to P_cont(b)
    * alone. All counts exact integers; P is one fixed-association
    * double chain, 6dp-rounded at the ln (the house discipline).
    */
  final case class KneserNey(discountPermille: Int) extends Smoothing {
    require(discountPermille >= 1 && discountPermille <= 999,
      s"discount permille in [1, 999]: $discountPermille")
    def code: Int = -(1000 + discountPermille)
  }

  /** Inverse of [[Smoothing.code]] — how a persisted `smoothing_k`
    * metadata value dispatches to a scorer: k >= 1 add-k, -1..-999
    * interpolated (λ = -code ‰), -1001..-1999 Kneser-Ney
    * (D = -code - 1000 ‰). */
  private[graft] def decodeSmoothing(code: Int): Smoothing =
    if (code >= 1) AddK(code)
    else if (code >= -999 && code <= -1) Interpolated(-code)
    else if (code >= -1999 && code <= -1001) KneserNey(-code - 1000)
    else throw new IllegalArgumentException(
      s"smoothing_k = $code names no smoothing family")

  /** Per-document unseen-gram ratio against a reference corpus.
    *
    * @return (idCol, n_grams, n_unseen, unseen_ratio) — gram counts
    *         are DISTINCT grams per document (the expression dedups)
    */
  def unseenGramRatio(
      docs: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2): DataFrame = {
    import graft.functions.TextHashes.wordShingleHashes
    val refGrams = reference
      .select(explode(wordShingleHashes(col(textCol), n)).as("gram"))
      .distinct() // corpus-sized: stays distributed, never broadcast
      .withColumn("_seen", lit(1))
    docs
      .select(col(idCol), explode(wordShingleHashes(col(textCol), n)).as("gram"))
      .join(refGrams, Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("_seen").isNull, 1)).as("n_unseen"))
      .withColumn("unseen_ratio",
        F.round(col("n_unseen").cast("double") / col("n_grams"), 9))
  }

  /** Per-document average bigram log-probability against a
    * reference corpus — one step closer to CCNet's KenLM perplexity
    * than [[unseenGramRatio]]'s binary seen/unseen: an add-one
    * smoothed bigram LM trained on the reference,
    *
    *   P(b|a) = (c_ab + 1) / (c_a + V)
    *
    * scored per bigram OCCURRENCE and averaged per document (avg
    * log-prob is negated perplexity's log; fluent in-domain text
    * scores high/close to 0, gibberish deeply negative).
    *
    * Determinism: counts are exact integers; each term is the fixed
    * chain round(ln((c_ab+1)/(c_a+V)), 6) — µ-quantized before the
    * decimal-exact per-doc total (the chi-square/entropy
    * discipline) — and the average is one closing double division.
    *
    * Scale shape: the LM "model" is two corpus-derived count tables
    * (unigrams, bigrams — vocabulary-sized, partial-aggregated);
    * scoring is two keyed hash joins on the gram string + one
    * per-doc groupBy. V is a 1-row broadcast. Documents with < 2
    * tokens have no bigrams and drop out (score undefined, stated
    * not imputed).
    */
  def bigramLogprob(
      docs: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      smoothing: Smoothing = AddK(1),
      hashKeys: Boolean = false): DataFrame = {
    // barrier: `uni` feeds BOTH the vocabulary scalar and the c_a
    // join — without the cut the reference tokenize+count runs twice
    val uni = graft.plans.Plans.barrier(
      reference.select(explode(toks(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c_a")))
    val bi = reference.select(explode(bigrams(col(textCol))).as("ab"))
      .groupBy("ab").agg(count(lit(1)).as("c_ab"))
    scoreDocs(docs, idCol, textCol, uni, bi, smoothing, hashKeys)
  }

  // native codegen'd n-gram loops (graft.functions.TextHashExprs
  // .WordNgrams) — the HOF transform/element_at forms they replace
  // re-evaluated the token split once per OUTPUT GRAM (interpreted
  // CodegenFallback): O(tokens²) regex work per row, measured as the
  // dominant serial stage of every LM query at sf0.1 (r14 profile).
  // Identical output contract: `\s+`-run tokens of lower(text);
  // under-n documents yield an empty gram array.
  private def toks(c: org.apache.spark.sql.Column) =
    graft.functions.TextHashes.wordNgrams(c, 1)

  private def bigrams(c: org.apache.spark.sql.Column) =
    graft.functions.TextHashes.wordNgrams(c, 2)

  private def trigrams(c: org.apache.spark.sql.Column) =
    graft.functions.TextHashes.wordNgrams(c, 3)

  /** Shared scoring chain over prepared count tables `uni(w, c_a)` /
    * `bi(ab, c_ab)` — the batch-probe leg both [[bigramLogprob]]
    * (fresh train) and [[scoreAgainstLmIndex]] (persisted train)
    * execute. V (and, for the interpolated scorer, T = Σ c_a)
    * derives from `uni` (1-row broadcast). The interpolated scorer
    * adds ONE extra keyed join (unigram count of the second token) —
    * the same hash-join shape, still O(batch).
    *
    * `hashKeys` is the reconciled gram-key convention (VERDICT r10
    * item 5, same contract as `ml/Rouge`): false (default, oracle
    * parity) joins gram TEXT so both engines run identical
    * semantics; true (production) reduces every join key to an
    * xxhash64 8-byte value before the shuffle — gram text still
    * flows through the derivations (the KN continuation tables split
    * bigram text), only the JOIN keys hash. Collision failure mode
    * (ADVICE r11 — it is NOT a count merge here): the uni/bi count
    * tables are post-groupBy UNIQUE per gram text, so two distinct
    * reference grams colliding produce two rows under ONE join key,
    * and the left joins FAN OUT every matching doc gram — inflating
    * n_bigrams and the logprob sum for affected docs (slightly worse
    * than merging two counts). Probability is unchanged: at 10⁹
    * distinct grams the expected number of colliding pairs is
    * ~3·10⁻² corpus-wide (birthday bound n²/2⁶⁵). Spec-pinned equal
    * to text mode on fixtures for all three smoothing families.
    */
  private def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      uni: DataFrame, bi: DataFrame,
      smoothing: Smoothing = AddK(1),
      hashKeys: Boolean = false): DataFrame = {
    def key(c: org.apache.spark.sql.Column) =
      if (hashKeys) xxhash64(c) else c
    val vocab = uni.agg(count(lit(1)).as("v"),
      coalesce(sum(col("c_a")), lit(0L)).as("t"))
    // the KN branch reads the bi table three more times (N1+/N_ctx/B)
    // — barrier it so the fresh-train path computes the corpus
    // groupBy once; the other scorers read bi exactly once
    val biEff = smoothing match {
      case KneserNey(_) =>
        graft.plans.Plans.barrier(bi.select("ab", "c_ab"))
      case _ => bi.select("ab", "c_ab")
    }
    // the KN scorer's N1+(a) table pre-joins INTO the unigram count
    // table here (both keyed on the first token; every bigram prefix
    // is a reference unigram, so the left join keeps all n1p rows):
    // one count-table-sized join replaces a second doc-occurrence-
    // sized shuffle join (guide §2.4 — two operations keyed the same
    // way share one exchange; r14 plan diff: 4 doc-side joins → 3).
    val uniSide = smoothing match {
      case KneserNey(_) =>
        val n1p = biEff.select(split(col("ab"), " ").getItem(0).as("a"))
          .groupBy("a").agg(count(lit(1)).as("n1p"))
          .select(key(col("a")).as("ak"), col("n1p"))
        uni.select(key(col("w")).as("ak"), col("c_a"))
          .join(n1p, Seq("ak"), "left")
      case _ => uni.select(key(col("w")).as("ak"), col("c_a"))
    }
    val joined0 = docs
      .select(col(idCol), explode(bigrams(col(textCol))).as("ab"))
      .withColumn("a", split(col("ab"), " ").getItem(0))
      .withColumn("abk", key(col("ab")))
      .withColumn("ak", key(col("a")))
      .join(biEff.select(key(col("ab")).as("abk"), col("c_ab")),
        Seq("abk"), "left")
      .join(uniSide, Seq("ak"), "left")
    val (joined, term) = smoothing match {
      case AddK(k) =>
        // exact-long numerator/denominator, then ONE double division
        // and the 6dp-rounded ln (k=1 is byte-identical to the
        // historical add-one chain: long + int literal, same values)
        (joined0, F.round(log(
          (coalesce(col("c_ab"), lit(0L)) + lit(k.toLong)).cast("double") /
            (coalesce(col("c_a"), lit(0L)) + lit(k.toLong) * col("v"))
              .cast("double")), 6)
          .cast("decimal(28,6)"))
      case Interpolated(lp) =>
        // λ is permille → the division 'lp / 1000.0' yields the same
        // IEEE double in any engine; each leg is an exact-int ratio
        // through one double division, composed in a fixed order
        val lam = lit(lp.toDouble / 1000.0d)
        val pml = when(coalesce(col("c_a"), lit(0L)) > 0,
          coalesce(col("c_ab"), lit(0L)).cast("double") /
            col("c_a").cast("double")).otherwise(lit(0.0d))
        val puni = (coalesce(col("c_b"), lit(0L)) + lit(1L)).cast("double") /
          (col("t") + col("v")).cast("double")
        val j = joined0
          .withColumn("b2k", key(split(col("ab"), " ").getItem(1)))
          .join(uni.select(key(col("w")).as("b2k"), col("c_a").as("c_b")),
            Seq("b2k"), "left")
        (j, F.round(log(lam * pml + (lit(1.0d) - lam) * puni), 6)
          .cast("decimal(28,6)"))
      case KneserNey(dp) =>
        // continuation statistics all derive from the SAME (barrier'd)
        // bi table: N1+(a) distinct continuations per first token
        // (pre-joined into the unigram table above), N_ctx(b) distinct
        // left contexts per second token, B the bigram-type total
        // (1-row broadcast with V). Derivations split gram TEXT; only
        // the join keys go through key().
        val nctx = biEff.select(split(col("ab"), " ").getItem(1).as("b2"))
          .groupBy("b2").agg(count(lit(1)).as("nctx"))
          .select(key(col("b2")).as("b2k"), col("nctx"))
        val btypes = biEff.agg(count(lit(1)).as("bt"))
        val d = lit(dp.toDouble / 1000.0d)
        val pc = (coalesce(col("nctx"), lit(0L)) + lit(1L)).cast("double") /
          (col("bt") + col("v")).cast("double")
        val p = when(
          coalesce(col("c_a"), lit(0L)) > 0 &&
            coalesce(col("n1p"), lit(0L)) > 0,
          greatest(coalesce(col("c_ab"), lit(0L)).cast("double") - d,
              lit(0.0d)) / col("c_a").cast("double") +
            ((d * col("n1p").cast("double")) / col("c_a").cast("double"))
              * pc)
          .otherwise(pc)
        val j = joined0
          .withColumn("b2k", key(split(col("ab"), " ").getItem(1)))
          .join(nctx, Seq("b2k"), "left")
          .crossJoin(broadcast(btypes))
        (j, F.round(log(p), 6).cast("decimal(28,6)"))
    }
    joined.crossJoin(broadcast(vocab))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("c_ab").isNull, 1)).as("n_unseen"),
        sum(term).as("s"))
      .select(col(idCol), col("n_bigrams"), col("n_unseen"),
        F.round(col("s").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("avg_logprob"))
  }

  /** Per-document average TRIGRAM log-probability under interpolated
    * Kneser-Ney — the order-3 upgrade VERDICT r13 named (a bigram KN
    * scorer separates fluent from non-fluent text but is materially
    * weaker at ranking WITHIN fluent text; CCNet's KenLM reference
    * point is a 5-gram KN model, and order 3 closes most of that gap
    * at corpus-table cost). The standard three-level interpolated-KN
    * chain (Chen & Goodman 1999), every statistic derived from the
    * reference trigram/bigram count tables:
    *
    *   P₃(c|ab) = max(c_abc − D, 0)/c_ab + (D·N1+(ab·)/c_ab)·P₂(c|b)
    *   P₂(c|b)  = max(N1+(·bc) − D, 0)/N1+(·b·)
    *              + (D·N1+mid(b)/N1+(·b·))·P_cont(c)
    *   P_cont(c) = (N1+(·c) + 1)/(B + V)
    *
    * with D a fixed permille discount, N1+(ab·) the distinct
    * continuations of bigram ab (trigram types with prefix ab),
    * N1+(·bc) the distinct left contexts of bigram bc (trigram types
    * with suffix bc), N1+(·b·) the trigram types with middle b,
    * N1+mid(b) the distinct c with some trigram ·bc (the strict-KN
    * middle-level backoff weight), N1+(·c) the distinct left
    * contexts of c in the bigram table, B the bigram types and V the
    * vocabulary — the bottom level add-one smoothed exactly as the
    * order-2 scorer's P_cont, so every P is strictly positive.
    *
    * Degenerate-context contract (pinned by spec, restated by the
    * oracle, mirroring the order-2 scorer): an unseen bigram prefix
    * (c_ab = 0) or a continuation-free one (N1+(ab·) = 0 — ab seen
    * only at document ends) backs off to P₂(c|b); a middle token
    * never seen as a trigram middle (N1+(·b·) = 0) backs P₂ off to
    * P_cont(c). All counts exact integers; P is one fixed-
    * association double chain, 6dp-rounded at the ln.
    *
    * Scale shape: the model is three corpus-derived count tables
    * (uni/bi/tri — vocabulary-sized, partial-aggregated); the
    * continuation tables are groupBys OVER the trigram count table
    * (type-sized, never the corpus); scoring is six keyed hash joins
    * + one 1-row broadcast per batch trigram occurrence. Documents
    * with < 3 tokens drop (score undefined, stated not imputed).
    */
  def trigramLogprob(
      docs: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      smoothing: KneserNey,
      hashKeys: Boolean = false): DataFrame = {
    val uni = graft.plans.Plans.barrier(
      reference.select(explode(toks(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c_a")))
    val bi = reference.select(explode(bigrams(col(textCol))).as("ab"))
      .groupBy("ab").agg(count(lit(1)).as("c_ab"))
    val tri = reference.select(explode(trigrams(col(textCol))).as("abc"))
      .groupBy("abc").agg(count(lit(1)).as("c_abc"))
    scoreDocs3(docs, idCol, textCol, uni, bi, tri, smoothing, hashKeys)
  }

  /** The KN-3 scoring chain over prepared count tables `uni(w, c_a)`
    * / `bi(ab, c_ab)` / `tri(abc, c_abc)` — the batch-probe leg both
    * [[trigramLogprob]] (fresh train) and [[scoreAgainstLmIndex]]
    * (persisted train, `lm_order = 3`) execute. `hashKeys` follows
    * the order-2 contract: join keys reduce to xxhash64 before the
    * shuffle, gram text still flows through the derivations.
    */
  private def scoreDocs3(docs: DataFrame, idCol: String, textCol: String,
      uni: DataFrame, bi: DataFrame, tri: DataFrame,
      smoothing: KneserNey, hashKeys: Boolean): DataFrame = {
    def key(c: org.apache.spark.sql.Column) =
      if (hashKeys) xxhash64(c) else c
    // bi feeds c_ab, nctx2 AND the B-types scalar; tri feeds c_abc
    // and three continuation groupBys — barrier both so the fresh-
    // train path computes each corpus groupBy once
    val biEff = graft.plans.Plans.barrier(bi.select("ab", "c_ab"))
    val triEff = graft.plans.Plans.barrier(tri.select("abc", "c_abc"))
    val vocab = uni.agg(count(lit(1)).as("v"))
      .crossJoin(biEff.agg(count(lit(1)).as("bt")))
    val parts = triEff.select(split(col("abc"), " ").as("p"))
      .select(
        concat(col("p").getItem(0), lit(" "), col("p").getItem(1)).as("ab"),
        concat(col("p").getItem(1), lit(" "), col("p").getItem(2)).as("bc"),
        col("p").getItem(1).as("b"))
    // N1+(ab·) pre-joins INTO the bigram count table (both keyed on
    // the prefix bigram; every trigram prefix is a reference bigram,
    // so the left join keeps all n1p3 rows) — one count-table-sized
    // join replaces a doc-occurrence-sized shuffle join (guide §2.4;
    // r14 plan diff: 6 doc-side joins → 5).
    val n1p3 = parts.groupBy("ab").agg(count(lit(1)).as("n1p3"))
      .select(key(col("ab")).as("abk"), col("n1p3"))
    val abSide = biEff.select(key(col("ab")).as("abk"), col("c_ab"))
      .join(n1p3, Seq("abk"), "left")
    val nctx3 = parts.groupBy("bc").agg(count(lit(1)).as("nctx3"))
      .select(key(col("bc")).as("bck"), col("nctx3"))
    val mid = parts.groupBy("b").agg(count(lit(1)).as("nmid"),
        count_distinct(col("bc")).as("n1pmid"))
      .select(key(col("b")).as("bk"), col("nmid"), col("n1pmid"))
    val nctx2 = biEff.select(split(col("ab"), " ").getItem(1).as("c2"))
      .groupBy("c2").agg(count(lit(1)).as("nctx2"))
      .select(key(col("c2")).as("ck"), col("nctx2"))
    val joined = docs
      .select(col(idCol), explode(trigrams(col(textCol))).as("abc"))
      .withColumn("p", split(col("abc"), " "))
      .withColumn("ab",
        concat(col("p").getItem(0), lit(" "), col("p").getItem(1)))
      .withColumn("bc",
        concat(col("p").getItem(1), lit(" "), col("p").getItem(2)))
      .withColumn("abck", key(col("abc")))
      .withColumn("abk", key(col("ab")))
      .withColumn("bck", key(col("bc")))
      .withColumn("bk", key(col("p").getItem(1)))
      .withColumn("ck", key(col("p").getItem(2)))
      .drop("p")
      .join(triEff.select(key(col("abc")).as("abck"), col("c_abc")),
        Seq("abck"), "left")
      .join(abSide, Seq("abk"), "left")
      .join(nctx3, Seq("bck"), "left")
      .join(mid, Seq("bk"), "left")
      .join(nctx2, Seq("ck"), "left")
      .crossJoin(broadcast(vocab))
    val d = lit(smoothing.discountPermille.toDouble / 1000.0d)
    val pc = (coalesce(col("nctx2"), lit(0L)) + lit(1L)).cast("double") /
      (col("bt") + col("v")).cast("double")
    val p2 = when(coalesce(col("nmid"), lit(0L)) > 0,
      greatest(coalesce(col("nctx3"), lit(0L)).cast("double") - d,
          lit(0.0d)) / col("nmid").cast("double") +
        ((d * col("n1pmid").cast("double")) / col("nmid").cast("double"))
          * pc)
      .otherwise(pc)
    val p3 = when(
      coalesce(col("c_ab"), lit(0L)) > 0 &&
        coalesce(col("n1p3"), lit(0L)) > 0,
      greatest(coalesce(col("c_abc"), lit(0L)).cast("double") - d,
          lit(0.0d)) / col("c_ab").cast("double") +
        ((d * col("n1p3").cast("double")) / col("c_ab").cast("double"))
          * p2)
      .otherwise(p2)
    val term = F.round(log(p3), 6).cast("decimal(28,6)")
    joined
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_trigrams"),
        count(when(col("c_abc").isNull, 1)).as("n_unseen"),
        sum(term).as("s"))
      .select(col(idCol), col("n_trigrams"), col("n_unseen"),
        F.round(col("s").cast("double") / col("n_trigrams").cast("double"),
          6).as("avg_logprob"))
  }

  /** Metadata columns every [[bigramLmIndex]] / [[trigramLmIndex]]
    * row carries and [[scoreAgainstLmIndex]] validates (the q110
    * MinHash-index discipline: a mismatched probe FAILS instead of
    * silently scoring against the wrong model).
    */
  private[graft] val IndexMetaCols =
    Seq("lm_order", "smoothing_k", "ref_rows", "ref_fp")

  /** The persisted form of the bigram LM — CCNet's production shape:
    * the reference corpus is tokenized and counted ONCE, the count
    * tables land in parquet, and every subsequent scoring batch pays
    * only its own tokenize + two keyed joins (O(batch), the corpus
    * text is never rescanned). One table, two row kinds:
    * `kind='uni'` rows are `(g=word, c=c_a)`, `kind='bi'` rows are
    * `(g=bigram, c=c_ab)`; V = count of uni rows, derived on read.
    *
    * Self-describing metadata rides on every row as RLE'd constants:
    * `lm_order`/`smoothing_k` pin the model family; `ref_rows` +
    * `ref_fp` ([[referenceFingerprint]]'s order-independent
    * XOR+SUM hash combine) fingerprint the TRAINING INPUT,
    * so [[indexedBigramLogprob]] can prove an on-disk index still
    * matches the reference slice before trusting it.
    */
  def bigramLmIndex(reference: DataFrame, textCol: String,
      smoothing: Smoothing = AddK(1)): DataFrame =
    bigramLmIndex(reference, textCol, smoothing,
      graft.ops.ArtifactIndex.fingerprint(reference, textCol))

  /** [[bigramLmIndex]] with the corpus signature supplied by the
    * caller — the seam the freshness modes share: fingerprint-signed
    * artifacts pass the scan pair, token-signed ones pass
    * (ArtifactIndex.TokenRows, token). */
  def bigramLmIndex(reference: DataFrame, textCol: String,
      smoothing: Smoothing, sig: (Long, Long)): DataFrame = {
    val uni = reference.select(explode(toks(col(textCol))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .withColumn("kind", lit("uni"))
    val bi = reference.select(explode(bigrams(col(textCol))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .withColumn("kind", lit("bi"))
    val fp = sig
    uni.unionByName(bi)
      .select(col("kind"), col("g"), col("c"),
        lit(2).as("lm_order"), lit(smoothing.code).as("smoothing_k"),
        lit(fp._1).as("ref_rows"), lit(fp._2).as("ref_fp"))
  }

  /** The persisted form of the ORDER-3 Kneser-Ney LM — the
    * [[bigramLmIndex]] artifact format one order up (the format was
    * designed order-agnostic: `lm_order`/`smoothing_k` metadata
    * already dispatch the scorer). Three row kinds: `kind='uni'`
    * (word, c_a), `kind='bi'` (bigram, c_ab), `kind='tri'` (trigram,
    * c_abc); every continuation statistic the KN-3 chain needs
    * derives from the bi/tri tables on read, so the artifact stays
    * pure counts — no derived table can go stale independently.
    */
  def trigramLmIndex(reference: DataFrame, textCol: String,
      smoothing: KneserNey): DataFrame =
    trigramLmIndex(reference, textCol, smoothing,
      graft.ops.ArtifactIndex.fingerprint(reference, textCol))

  /** [[trigramLmIndex]] with the corpus signature supplied by the
    * caller — the freshness seam, exactly [[bigramLmIndex]]'s. */
  def trigramLmIndex(reference: DataFrame, textCol: String,
      smoothing: KneserNey, sig: (Long, Long)): DataFrame = {
    val uni = reference.select(explode(toks(col(textCol))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .withColumn("kind", lit("uni"))
    val bi = reference.select(explode(bigrams(col(textCol))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .withColumn("kind", lit("bi"))
    val tri = reference.select(explode(trigrams(col(textCol))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .withColumn("kind", lit("tri"))
    uni.unionByName(bi).unionByName(tri)
      .select(col("kind"), col("g"), col("c"),
        lit(3).as("lm_order"), lit(smoothing.code).as("smoothing_k"),
        lit(sig._1).as("ref_rows"), lit(sig._2).as("ref_fp"))
  }

  /** (row count, combined hash fingerprint) of a reference slice —
    * [[graft.ops.ArtifactIndex.fingerprint]] (the XOR+SUM combine
    * moved there r11 when the index discipline was extracted; this
    * forwarder keeps the historical call sites and name). */
  def referenceFingerprint(reference: DataFrame, textCol: String): (Long, Long) =
    graft.ops.ArtifactIndex.fingerprint(reference, textCol)

  /** Score a batch against a persisted [[bigramLmIndex]] or
    * [[trigramLmIndex]] — output contract of [[bigramLogprob]] /
    * [[trigramLogprob]] respectively. Validates the index's
    * self-describing metadata (limit-1 scan) and DISPATCHES the
    * scorer from it: `lm_order` picks the order (2 → bigram chain,
    * 3 → the KN-3 chain, Kneser-Ney only), then add-k for
    * `smoothing_k` = k >= 1, interpolated (λ = -smoothing_k ‰) for
    * negative values, so a probe against a model family this engine
    * doesn't implement fails loudly. Pass
    * `expected` to additionally pin the family the CALLER wants (a
    * nightly job configured for add-one must not silently start
    * producing interpolated scores because someone rebuilt the
    * artifact).
    */
  def scoreAgainstLmIndex(index: DataFrame, docs: DataFrame,
      idCol: String, textCol: String,
      expected: Option[Smoothing] = None,
      hashKeys: Boolean = false): DataFrame = {
    require(IndexMetaCols.forall(index.columns.contains),
      s"index carries no LM metadata (${IndexMetaCols.mkString("/")}) — " +
        "rebuild it with LmFilter.bigramLmIndex")
    // an EMPTY index is a broken artifact, not a tiny model: scoring
    // against it would return all-unseen scores with V=0 — fail loudly
    // instead (ADVICE r10; the build-or-reuse loop never writes one
    // because the corpus fingerprint of a non-empty reference implies
    // non-empty count tables)
    val meta = index.select("lm_order", "smoothing_k").head(1)
    require(meta.nonEmpty,
      "LM index is empty — rebuild it with LmFilter.bigramLmIndex " +
        "over a non-empty reference")
    val (order, smoothing) = meta.map { r =>
      val o = r.getInt(0)
      require(o == 2 || o == 3,
        s"index is an order-$o model but this scorer implements " +
          "orders 2 and 3")
      val s = decodeSmoothing(r.getInt(1))
      require(o == 2 || s.isInstanceOf[KneserNey],
        s"order-3 scoring is implemented for the Kneser-Ney family " +
          s"only, but the index was built for $s")
      expected.foreach(e => require(e == s,
        s"index was built for smoothing $s but the caller expects $e"))
      (o, s)
    }.head
    val uni = index.filter(col("kind") === "uni")
      .select(col("g").as("w"), col("c").as("c_a"))
    val bi = index.filter(col("kind") === "bi")
      .select(col("g").as("ab"), col("c").as("c_ab"))
    if (order == 2)
      scoreDocs(docs, idCol, textCol, uni, bi, smoothing, hashKeys)
    else {
      val tri = index.filter(col("kind") === "tri")
        .select(col("g").as("abc"), col("c").as("c_abc"))
      scoreDocs3(docs, idCol, textCol, uni, bi, tri,
        smoothing.asInstanceOf[KneserNey], hashKeys)
    }
  }

  /** Build-or-reuse the persisted index at `path`, then score: the
    * train-once/score-many loop in one call ([[graft.ops
    * .ArtifactIndex.buildOrReuse]] — validation, staged-swap rebuild,
    * and the torn-artifact logging all live there). An existing index
    * is trusted only if its stored signature matches the CURRENT
    * reference slice, where the signature is the caller's
    * `freshness` choice:
    *
    *  - `Fingerprint` (default): one reference scan per probe —
    *    orders cheaper than the retrain it saves, but at 100 TB the
    *    validation scan dominates the O(batch) probe it guards.
    *  - `Token(v)`: a metadata-sized corpus version (a VersionedTable
    *    commit, an ingest ledger sequence) — the probe compares two
    *    longs and NEVER scans the reference; a stale token still
    *    rebuilds. The production cost model: O(batch + metadata).
    *
    * ANY validation/read failure means "rebuild" (not just a missing
    * path): a half-written index from a crashed writer, a schema
    * drift, or a corrupt footer must trigger retraining, never an
    * abort.
    */
  def indexedBigramLogprob(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      reference: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      smoothing: Smoothing = AddK(1),
      freshness: graft.ops.ArtifactIndex.Freshness =
        graft.ops.ArtifactIndex.Fingerprint,
      hashKeys: Boolean = false): DataFrame = {
    val sig = graft.ops.ArtifactIndex.signature(freshness, reference, textCol)
    val idx = graft.ops.ArtifactIndex.buildOrReuse(spark, path,
      IndexMetaCols, r =>
        (r.getInt(0), r.getInt(1)) == ((2, smoothing.code)) &&
          (r.getLong(2), r.getLong(3)) == sig) { staging =>
      bigramLmIndex(reference, textCol, smoothing, sig)
        .write.mode("overwrite").parquet(staging)
    }
    scoreAgainstLmIndex(idx, docs, idCol, textCol,
      expected = Some(smoothing), hashKeys = hashKeys)
  }

  /** Build-or-reuse the ORDER-3 KN index at `path`, then score —
    * [[indexedBigramLogprob]] one order up: same freshness modes,
    * same staged-swap rebuild, same metadata validation (the stored
    * `lm_order` must be 3 and the smoothing code must match, so an
    * order switch reads as a signature mismatch and rebuilds its own
    * artifact rather than thrashing a bigram one — give each order
    * its own path).
    */
  def indexedTrigramLogprob(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      reference: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      smoothing: KneserNey,
      freshness: graft.ops.ArtifactIndex.Freshness =
        graft.ops.ArtifactIndex.Fingerprint,
      hashKeys: Boolean = false): DataFrame = {
    val sig = graft.ops.ArtifactIndex.signature(freshness, reference, textCol)
    val idx = graft.ops.ArtifactIndex.buildOrReuse(spark, path,
      IndexMetaCols, r =>
        (r.getInt(0), r.getInt(1)) == ((3, smoothing.code)) &&
          (r.getLong(2), r.getLong(3)) == sig) { staging =>
      trigramLmIndex(reference, textCol, smoothing, sig)
        .write.mode("overwrite").parquet(staging)
    }
    scoreAgainstLmIndex(idx, docs, idCol, textCol,
      expected = Some(smoothing), hashKeys = hashKeys)
  }
}
