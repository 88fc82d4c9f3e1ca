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
      textCol: String): DataFrame = {
    // barrier: `uni` feeds BOTH the vocabulary scalar and the c_a
    // join — without the cut the reference tokenize+count runs twice
    val uni = graft.plans.Plans.barrier(
      reference.select(explode(toks(col(textCol))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c_a")))
    val bi = reference.select(explode(bigrams(col(textCol))).as("ab"))
      .groupBy("ab").agg(count(lit(1)).as("c_ab"))
    scoreDocs(docs, idCol, textCol, uni, bi)
  }

  private def toks(c: org.apache.spark.sql.Column) =
    filter(split(lower(c), "\\s+"), t => length(t) > 0)

  private def bigrams(c: org.apache.spark.sql.Column) = {
    val t = toks(c)
    when(size(t) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
  }

  /** Shared scoring chain over prepared count tables `uni(w, c_a)` /
    * `bi(ab, c_ab)` — the batch-probe leg both [[bigramLogprob]]
    * (fresh train) and [[scoreAgainstLmIndex]] (persisted train)
    * execute. V derives from `uni` (1-row broadcast).
    */
  private def scoreDocs(docs: DataFrame, idCol: String, textCol: String,
      uni: DataFrame, bi: DataFrame): DataFrame = {
    val vocab = uni.agg(count(lit(1)).as("v"))
    val term = F.round(log(
      (coalesce(col("c_ab"), lit(0L)) + lit(1)).cast("double") /
        (coalesce(col("c_a"), lit(0L)) + col("v")).cast("double")), 6)
      .cast("decimal(28,6)")
    docs.select(col(idCol), explode(bigrams(col(textCol))).as("ab"))
      .withColumn("a", split(col("ab"), " ").getItem(0))
      .join(bi.select("ab", "c_ab"), Seq("ab"), "left")
      .join(uni.select(col("w").as("a"), col("c_a")), Seq("a"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("c_ab").isNull, 1)).as("n_unseen"),
        sum(term).as("s"))
      .select(col(idCol), col("n_bigrams"), col("n_unseen"),
        F.round(col("s").cast("double") / col("n_bigrams").cast("double"), 6)
          .as("avg_logprob"))
  }

  /** Metadata columns every [[bigramLmIndex]] row carries and
    * [[scoreAgainstLmIndex]] validates (the q110 MinHash-index
    * discipline: a mismatched probe FAILS instead of silently
    * scoring against the wrong model).
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
    * `ref_fp` (count and bit-XOR of xxhash64(text) over the
    * reference — order-independent) fingerprint the TRAINING INPUT,
    * so [[indexedBigramLogprob]] can prove an on-disk index still
    * matches the reference slice before trusting it.
    */
  def bigramLmIndex(reference: DataFrame, textCol: String): DataFrame = {
    val uni = reference.select(explode(toks(col(textCol))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .withColumn("kind", lit("uni"))
    val bi = reference.select(explode(bigrams(col(textCol))).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .withColumn("kind", lit("bi"))
    val fp = referenceFingerprint(reference, textCol)
    uni.unionByName(bi)
      .select(col("kind"), col("g"), col("c"),
        lit(2).as("lm_order"), lit(1).as("smoothing_k"),
        lit(fp._1).as("ref_rows"), lit(fp._2).as("ref_fp"))
  }

  /** (row count, bit-XOR of xxhash64(text)) — an order-independent
    * one-scan fingerprint of a reference slice; two driver scalars.
    */
  def referenceFingerprint(reference: DataFrame, textCol: String): (Long, Long) = {
    val r = reference.agg(count(lit(1)).as("n"),
      coalesce(bit_xor(xxhash64(col(textCol))), lit(0L)).as("fp")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Score a batch against a persisted [[bigramLmIndex]] — same
    * output contract as [[bigramLogprob]]. Validates the index's
    * self-describing metadata (limit-1 scan) so a probe against a
    * different model family fails loudly.
    */
  def scoreAgainstLmIndex(index: DataFrame, docs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    require(IndexMetaCols.forall(index.columns.contains),
      s"index carries no LM metadata (${IndexMetaCols.mkString("/")}) — " +
        "rebuild it with LmFilter.bigramLmIndex")
    index.select("lm_order", "smoothing_k").head(1).foreach { r =>
      val got = (r.getInt(0), r.getInt(1))
      require(got == ((2, 1)),
        s"index is a (order, smoothing)=$got model but this scorer " +
          "implements the add-one bigram LM (2, 1)")
    }
    val uni = index.filter(col("kind") === "uni")
      .select(col("g").as("w"), col("c").as("c_a"))
    val bi = index.filter(col("kind") === "bi")
      .select(col("g").as("ab"), col("c").as("c_ab"))
    scoreDocs(docs, idCol, textCol, uni, bi)
  }

  /** Build-or-reuse the persisted index at `path`, then score: the
    * train-once/score-many loop in one call. An existing index is
    * trusted ONLY if its stored reference fingerprint matches the
    * CURRENT reference slice (one scan — orders of magnitude cheaper
    * than the tokenize+groupBy train it saves); on any mismatch or
    * read failure the index is rebuilt and overwritten. Repeated
    * calls (a nightly scoring job; bench reruns) therefore pay
    * O(batch + one reference scan), the production cost model.
    */
  def indexedBigramLogprob(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      reference: DataFrame,
      docs: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val fp = referenceFingerprint(reference, textCol)
    val reusable =
      try {
        val idx = spark.read.parquet(path)
        IndexMetaCols.forall(idx.columns.contains) &&
          idx.select("lm_order", "smoothing_k", "ref_rows", "ref_fp")
            .head(1).exists(r =>
              (r.getInt(0), r.getInt(1)) == ((2, 1)) &&
                (r.getLong(2), r.getLong(3)) == fp)
      } catch { case _: org.apache.spark.sql.AnalysisException => false }
    if (!reusable)
      bigramLmIndex(reference, textCol).write.mode("overwrite").parquet(path)
    scoreAgainstLmIndex(spark.read.parquet(path), docs, idCol, textCol)
  }
}
