package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.Plans.barrier

/** Paragraph / segment-level exact deduplication — the C4 /
  * RefinedWeb "remove repeated boilerplate spans" primitive: dedup at
  * a granularity FINER than the document, then reconstruct each
  * document from its surviving segments. Reference behavior covered:
  * datanika's document dedup family (`tasks/benchmark_dedup.py`)
  * extended to the sub-document granularity an LLM training pipeline
  * needs (navbars, license headers, quote chains repeat across pages
  * that are NOT near-duplicates of each other as whole docs).
  *
  * Global first-occurrence wins: a segment is kept on the
  * lexicographically smallest (doc_id, pos) at which its exact text
  * appears anywhere in the corpus; every later copy is dropped.
  *
  * 100 TB shape:
  *  - the winner election groups on (xxhash64(seg), length(seg)) —
  *    an 8-byte + 4-byte key, never the segment text — and
  *    `min(struct(doc_id, pos))` is a partially-aggregatable agg, so
  *    a boilerplate segment repeated a billion times collapses to ONE
  *    row per map task before the shuffle (skew-safe where a window
  *    `row_number() OVER (PARTITION BY seg)` would funnel every copy
  *    into one reducer).
  *  - the join back is winners (one row per DISTINCT segment) against
  *    the segment stream on the same hash key — per-key build side is
  *    a single row, so AQE's skew split applies cleanly.
  *  - reconstruction groups by doc_id: per-group state is bounded by
  *    one document's own segments (collect_list here is per-doc, not
  *    per-corpus).
  */
object SegmentDedup {

  /** Fixed `words`-word windows of a single-space text, as an array
    * column — the segmenter used when the corpus has no natural
    * paragraph breaks. For text with real structure, pass the
    * segments yourself via `dedupSegmentsOf` (e.g.
    * `split(text, "\n\n")`).
    */
  def wordChunks(text: Column, words: Int): Column = {
    val toks = split(trim(text), " ")
    // ceil(n / words) without double math: (n + words - 1) / words
    val nseg = floor((size(toks) + lit(words - 1)) / lit(words)).cast("int")
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nseg - 1),
        i => array_join(slice(toks, i * words + 1, lit(words)), " ")))
  }

  /** Explode docs into (doc_id, pos, seg) rows for an arbitrary
    * segment-array expression.
    */
  def segments(docs: DataFrame, idCol: String, segArr: Column): DataFrame =
    docs.select(col(idCol).as("doc_id"), posexplode(segArr).as(Seq("pos", "seg")))

  /** First-occurrence segment dedup + document reconstruction over an
    * arbitrary segmenter. Returns one row per input doc:
    * (doc_id, n_segs, n_kept, text_kept) — text_kept is the doc's
    * surviving segments re-joined in original order ("" when every
    * segment lost its election).
    */
  def dedupSegmentsOf(docs: DataFrame, idCol: String, segArr: Column): DataFrame = {
    // barrier: totals + election + join-back all fan out from ONE
    // materialized segment explode
    val segs = barrier(segments(docs, idCol, segArr))
    val keyed = segs
      .withColumn("h", xxhash64(col("seg")))
      .withColumn("slen", length(col("seg")))
    // q22 precedent: hash + length as the election key — the shuffle
    // never carries segment text twice, and length guards h collisions
    val winners = keyed.groupBy("h", "slen")
      .agg(min(struct(col("doc_id"), col("pos"))).as("w"))
      .select(col("h"), col("slen"),
        col("w.doc_id").as("w_doc"), col("w.pos").as("w_pos"))
    val kept = keyed.join(winners,
      keyed("h") === winners("h") && keyed("slen") === winners("slen") &&
        keyed("doc_id") === winners("w_doc") && keyed("pos") === winners("w_pos"))
      .select(keyed("doc_id"), keyed("pos"), keyed("seg"))
    reassemble(docs, idCol, segs, kept)
  }

  /** Rebuild per-doc output rows from surviving (doc_id, pos, seg):
    * anchor totals on the DOC LIST, not the exploded segments — a
    * doc with an empty segment array explodes to zero rows and must
    * still get its contracted (doc_id, 0, 0, "") output row.
    */
  private def reassemble(docs: DataFrame, idCol: String,
      segs: DataFrame, kept: DataFrame): DataFrame = {
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
          _.getField("seg")), " ").as("text_kept"))
    docs.select(col(idCol).as("doc_id"))
      .join(segs.groupBy("doc_id").agg(count(lit(1)).as("n_segs")),
        Seq("doc_id"), "left")
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_segs"), lit(0L)).as("n_segs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_kept"), lit("")).as("text_kept"))
  }

  /** Frequency-threshold boilerplate removal — the complement of
    * `dedupSegmentsOf`: first-occurrence dedup keeps ONE copy of a
    * repeated segment somewhere; this drops EVERY copy of any segment
    * whose corpus DOCUMENT frequency exceeds `maxDf` (the CCNet /
    * RefinedWeb rule — a navbar on 10k pages is boilerplate,
    * including its "first" occurrence; a segment repeated only WITHIN
    * one doc — a chorus, a code idiom — is content and survives,
    * hence document frequency, not occurrence count).
    *
    * 100 TB shape: df is computed on (xxhash64(seg), length) keys —
    * distinct (key, doc) then count, both partial-aggregatable
    * 8-byte-key shuffles (a billion-copy navbar collapses map-side;
    * no per-segment window). The blocked set (df > maxDf) is ∝ the
    * boilerplate vocabulary — small — and joins back LEFT ANTI on
    * the hash key; reconstruction groups by doc, per-group state
    * bounded by one document's own segments.
    */
  def dropFrequentSegments(docs: DataFrame, idCol: String,
      segArr: Column, maxDf: Long): DataFrame = {
    require(maxDf >= 1, "maxDf must be >= 1")
    val segs = barrier(segments(docs, idCol, segArr))
    val keyed = segs
      .withColumn("h", xxhash64(col("seg")))
      .withColumn("slen", length(col("seg")))
    val blocked = keyed.select("h", "slen", "doc_id").distinct()
      .groupBy("h", "slen").agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select("h", "slen")
    // broadcast keeps the anti-join map-side: without the hint the
    // corpus-scale segment stream shuffle-writes on (h, slen) with
    // the boilerplate hash as the hot key
    val kept = keyed.join(broadcast(blocked), Seq("h", "slen"), "left_anti")
      .select("doc_id", "pos", "seg")
    reassemble(docs, idCol, segs, kept)
  }

  /** Word-window convenience: segment by fixed `words`-word chunks. */
  def dedupSegments(docs: DataFrame, idCol: String, textCol: String,
      words: Int): DataFrame =
    dedupSegmentsOf(docs, idCol, wordChunks(col(textCol), words))

  /** WITHIN-document first-occurrence dedup — the shuffle-free
    * little sibling of `dedupSegments`: the election scope is one
    * document, so the whole operation is a per-row array expression
    * evaluated at the scan (a doc's repeated quote chains / menu
    * blocks collapse, but segments shared ACROSS docs survive).
    *
    * 100 TB shape: zero exchanges — this runs map-side wherever the
    * corpus already lives, and composes with the streaming path
    * (per-row expressions are trivially incremental). The per-row
    * cost is O(segments²) comparisons within one document, bounded
    * by doc length, not corpus size.
    */
  def dedupSegmentsWithinDoc(docs: DataFrame, idCol: String,
      textCol: String, words: Int): DataFrame = {
    val segs = wordChunks(col(textCol), words)
    // keep segment i iff it does not appear among segments 0..i-1;
    // array_position is 1-based and 0 = absent, i is the 0-based
    // lambda index, so slice(segs, 1, i) is exactly "the prefix"
    val kept = filter(segs, (s, i) => array_position(slice(segs, lit(1), i), s) === 0)
    docs.select(col(idCol).as("doc_id"),
      size(segs).cast("long").as("n_segs"),
      size(kept).cast("long").as("n_kept"),
      array_join(kept, " ").as("text_kept"))
  }
}
