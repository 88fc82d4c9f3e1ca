package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.Plans.barrier

/** Exact-substring span excision (the ExactSubstr shape from Lee et
  * al. 2022, "Deduplicating Training Data Makes Language Models
  * Better"): any k-token window that occurs MORE THAN ONCE in the
  * corpus is a duplicated span; every occurrence except the globally
  * canonical one (min (doc_id, pos)) is excised from its document,
  * token by token. Unlike q23/q25's document-level near-dup passes,
  * this removes the duplicated BYTES while keeping the rest of the
  * document — the treatment web-crawl corpora need for boilerplate
  * sentences and quoted passages that recur across otherwise-unique
  * pages.
  *
  * Reference anchor: the dedup/cleaning stage the reference's
  * transformation service orchestrates per upload
  * (datanika/services/transformation_service.py) — this is the
  * span-level member of that family.
  *
  * Scale notes (100 TB):
  *  - The suffix-array construction of the paper is replaced by the
  *    fixed-window rolling form: one explode into (doc, pos, gram)
  *    and ONE partial-aggregable groupBy on the gram. No sorting of
  *    the corpus, no driver state.
  *  - The groupBy key is the k-token string so the oracle can
  *    restate it verbatim; at 100 TB prepend xxhash64(gram) to the
  *    shuffle key (bytes-identical semantics, 8-byte partitioning)
  *    or group on the hash and re-verify equality inside the group.
  *  - Coverage expansion is a bounded explode (k rows per excised
  *    window); reassembly is one per-doc aggregate. Every exchange
  *    is keyed; nothing is ever collected to the driver.
  */
object ExactSubstr {

  /** Per-document excision census: (doc_id, n_tokens, n_removed,
    * cleaned) where `cleaned` is the document with every
    * non-canonical duplicated window removed (surviving tokens
    * re-joined by single spaces, original order).
    */
  def excise(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    require(k >= 2, s"window size must be >= 2, got $k")
    // barrier: the tokenization feeds the gram pass, the token
    // re-assembly, AND the final length census — one split, not three
    val toks = barrier(docs.select(col(idCol).cast("long").as("doc_id"),
      split(col(textCol), " ").as("ts")))

    // every k-token window with its 1-based start position
    val grams = toks.select(col("doc_id"),
        explode(when(size(col("ts")) >= k,
            transform(sequence(lit(1), size(col("ts")) - (k - 1)),
              i => struct(i.cast("long").as("pos"),
                concat_ws(" ", slice(col("ts"), i, lit(k))).as("gram"))))
          .otherwise(array())).as("w"))
      .select(col("doc_id"), col("w.pos").as("pos"), col("w.gram").as("gram"))

    // one aggregate finds both the duplication count and the
    // canonical (min doc, min pos) occurrence per gram — partial
    // (map-side) aggregation applies to both
    val stats = grams.groupBy("gram")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("canon"))

    // non-canonical occurrences of duplicated grams → excised windows
    val excised = grams
      .join(stats.filter(col("cnt") >= 2).select("gram", "canon"), Seq("gram"))
      .filter(!(col("doc_id") === col("canon.doc_id") &&
        col("pos") === col("canon.pos")))
      .select(col("doc_id"), col("pos"))

    // window → covered token positions (bounded k-way explode);
    // overlapping windows merge via the distinct
    val covered = excised.select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (k - 1))).as("p"))
      .distinct()

    val tokens = toks.select(col("doc_id"),
        posexplode(col("ts")).as(Seq("p0", "token")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"),
        col("token"))

    val keptAgg = tokens.join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("p"), col("token")))),
            x => x.getField("token"))).as("cleaned"))

    toks.select(col("doc_id"), size(col("ts")).cast("long").as("n_tokens"))
      .join(keptAgg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }
}
