package graft.plans

import org.apache.spark.sql.DataFrame

/** Plan-shaping utilities. */
object Plans {

  /** Materialization barrier: cuts the Catalyst plan here (lazy local
    * checkpoint → LogicalRDD), so that
    *  1. self-join branches downstream share ONE computation of the
    *     upstream (the scheduler dedupes by RDD identity) instead of
    *     re-running it per branch, and
    *  2. `InferFiltersFromGenerate` / predicate pushdown can no
    *     longer inline an expensive Project alias (e.g. a shingle
    *     set) into scan filters, which would evaluate it 2–3× per
    *     row.
    *
    * The checkpoint blocks live at MEMORY_AND_DISK and are reclaimed
    * by the ContextCleaner when the frame is no longer referenced —
    * unlike `persist()`, nothing leaks into the CacheManager. Use
    * after expensive per-row sketch columns and before
    * explode/self-join fan-out; the materialized slice should be the
    * compact sketch projection (ids + hashes), never raw documents.
    */
  def barrier(df: DataFrame): DataFrame =
    if (explainMode) df else df.localCheckpoint(eager = false)

  /** DIAGNOSTIC ONLY (graft.tools.PlanDump): a localCheckpoint cuts
    * `explain` at the barrier — the dumped plan shows `Scan
    * ExistingRDD` instead of the upstream pipeline. Setting this
    * makes [[barrier]] the identity so a plan dump shows the WHOLE
    * operator shape (the barrier is semantics-neutral: it only pins
    * shared materialization). Never set on an executing session —
    * self-join branches would recompute their upstream.
    */
  @volatile private[graft] var explainMode: Boolean = false
}
