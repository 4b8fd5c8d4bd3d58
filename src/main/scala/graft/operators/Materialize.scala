package graft.operators

import org.apache.spark.sql.DataFrame

/** Persist-scope helper for operators whose plan consumes an expensive
  * intermediate from several sides (shingle explosions, band buckets).
  *
  * The pattern it retires: an operator persists an interior frame and
  * returns a LAZY result plan over it — the operator cannot unpersist
  * (the plan would recompute from scratch), so the cached blocks leak
  * until the caller remembers to `clearCache()`. Instead the operator now
  * materializes its (small, bounded — every caller here filters or caps
  * before returning) result eagerly, after which the intermediates are
  * dead weight and are released before the caller sees anything.
  *
  * `localCheckpoint` rather than `persist`: it truncates lineage, so the
  * returned frame no longer references the unpersisted intermediates, and
  * its blocks are NOT a cache-manager entry the caller must clear — they
  * are freed by the context cleaner when the frame is collected. The
  * trade: localCheckpoint blocks are not recomputable, so on a real
  * cluster an executor loss mid-consumption fails the job instead of
  * recomputing — acceptable for bounded result sets; a deployment that
  * cannot retry should set `spark.checkpoint.dir` and swap in reliable
  * `checkpoint()` here.
  */
private[graft] object Materialize {

  /** Eagerly materialize `result`, then unpersist every frame in
    * `intermediates`. Returns the lineage-free materialized frame.
    * The release runs even when materialization throws — a failed
    * checkpoint job must not leave the intermediates pinned in storage
    * memory for the rest of the session. */
  def thenRelease(result: DataFrame, intermediates: DataFrame*): DataFrame =
    try result.localCheckpoint(true)
    finally intermediates.foreach(f =>
      try f.unpersist() catch { case _: Throwable => () })
}
