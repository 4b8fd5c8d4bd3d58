package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Continuous distribution-drift monitor — q239's two-sample KS test AT
  * THE DOOR: a frozen reference length-histogram (taken once from the
  * standing corpus, [[freezeReference]]) is compared against every
  * arriving micro-batch, and one verdict row per batch — the exact
  * integer KS rational (ks_num, n_batch, n_ref) plus the τ = 1/4
  * drifted flag — lands in the sink. This is the alarm for producer
  * changes q234/[[SchemaDriftStream]] cannot see: the SCHEMA is intact
  * but the SHAPE moved (a new boilerplate stripper, a truncation bug, a
  * re-crawl of a different page mix).
  *
  * STATELESS like the sibling monitors (QualityGateStream /
  * VocabDriftStream / SchemaDriftStream): the monitor never mutates
  * anything, identical input yields identical verdict rows, and the
  * batchId-guarded sink (staging dir + atomic rename = the commit mark)
  * alone makes re-delivered batches inert. Mirrored contracts:
  *   - ROTATE-TOGETHER: a fresh checkpoint next to a sink already
  *     holding batch=* rows is refused up front;
  *   - EVERY ROW COUNTS: rows whose length the reader could not fill
  *     are counted per batch (n_unfillable) instead of silently
  *     vanishing from the ECDF; a batch with NO fillable rows still
  *     publishes ONE verdict row — n_batch = 0, NULL KS fields, and
  *     the n_unfillable count — because that is exactly the batch
  *     where the producer broke hardest (100% null lengths) and an
  *     empty marker dir would drop the only evidence. No bogus
  *     zero-sample KS statistic is published: the KS columns are NULL.
  *
  * Scale shape: the batch collapses to a per-length histogram in one
  * partial-agg'd pass; the grid is the union of the two value domains
  * (value-domain-bounded, like q236 — bucketize lengths first if the
  * domain is unbounded), the reference rides a broadcast, and the one
  * unpartitioned cum-count window runs over that bounded grid only —
  * never over batch rows. Cost tracks the batch and the value domain.
  */
object DistDriftStream {

  /** The frozen reference histogram: per-length counts of the standing
    * corpus at freeze time. Persist/pass this frame — the monitor never
    * recomputes it, that is what makes the reference FROZEN. */
  def freezeReference(docs: DataFrame): DataFrame =
    docs.groupBy(col("n_chars").as("len")).agg(count(lit(1)).as("c_ref"))

  /** KS verdict row(s) for ONE batch against the frozen reference —
    * q239's exact-integer protocol (no divide anywhere). The exact
    * shape holds while n_batch · n_ref < 2^61 (the `ks_num * 4`
    * comparison), i.e. to ~1.5e9 rows PER SIDE — far past any
    * micro-batch; a reference frozen from a full 100 TB corpus should
    * be downsampled (or the rational computed in DECIMAL(38,0)) past
    * that bound. A batch with no fillable rows yields an EMPTY frame
    * here — [[run]] substitutes the n_batch = 0 sentinel row so
    * n_unfillable still lands. Shared by the stream and parity tests. */
  private[graft] def ksFrame(spark: SparkSession, batch: DataFrame,
      refHist: DataFrame, batchId: Long, nUnfillable: Long): DataFrame = {
    val hb = batch.groupBy(col("n_chars").as("len"))
      .agg(count(lit(1)).as("c_b"))
    val grid = hb.select(col("len"))
      .union(refHist.select(col("len"))).distinct()
      .join(hb, Seq("len"), "left_outer")
      .join(broadcast(refHist), Seq("len"), "left_outer")
      .na.fill(0L, Seq("c_b", "c_ref"))
    // bounded by the length VALUE DOMAIN (q236's argument), never by
    // batch or corpus rows — the lone unpartitioned window in this file
    val wCum = Window.orderBy(col("len").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = grid.agg(sum(col("c_b")).as("n_batch"),
      sum(col("c_ref")).as("n_ref"))
    grid
      .withColumn("cum_b", sum(col("c_b")).over(wCum))
      .withColumn("cum_r", sum(col("c_ref")).over(wCum))
      .crossJoin(broadcast(totals))
      .filter(col("n_batch") > 0)
      .groupBy(col("n_batch"), col("n_ref"))
      .agg(max(abs(col("cum_b") * col("n_ref") - col("cum_r") * col("n_batch")))
        .as("ks_num"))
      .select(lit(batchId).as("batch_id"), col("n_batch"), col("n_ref"),
        col("ks_num"),
        (col("ks_num") * 4 >= col("n_batch") * col("n_ref")).cast("int")
          .as("drifted"),
        lit(nUnfillable).as("n_unfillable"))
  }

  /** Drive a document stream against the frozen reference. Verdict rows
    * land under `sinkDir/batch=<id>/` via the staging-dir +
    * atomic-rename commit protocol (the sibling monitors' crash story). */
  def run(spark: SparkSession, stream: DataFrame, refHist: DataFrame,
      sinkDir: String, trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    MonitorSink.start(stream, sinkDir, "verdict rows", trigger) {
      (batch, batchId) =>
        // one job for both counts: count(col) skips nulls, count(*) doesn't
        val c = batch.agg(count(lit(1)).as("n_all"),
          count(col("n_chars")).as("n_fill")).collect()(0)
        val nBad = c.getLong(0) - c.getLong(1)
        if (c.getLong(1) == 0L)
          // nothing fillable: the n_batch = 0 sentinel (NULL KS fields)
          // carries n_unfillable — an empty marker would drop it
          spark.range(1).select(lit(batchId).as("batch_id"),
            lit(0L).as("n_batch"), lit(null).cast("long").as("n_ref"),
            lit(null).cast("long").as("ks_num"),
            lit(null).cast("int").as("drifted"),
            lit(nBad).as("n_unfillable"))
        else
          ksFrame(spark, batch.filter(col("n_chars").isNotNull), refHist,
            batchId, nBad).coalesce(1)
    }
}
