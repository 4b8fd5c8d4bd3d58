package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.CdcSchemas

/** Continuous CDC schema-drift monitor — q234's batch detector AT THE
  * DOOR: every micro-batch of envelopes is checked for NewImage
  * attributes outside the typed extraction's projection lists
  * ([[CdcSchemas.extractedAttrs]]) and one drift row per (entity, field)
  * lands in the sink — the standing alarm that the producer started
  * shipping columns the fixed-schema pipeline (the reference's MV,
  * ref scripts/setup_redshift.sh:91-104) would silently drop forever.
  *
  * STATELESS like QualityGateStream/VocabDriftStream: the monitor never
  * mutates anything, so identical input yields identical drift rows and
  * the batchId-guarded sink (staging dir + atomic rename = the commit
  * mark) alone makes re-delivered batches inert. Mirrored contracts:
  *   - ROTATE-TOGETHER: a fresh checkpoint next to a sink already
  *     holding batch=* rows is refused up front;
  *   - EVERY ROW COUNTS: envelopes whose dynamodb body or pk the reader
  *     could not fill are counted per batch (n_unfillable on every drift
  *     row) instead of silently vanishing from the field statistics;
  *     batches whose only content is unfillable or REMOVE rows commit an
  *     EMPTY batch dir — the commit mark still lands.
  *
  * Scale shape: per batch one map explode + one broadcast anti-join of
  * the (entity, field) projection list + a per-field aggregate — cost
  * tracks the BATCH, nothing reads the standing corpus.
  */
object SchemaDriftStream {

  /** Entity routing by pk prefix — the single-table design's
    * discriminator (ref lib/lambda/index.ts:87, 113-117). */
  private def entityOf(pk: org.apache.spark.sql.Column) =
    when(pk.startsWith("MQ#"), lit("member_quest"))
      .when(pk.startsWith("M_"), lit("member"))
      .otherwise(lit("quest"))

  /** Drift rows for ONE batch of envelope rows (shared by the stream
    * and by tests that want the frame without a streaming harness). */
  private[graft] def driftFrame(spark: SparkSession, batch: DataFrame,
      batchId: Long, nUnfillable: Long): DataFrame = {
    import spark.implicits._
    val known = CdcSchemas.extractedAttrs.toDF("entity", "field")
    batch
      .select(col("dynamodb.Keys.pk.S").as("pk"),
        col("dynamodb.ApproximateCreationDateTime").as("ms"),
        explode(col("dynamodb.NewImage")).as(Seq("field", "v")))
      .withColumn("entity", entityOf(col("pk")))
      .join(broadcast(known), Seq("entity", "field"), "left_anti")
      .groupBy(col("entity"), col("field"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ms")).as("first_seen_ms"),
        count(col("v.N")).as("n_numeric"))
      .select(lit(batchId).as("batch_id"), col("entity"), col("field"),
        col("n_events"), col("first_seen_ms"), col("n_numeric"),
        lit(nUnfillable).as("n_unfillable"))
  }

  /** Drive an envelope stream against the projection lists. Drift rows
    * land under `sinkDir/batch=<id>/` via the staging-dir +
    * atomic-rename commit protocol (QualityGateStream's crash story). */
  def run(spark: SparkSession, stream: DataFrame, sinkDir: String,
      trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    MonitorSink.start(stream, sinkDir, "drift rows", trigger) {
      (batch, batchId) =>
        val unfillable =
          col("dynamodb").isNull || col("dynamodb.Keys.pk.S").isNull
        val nBad = batch.filter(unfillable).count()
        driftFrame(spark, batch.filter(!unfillable), batchId, nBad)
          .coalesce(1)
    }
}
