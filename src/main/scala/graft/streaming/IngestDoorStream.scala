package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.storage.StorageLevel

import graft.operators.{CorpusSink, IngestDoor}
import graft.sync.BucketedTableStore

/** Any [[IngestDoor]] under Structured Streaming: each micro-batch is
  * admit/reject-screened against the door's persisted index inside
  * `foreachBatch`, and the admissions delta-merge forward before the
  * next batch. One implementation of the replay-safety machinery for
  * ALL doors (text, spans, embeddings, media) — the per-door streaming
  * classes are façades over this, so the WAL contract cannot drift
  * between them the way the door bodies once did:
  *
  *   - decisions land durably under `decisionsDir/batch_id=<k>` BEFORE
  *     the index mutates (write-ahead log); a re-delivered batch whose
  *     decisions exist SKIPS the decide step — recomputing against the
  *     already-mutated index would flip its own admissions into
  *     rejections;
  *   - the index merge re-applies FROM the logged decisions, and every
  *     door's `applyAdmissions` is idempotent, so once or twice is
  *     indistinguishable;
  *   - a torn decision write (crash mid-parquet-job, no `_SUCCESS`) is
  *     overwritten cleanly on replay — the index is untouched at that
  *     point, so the recompute still sees the pre-batch snapshot;
  *   - the WAL and the checkpoint must rotate together — both mismatch
  *     directions are refused up front ([[WalGuards]]).
  *
  * With `corpusDir` set, each batch's ADMITTED rows additionally land in
  * a [[CorpusSink]] corpus (batchId-guarded appends — a re-delivered
  * epoch is inert there too). Rows missing any of `cleanCols` are
  * dropped up front — a null id would emit a meaningless decision row
  * and a null payload an unprobeable index entry; an upstream needing
  * dead-letter visibility pre-splits them (the [[DedupIngestStream]]
  * contract caveat, now shared).
  */
final class IngestDoorStream(spark: SparkSession, door: IngestDoor,
    root: String, decisionsDir: String, nBuckets: Int,
    cleanCols: Seq[String],
    now: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
    corpusDir: Option[String] = None, corpusShards: Int = 8,
    queryName: String = "ingest-door") {

  private val store = new BucketedTableStore(spark, root, nBuckets,
    deltaMerges = true, autoCompactAfter = 8)

  /** Seed the door's index from an initial corpus (may be empty — the
    * keyed table must exist before the first probe); with `corpusDir`
    * set the seed rows also become the corpus terminal's initial shards
    * (the manifest must exist before the first append). */
  def seed(corpus: DataFrame): Unit = {
    door.seedIndex(spark, store, corpus, now())
    corpusDir.foreach(d =>
      CorpusSink.writeShards(corpus, d, nShards = corpusShards))
  }

  private def batchDir(batchId: Long) =
    Paths.get(decisionsDir, s"batch_id=$batchId")

  /** Whether batch `batchId`'s decisions are durably logged. */
  def decided(batchId: Long): Boolean =
    Files.exists(batchDir(batchId).resolve("_SUCCESS"))

  /** Dedup-horizon maintenance between micro-batches
    * ([[IngestDoor.retireBefore]] on this stream's store): run it while
    * the query is idle (between triggers, or from a scheduled
    * maintenance pass) — it only tombstones entries stamped before
    * `cutoff`, so it composes with the WAL exactly like a compaction
    * does: replayed batches re-apply their logged decisions regardless
    * of what has since retired. Returns the retired-entry count. */
  def retireBefore(cutoff: Timestamp): Long =
    door.retireBefore(store, cutoff, now())

  /** One micro-batch, replay-safe; exposed for direct spec drive. */
  def ingest(batch: DataFrame, batchId: Long): Unit = {
    // persisted for the batch's scope: the cleaned frame feeds the probe
    // derivation, decide's projection, AND the admitted-rows corpus
    // append — without the persist each consumer re-reads the source
    val clean = batch
      .filter(cleanCols.map(col(_).isNotNull).reduce(_ && _))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val probe = door.probeFrame(spark, clean)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (!decided(batchId)) {
        // WAL: decisions durable before any index mutation. Overwrite
        // mode clears a torn dir from a previous crash.
        door.decide(spark, store, clean, probe, batchId)
          .drop("batch_id") // encoded by the directory, like a partition
          .write.mode("overwrite").parquet(batchDir(batchId).toString)
      }
      val dec = spark.read.parquet(batchDir(batchId).toString)
      door.applyAdmissions(store, probe, dec, now())
      // corpus terminal last: if we crash before this, the replay skips
      // decide (WAL), re-applies the idempotent index merge, and lands
      // the append then — the batchId guard makes a DOUBLE append
      // (crash after append, before checkpoint commit) equally inert
      corpusDir.foreach { d =>
        val admitted = clean.join(
          dec.filter(col("admitted") === 1).select(col(door.idCol)),
          Seq(door.idCol), "left_semi")
        CorpusSink.appendShards(admitted, d, batchId = Some(batchId))
      }
    } finally { probe.unpersist(); clean.unpersist() }
  }

  /** Drive a streaming source frame through the door. The façades build
    * the schema'd reader; this owns the guards and the foreachBatch. */
  def start(source: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    // the WAL is keyed by the checkpoint's batchIds — both mismatch
    // directions (fresh checkpoint + used WAL, used checkpoint + WAL
    // missing committed batches' decisions) corrupt decisions
    WalGuards.requireRotatedTogether(checkpointDir, decisionsDir, decided)
    // same batchId-reuse hazard one layer down: a fresh checkpoint's
    // batch 0 would hit the CORPUS manifest's replay guard and silently
    // skip appending the new admissions — refuse the pairing up front
    val fresh = !Files.exists(Paths.get(checkpointDir, "offsets"))
    corpusDir.foreach { d =>
      require(!(fresh && CorpusSink.committedBatches(d).nonEmpty),
        s"corpusDir $d has batchId-guarded appends from a previous run " +
          s"but checkpointDir $checkpointDir is fresh (batchIds restart " +
          "at 0) — rotate corpusDir together with the checkpoint")
    }
    source.writeStream
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, batchId: Long) => ingest(batch, batchId))
      .start()
  }
}
