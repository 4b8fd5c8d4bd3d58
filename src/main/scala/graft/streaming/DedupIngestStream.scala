package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.storage.StorageLevel

import graft.operators.DedupIngest
import graft.sync.BucketedTableStore

/** Dedup-on-ingest under Structured Streaming: each micro-batch of
  * arriving documents is admit/reject-screened against the persisted
  * fingerprint index ([[DedupIngest]]) inside `foreachBatch`, and the
  * admissions' fingerprints delta-merge forward before the next batch —
  * the continuous form of q150's sequential ingest, sharing every
  * operator piece with the batch form.
  *
  * Replay safety (a crash between `foreachBatch` side effects and the
  * checkpoint commit re-delivers the batch) is a write-ahead decision
  * log: decisions land durably under `decisionsDir/batch_id=<k>` BEFORE
  * the index mutates, and a re-delivered batch whose decisions already
  * exist SKIPS the decide step — recomputing against the already-mutated
  * index would flip its own admissions into rejections. The index merge
  * then re-applies FROM the logged decisions:
  * [[DedupIngest.applyAdmissions]] is idempotent (same-key upsert layers
  * resolve to the same table), so applying it once or twice is
  * indistinguishable. Net: decisions are computed exactly once, index
  * state is exactly-once-equivalent, end to end at-least-once only in
  * files written.
  *
  * A torn decision write (crash mid-parquet-job) is detected by the
  * missing `_SUCCESS` marker and overwritten cleanly on replay — the
  * index is untouched at that point, so the recompute is still against
  * the pre-batch snapshot.
  */
final class DedupIngestStream(spark: SparkSession, root: String,
    decisionsDir: String, nBuckets: Int = 32, shingleN: Int = 3,
    numHashes: Int = 8, rowsPerBand: Int = 2,
    now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())) {

  private val store = new BucketedTableStore(spark, root, nBuckets,
    deltaMerges = true, autoCompactAfter = 8)

  /** Arriving-document schema: newline-JSON `{doc_id, text}` lines. */
  val docSchema: StructType = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  /** Seed the index from an initial corpus (may be empty — the store
    * still needs its keyed table created before the stream starts). */
  def seed(corpus: DataFrame): Unit =
    store.writeAll("fp",
      DedupIngest.fingerprints(corpus, shingleN, numHashes, rowsPerBand)
        .select(col("fp")).distinct()
        .withColumn("syncTimestamp", org.apache.spark.sql.functions.lit(now())),
      "fp")

  private def batchDir(batchId: Long) =
    Paths.get(decisionsDir, s"batch_id=$batchId")

  private def decided(batchId: Long): Boolean =
    Files.exists(batchDir(batchId).resolve("_SUCCESS"))

  /** One micro-batch, replay-safe; exposed for direct spec drive. */
  def ingest(batch: DataFrame, batchId: Long): Unit = {
    val fps = DedupIngest
      .fingerprints(batch, shingleN, numHashes, rowsPerBand)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (!decided(batchId)) {
        // WAL: decisions durable before any index mutation. Overwrite
        // mode clears a torn dir from a previous crash.
        DedupIngest.decide(store, batch, fps, batchId)
          .drop("batch_id") // encoded by the directory, like a partition
          .write.mode("overwrite").parquet(batchDir(batchId).toString)
      }
      val dec = spark.read.parquet(batchDir(batchId).toString)
      DedupIngest.applyAdmissions(store, fps, dec, now())
    } finally fps.unpersist()
  }

  /** Stream a directory of document JSON files through the screen.
    * `maxFilesPerTrigger` bounds backfill batches exactly like
    * [[CdcStream.start]] — a replayed backlog must not arrive as one
    * giant micro-batch. */
  def start(inputDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None) = {
    val reader = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.fold(reader)(n =>
        reader.option("maxFilesPerTrigger", n))
      .json(inputDir)
      .writeStream
      .queryName("dedup-ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, batchId: Long) => ingest(batch, batchId))
      .start()
  }
}
