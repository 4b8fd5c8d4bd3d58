package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructType}

import graft.operators.MediaDedupIngest

/** Media dedup-on-ingest under Structured Streaming: each micro-batch of
  * arriving payloads is screened against the persisted perceptual-hash
  * index ([[MediaDedupIngest]] — candidates nominated per band cell,
  * capped at MaxCell, verdict by exact Hamming verify), and the
  * admissions' band rows delta-merge forward before the next batch — the
  * continuous form of q227, sharing every operator piece with the batch
  * form. A façade over [[IngestDoorStream]], which owns the WAL
  * replay-safety contract (decisions durable before index mutation,
  * decide skipped on re-delivery, idempotent re-apply, torn-write
  * recovery, rotate-together guards) for every door.
  *
  * The source is a PARQUET file stream — media payloads are binary, and
  * parquet carries them natively where newline-JSON would need a base64
  * detour. Rows with a null doc_id or payload are dropped up front
  * (same caveat as [[DedupIngestStream]]); sub-64-byte payloads flow
  * through and are always admitted (the q174 floor — no hash, no
  * candidates, no index rows).
  */
final class MediaDedupIngestStream(spark: SparkSession, root: String,
    decisionsDir: String, nBuckets: Int = 16, maxHamming: Int = 10,
    now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())) {

  private val inner = new IngestDoorStream(spark,
    MediaDedupIngest.door(maxHamming), root, decisionsDir, nBuckets,
    cleanCols = Seq("doc_id", "media"), now = now,
    queryName = "media-dedup-ingest")

  /** Arriving-payload schema: parquet rows (doc_id, kind, media). */
  val mediaSchema: StructType = new StructType()
    .add("doc_id", LongType).add("kind", StringType).add("media", BinaryType)

  /** Seed the index from an initial corpus — may be empty. */
  def seed(corpus: DataFrame): Unit = inner.seed(corpus)

  /** One micro-batch, replay-safe; exposed for direct spec drive. */
  def ingest(batch: DataFrame, batchId: Long): Unit =
    inner.ingest(batch, batchId)

  /** Stream a directory of payload parquet files through the screen;
    * WAL and checkpoint must rotate together ([[WalGuards]]). */
  def start(inputDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None) = {
    val reader = spark.readStream.schema(mediaSchema)
    inner.start(
      maxFilesPerTrigger.fold(reader)(m =>
          reader.option("maxFilesPerTrigger", m))
        .parquet(inputDir),
      checkpointDir, trigger)
  }
}
