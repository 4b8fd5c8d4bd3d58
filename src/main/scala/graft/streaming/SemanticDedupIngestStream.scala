package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructType}

import graft.operators.SemanticDedupIngest

/** Semantic dedup-on-ingest under Structured Streaming: each micro-batch
  * of arriving embeddings is screened against the persisted SRP-band
  * vector index ([[SemanticDedupIngest]] — candidates nominated per band
  * bucket, capped at MaxCell, verdict by exact quantized cosine), and
  * the admissions' band rows delta-merge forward before the next batch —
  * the continuous form of q160, sharing every operator piece with the
  * batch form. A façade over [[IngestDoorStream]], which owns the WAL
  * replay-safety contract (decisions durable before index mutation,
  * decide skipped on re-delivery, idempotent re-apply, torn-write
  * recovery, rotate-together guards) for every door.
  *
  * The source is a PARQUET file stream — embedding arrays round-trip
  * natively there. Rows with a null vec_id or embedding are dropped up
  * front (same caveat as [[DedupIngestStream]]).
  */
final class SemanticDedupIngestStream(spark: SparkSession, root: String,
    decisionsDir: String, nBuckets: Int = 16, bands: Int = 16,
    dimsPerBand: Int = 4, tau: Double = 0.45,
    now: () => Timestamp = () => new Timestamp(System.currentTimeMillis())) {

  private val inner = new IngestDoorStream(spark,
    SemanticDedupIngest.door(bands, dimsPerBand, tau), root, decisionsDir,
    nBuckets, cleanCols = Seq("vec_id", "embedding"), now = now,
    queryName = "semantic-dedup-ingest")

  /** Arriving-embedding schema: parquet rows (vec_id, embedding). */
  val vecSchema: StructType = new StructType()
    .add("vec_id", LongType).add("embedding", ArrayType(FloatType))

  /** Seed the index from an initial corpus — may be empty. */
  def seed(corpus: DataFrame): Unit = inner.seed(corpus)

  /** One micro-batch, replay-safe; exposed for direct spec drive. */
  def ingest(batch: DataFrame, batchId: Long): Unit =
    inner.ingest(batch, batchId)

  /** Stream a directory of embedding parquet files through the screen;
    * WAL and checkpoint must rotate together ([[WalGuards]]). */
  def start(inputDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None) = {
    val reader = spark.readStream.schema(vecSchema)
    inner.start(
      maxFilesPerTrigger.fold(reader)(m =>
          reader.option("maxFilesPerTrigger", m))
        .parquet(inputDir),
      checkpointDir, trigger)
  }
}
