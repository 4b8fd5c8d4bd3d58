package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.operators.SpanIngest

/** ExactSubstr-on-ingest under Structured Streaming: each micro-batch of
  * arriving documents is span-screened against the persisted gram index
  * ([[SpanIngest]]), and the admissions' grams delta-merge forward
  * before the next batch — the continuous form of q165, sharing every
  * operator piece with the batch form. A façade over
  * [[IngestDoorStream]], which owns the WAL replay-safety contract
  * (decisions durable before index mutation, decide skipped on
  * re-delivery — recomputing against the already-mutated index would
  * flip its own admissions into rejections, its own grams probing as
  * duplicated — idempotent re-apply, torn-write recovery,
  * rotate-together guards) for every door.
  */
final class SpanIngestStream(spark: SparkSession, root: String,
    decisionsDir: String, n: Int = 8, nBuckets: Int = 16,
    now: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
    corpusDir: Option[String] = None, corpusShards: Int = 8) {

  private val inner = new IngestDoorStream(spark, SpanIngest.door(n), root,
    decisionsDir, nBuckets, cleanCols = Seq("doc_id", "text"), now = now,
    corpusDir = corpusDir, corpusShards = corpusShards,
    queryName = "span-ingest")

  /** Arriving-document schema: newline-JSON `{doc_id, text}` lines. */
  val docSchema: StructType = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  /** Seed the gram index (and, with `corpusDir`, the corpus shards)
    * from an initial corpus — may be empty. */
  def seed(corpus: DataFrame): Unit = inner.seed(corpus)

  /** One micro-batch, replay-safe; exposed for direct spec drive. Rows
    * the schema'd reader could not fill (null doc_id or text) are
    * dropped up front — same contract caveat as [[DedupIngestStream]]. */
  def ingest(batch: DataFrame, batchId: Long): Unit =
    inner.ingest(batch, batchId)

  /** Stream a directory of document JSON files through the screen; the
    * WAL and the checkpoint must rotate together — BOTH mismatch
    * directions are refused up front ([[WalGuards]]). */
  def start(inputDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None) = {
    val reader = spark.readStream.schema(docSchema)
    inner.start(
      maxFilesPerTrigger.fold(reader)(m =>
          reader.option("maxFilesPerTrigger", m))
        .json(inputDir),
      checkpointDir, trigger)
  }
}
