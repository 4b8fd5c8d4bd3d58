package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.operators.DedupIngest

/** Dedup-on-ingest under Structured Streaming: each micro-batch of
  * arriving documents is admit/reject-screened against the persisted
  * fingerprint index ([[DedupIngest]]), and the admissions' fingerprints
  * delta-merge forward before the next batch — the continuous form of
  * q150's sequential ingest, sharing every operator piece with the batch
  * form. A façade over [[IngestDoorStream]], which owns the WAL
  * replay-safety contract (decisions durable before index mutation,
  * decide skipped on re-delivery, idempotent re-apply, torn-write
  * recovery, rotate-together guards) for every door.
  *
  * With `corpusDir` set, each batch's ADMITTED documents additionally
  * land in a [[graft.operators.CorpusSink]] corpus — the complete
  * "stream in, training corpus out" terminal, replay-safe end to end.
  */
final class DedupIngestStream(spark: SparkSession, root: String,
    decisionsDir: String, nBuckets: Int = 32, shingleN: Int = 3,
    numHashes: Int = 8, rowsPerBand: Int = 2,
    now: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
    corpusDir: Option[String] = None, corpusShards: Int = 8) {

  private val inner = new IngestDoorStream(spark,
    DedupIngest.door(shingleN, numHashes, rowsPerBand), root, decisionsDir,
    nBuckets, cleanCols = Seq("doc_id", "text"), now = now,
    corpusDir = corpusDir, corpusShards = corpusShards,
    queryName = "dedup-ingest")

  /** Arriving-document schema: newline-JSON `{doc_id, text}` lines. */
  val docSchema: StructType = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  /** Seed the index (and, with `corpusDir`, the corpus shards) from an
    * initial corpus — may be empty. */
  def seed(corpus: DataFrame): Unit = inner.seed(corpus)

  /** One micro-batch, replay-safe; exposed for direct spec drive.
    *
    * Rows the schema'd JSON reader could not fill (malformed line → all
    * nulls) are dropped up front: a null text would otherwise plant a
    * null-keyed fingerprint in the index (xxhash64 buckets nulls fine,
    * but the key can never be probed back — dead weight), and a null
    * doc_id would emit a meaningless decision row. CONTRACT CAVEAT: a
    * well-formed line whose doc_id or text is explicit JSON null is
    * dropped the same way — no decision row, no index entry. An upstream
    * that needs dead-letter visibility for such rows should pre-split
    * them into a quarantine table the way [[CdcStream.start]] does with
    * its corrupt-record column; this screen only decides on complete
    * documents. */
  def ingest(batch: DataFrame, batchId: Long): Unit =
    inner.ingest(batch, batchId)

  /** Stream a directory of document JSON files through the screen.
    * `maxFilesPerTrigger` bounds backfill batches exactly like
    * [[CdcStream.start]] — a replayed backlog must not arrive as one
    * giant micro-batch. */
  def start(inputDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None) = {
    val reader = spark.readStream.schema(docSchema)
    inner.start(
      maxFilesPerTrigger.fold(reader)(n =>
          reader.option("maxFilesPerTrigger", n))
        .json(inputDir),
      checkpointDir, trigger)
  }
}
