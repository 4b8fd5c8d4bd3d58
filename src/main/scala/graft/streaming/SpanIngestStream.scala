package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.storage.StorageLevel

import graft.operators.SpanIngest
import graft.sync.BucketedTableStore

/** ExactSubstr-on-ingest under Structured Streaming: each micro-batch of
  * arriving documents is span-screened against the persisted gram index
  * ([[SpanIngest]]) inside `foreachBatch`, and the admissions' grams
  * delta-merge forward before the next batch — the continuous form of
  * q165, sharing every operator piece with the batch form, under
  * [[DedupIngestStream]]'s exact replay-safety contract:
  *
  *   - decisions land durably under `decisionsDir/batch_id=<k>` BEFORE
  *     the index mutates (write-ahead log); a re-delivered batch whose
  *     decisions exist SKIPS the decide step — recomputing against the
  *     already-mutated index would flip its own admissions into
  *     rejections (its own grams would probe as duplicated);
  *   - the index merge re-applies FROM the logged decisions and
  *     [[SpanIngest.applyAdmissions]] is idempotent, so once or twice is
  *     indistinguishable;
  *   - a torn decision write (no `_SUCCESS`) is overwritten cleanly on
  *     replay — the index is untouched at that point.
  */
final class SpanIngestStream(spark: SparkSession, root: String,
    decisionsDir: String, n: Int = 8, nBuckets: Int = 16,
    now: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
    corpusDir: Option[String] = None, corpusShards: Int = 8) {

  private val store = new BucketedTableStore(spark, root, nBuckets,
    deltaMerges = true, autoCompactAfter = 8)

  /** Arriving-document schema: newline-JSON `{doc_id, text}` lines. */
  val docSchema: StructType = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  /** Seed the gram index from an initial corpus (may be empty — the
    * keyed table must exist before the first probe); with `corpusDir`
    * set the seed documents also become the corpus terminal's initial
    * shards (the manifest must exist before the first append). */
  def seed(corpus: DataFrame): Unit = {
    SpanIngest.seedIndex(store, corpus, n, now())
    corpusDir.foreach(d =>
      graft.operators.CorpusSink.writeShards(corpus, d, nShards = corpusShards))
  }

  private def batchDir(batchId: Long) =
    Paths.get(decisionsDir, s"batch_id=$batchId")

  private def decided(batchId: Long): Boolean =
    Files.exists(batchDir(batchId).resolve("_SUCCESS"))

  /** One micro-batch, replay-safe; exposed for direct spec drive. Rows
    * the schema'd reader could not fill (null doc_id or text) are
    * dropped up front — same contract caveat as [[DedupIngestStream]]. */
  def ingest(batch: DataFrame, batchId: Long): Unit = {
    val clean = batch.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // occurrences feed the probe, span merge AND the index update
    val occ = SpanIngest.occurrences(clean, n)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (!decided(batchId)) {
        SpanIngest.decide(store, clean, occ, n, batchId)
          .drop("batch_id") // encoded by the directory, like a partition
          .write.mode("overwrite").parquet(batchDir(batchId).toString)
      }
      val dec = spark.read.parquet(batchDir(batchId).toString)
      SpanIngest.applyAdmissions(store, occ, dec, now())
      // corpus terminal last — WAL-recovered decide + idempotent index
      // merge + batchId-guarded append make a replayed epoch inert at
      // every layer (same ordering argument as DedupIngestStream)
      corpusDir.foreach { d =>
        val admitted = clean.join(
          dec.filter(col("admitted") === 1).select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        graft.operators.CorpusSink.appendShards(admitted, d, batchId = Some(batchId))
      }
    } finally { occ.unpersist(); clean.unpersist() }
  }

  /** Stream a directory of document JSON files through the screen; the
    * WAL and the checkpoint must rotate together — BOTH mismatch
    * directions are refused up front ([[WalGuards]]). */
  def start(inputDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None) = {
    WalGuards.requireRotatedTogether(checkpointDir, decisionsDir, decided)
    // corpus batchId-guard has the same fresh-checkpoint collision as the
    // WAL (appends silently skipped for new data) — refuse the pairing
    corpusDir.foreach { d =>
      val fresh = !Files.exists(Paths.get(checkpointDir, "offsets"))
      require(!(fresh && graft.operators.CorpusSink.committedBatches(d).nonEmpty),
        s"corpusDir $d has batchId-guarded appends from a previous run " +
          s"but checkpointDir $checkpointDir is fresh (batchIds restart " +
          "at 0) — rotate corpusDir together with the checkpoint")
    }
    val reader = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.fold(reader)(m =>
        reader.option("maxFilesPerTrigger", m))
      .json(inputDir)
      .writeStream
      .queryName("span-ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, batchId: Long) => ingest(batch, batchId))
      .start()
  }
}
