package graft.streaming

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.storage.StorageLevel

import graft.operators.{CorpusSink, DedupIngest}
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
  *
  * With `corpusDir` set, each batch's ADMITTED documents additionally
  * land in a [[CorpusSink]] corpus — the complete "stream in, training
  * corpus out" terminal: seed corpus → sized shards + manifest, then
  * per micro-batch dedup-screen → append admitted → manifest update.
  * The whole chain is replay-safe end to end: decisions from the WAL,
  * index merge idempotent, and the corpus append batchId-guarded
  * ([[CorpusSink.appendShards]]), so a re-delivered epoch changes
  * nothing anywhere.
  */
final class DedupIngestStream(spark: SparkSession, root: String,
    decisionsDir: String, nBuckets: Int = 32, shingleN: Int = 3,
    numHashes: Int = 8, rowsPerBand: Int = 2,
    now: () => Timestamp = () => new Timestamp(System.currentTimeMillis()),
    corpusDir: Option[String] = None, corpusShards: Int = 8) {

  private val store = new BucketedTableStore(spark, root, nBuckets,
    deltaMerges = true, autoCompactAfter = 8)

  /** Arriving-document schema: newline-JSON `{doc_id, text}` lines. */
  val docSchema: StructType = new StructType()
    .add("doc_id", LongType).add("text", StringType)

  /** Seed the index from an initial corpus (may be empty — the store
    * still needs its keyed table created before the stream starts); with
    * `corpusDir` set the seed documents also become the corpus's initial
    * shards (the manifest must exist before the first append). */
  def seed(corpus: DataFrame): Unit = {
    DedupIngest.seedIndex(store, corpus, now(), shingleN, numHashes, rowsPerBand)
    corpusDir.foreach(d =>
      CorpusSink.writeShards(corpus, d, nShards = corpusShards))
  }

  private def batchDir(batchId: Long) =
    Paths.get(decisionsDir, s"batch_id=$batchId")

  private def decided(batchId: Long): Boolean =
    Files.exists(batchDir(batchId).resolve("_SUCCESS"))

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
  def ingest(batch: DataFrame, batchId: Long): Unit = {
    // persisted for the batch's scope: the frame feeds the fingerprint
    // computation, decide's projection, AND the admitted-docs corpus
    // append — without the persist each consumer re-reads the batch JSON
    val clean = batch.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val fps = DedupIngest
      .fingerprints(clean, shingleN, numHashes, rowsPerBand)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      if (!decided(batchId)) {
        // WAL: decisions durable before any index mutation. Overwrite
        // mode clears a torn dir from a previous crash.
        DedupIngest.decide(store, clean, fps, batchId)
          .drop("batch_id") // encoded by the directory, like a partition
          .write.mode("overwrite").parquet(batchDir(batchId).toString)
      }
      val dec = spark.read.parquet(batchDir(batchId).toString)
      DedupIngest.applyAdmissions(store, fps, dec, now())
      // corpus terminal last: if we crash before this, the replay skips
      // decide (WAL), re-applies the idempotent index merge, and lands
      // the append then — the batchId guard makes a DOUBLE append (crash
      // after append, before checkpoint commit) equally inert
      corpusDir.foreach { d =>
        val admitted = clean.join(
          dec.filter(col("admitted") === 1).select(col("doc_id")),
          Seq("doc_id"), "left_semi")
        CorpusSink.appendShards(admitted, d, batchId = Some(batchId))
      }
    } finally { fps.unpersist(); clean.unpersist() }
  }

  /** Stream a directory of document JSON files through the screen.
    * `maxFilesPerTrigger` bounds backfill batches exactly like
    * [[CdcStream.start]] — a replayed backlog must not arrive as one
    * giant micro-batch. */
  def start(inputDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Option[Int] = None) = {
    // the WAL is keyed by the checkpoint's batchIds — both mismatch
    // directions (fresh checkpoint + used WAL, used checkpoint + WAL
    // missing committed batches' decisions) corrupt decisions and are
    // refused up front; rotate the two directories together (WalGuards)
    WalGuards.requireRotatedTogether(checkpointDir, decisionsDir, decided)
    val fresh = !Files.exists(Paths.get(checkpointDir, "offsets"))
    // same batchId-reuse hazard one layer down: a fresh checkpoint's
    // batch 0 would hit the CORPUS manifest's replay guard and silently
    // skip appending the new admissions — refuse the pairing up front
    // (the standing corpus is fine; resume the OLD checkpoint, or accept
    // a new corpus epoch by rotating/re-seeding corpusDir)
    corpusDir.foreach { d =>
      require(!(fresh && CorpusSink.committedBatches(d).nonEmpty),
        s"corpusDir $d has batchId-guarded appends from a previous run " +
          s"but checkpointDir $checkpointDir is fresh (batchIds restart " +
          "at 0) — rotate corpusDir together with the checkpoint")
    }
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
