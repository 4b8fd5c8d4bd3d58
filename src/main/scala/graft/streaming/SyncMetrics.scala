package graft.streaming

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Per-micro-batch sync telemetry — the engine-side half of the
  * reference's syncLag observability (SURVEY.md §2.6 ST8: the reference
  * measures lag by querying the target after the fact; a streaming engine
  * also needs the push-side numbers: rows per batch, batch duration,
  * source backlog). Implemented as a StreamingQueryListener, so the
  * numbers piggyback the stream's own progress events — zero extra
  * queries, zero extra scans, and it works identically under a real
  * Kinesis source.
  *
  * Events arrive on Spark's listener bus thread; the buffer is
  * synchronized and bounded (keep-last semantics) so a long-lived stream
  * can't grow driver memory unboundedly.
  */
final class SyncMetrics(maxBatches: Int = 1024) extends StreamingQueryListener {

  /** One micro-batch's ledger entry. */
  final case class BatchMetric(queryName: String, batchId: Long,
      inputRows: Long, durationMs: Long, endOffsetsJson: String)

  private val buf = ArrayBuffer.empty[BatchMetric]

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
  override def onQueryIdle(event: QueryIdleEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val m = BatchMetric(
      Option(p.name).getOrElse(p.id.toString), p.batchId,
      // triggerExecution already spans the whole batch (addBatch/getBatch/
      // walCommit are sub-phases of it); summing every phase double-counts.
      p.numInputRows,
      Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(
        p.durationMs.values().stream().mapToLong(_.longValue).sum()),
      Option(p.sources).filter(_.nonEmpty).map(_.head.endOffset).getOrElse(""))
    buf.synchronized {
      buf += m
      if (buf.length > maxBatches) buf.remove(0, buf.length - maxBatches)
    }
  }

  /** Snapshot of the batch ledger (oldest first, bounded). */
  def batches: Seq[BatchMetric] = buf.synchronized(buf.toVector)

  /** Total source rows processed across recorded batches. */
  def totalInputRows: Long = batches.map(_.inputRows).sum

  def register(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }
  def unregister(spark: SparkSession): Unit =
    spark.streams.removeListener(this)
}
