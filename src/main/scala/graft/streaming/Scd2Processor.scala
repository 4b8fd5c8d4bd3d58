package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Streaming SCD Type-2 maintenance: the dimension-history build (q137)
  * kept incrementally from the change stream instead of rebuilt from
  * accumulated history — the shape the reference's member/quest targets
  * would take under a track-history mandate (SURVEY §2.8e), and the
  * third member of the incremental-maintenance family (q114 aggregates,
  * q120 joins, q143 retractions — this one maintains *interval* rows).
  *
  * Per-key state is O(1): only the currently-open interval (type +
  * open timestamp). Each arriving change that differs from the open
  * type EMITS the closed interval and re-opens — so the history table
  * appends monotonically and a restart resumes from the checkpointed
  * ValueState. Closed intervals are the streaming output; the open
  * intervals are exactly the latest-per-key surface (q07) and stay in
  * state. State lives in the RocksDB provider (spill-to-disk, not
  * heap-bounded — millions of open entities at 100 TB).
  */
object Scd2Processor {
  final case class Change(user_id: Long, event_id: Long, ms: Long,
      event_type: String)
  final case class OpenInterval(event_type: String, from_ms: Long)
  final case class ClosedInterval(user_id: Long, event_type: String,
      valid_from_ms: Long, valid_to_ms: Long)

  class Proc extends StatefulProcessor[Long, Change, ClosedInterval] {
    @transient private var open: ValueState[OpenInterval] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenInterval]("open",
        Encoders.product[OpenInterval], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Change],
        timerValues: TimerValues): Iterator[ClosedInterval] = {
      // same within-batch ordering contract as the sessionizers
      val sorted = rows.toSeq.sortBy(c => (c.ms, c.event_id))
      val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedInterval]
      var cur = if (open.exists()) open.get() else null
      sorted.foreach { c =>
        if (cur == null) cur = OpenInterval(c.event_type, c.ms)
        // A change arriving in a LATER batch with ms older than the open
        // interval's start would close an inverted interval
        // (valid_to < valid_from); sorting only orders within a batch.
        // Late changes are dropped — same late-data policy as the
        // watermarked sessionizers.
        else if (c.ms < cur.from_ms) ()
        else if (c.event_type != cur.event_type) {
          closed += ClosedInterval(userId, cur.event_type, cur.from_ms, c.ms)
          cur = OpenInterval(c.event_type, c.ms)
        } // same type: interval extends implicitly, nothing to emit
      }
      if (cur != null) open.update(cur)
      closed.iterator
    }
  }

  /** Streaming-only (requires the RocksDB state store provider). */
  def build(changes: Dataset[Change]): Dataset[ClosedInterval] = {
    import changes.sparkSession.implicits._
    changes.groupByKey(_.user_id)
      .transformWithState(new Proc, TimeMode.None(), OutputMode.Append())
  }
}
