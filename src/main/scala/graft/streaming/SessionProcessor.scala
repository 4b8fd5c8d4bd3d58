package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

import Sessionize.{Event, OpenSession, Session}

/** The same gap sessionizer on Spark 4's `transformWithState` — the
  * successor API to `flatMapGroupsWithState` ([[Sessionize]]): typed named
  * state (`ValueState`) obtained from a handle instead of one implicit
  * state object, timers instead of timeout modes, and state that lives in
  * the RocksDB provider (spill-to-disk — state no longer bounded by
  * executor heap, the property that matters when 100 TB of events keep
  * millions of sessions open). Semantics are identical to [[Sessionize]];
  * SessionizeSpec drains both against the same stream and asserts equal
  * output.
  */
class SessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, Event, Session] {

  @transient private var open: ValueState[OpenSession] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getValueState[OpenSession]("open",
      Encoders.product[OpenSession], TTLConfig.NONE)

  override def handleInputRows(userId: Long, rows: Iterator[Event],
      timerValues: TimerValues): Iterator[Session] = {
    // same within-batch ordering contract as Sessionize: sort (ms, event_id)
    val sorted = rows.toSeq.sortBy(e => (e.ms, e.event_id))
    val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
    var cur = if (open.exists()) open.get() else null
    sorted.foreach { e =>
      if (cur == null) {
        cur = OpenSession(userId, 1L, 1L, e.ms, e.ms)
      } else if (e.ms - cur.endMs > gapMs) {
        closed += Session(userId, cur.seq, cur.nEvents, cur.startMs, cur.endMs)
        cur = OpenSession(userId, cur.seq + 1, 1L, e.ms, e.ms)
      } else {
        cur = cur.copy(nEvents = cur.nEvents + 1,
          endMs = math.max(cur.endMs, e.ms))
      }
    }
    if (cur != null) open.update(cur)
    closed.iterator
  }
}

object SessionProcessor {

  /** Streaming-only (transformWithState requires the RocksDB state store
    * provider — set `spark.sql.streaming.stateStore.providerClass` before
    * starting the query). */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.None(), OutputMode.Append())
  }
}
