package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful gap-based sessionization with `flatMapGroupsWithState` — the
  * streaming form of ExtendedQueries.q54 (whose SQL-window formulation is
  * the batch backfill / oracle). SessionizeSpec proves both forms emit
  * identical sessions on the same input.
  *
  * State per user is one open session (count, start, last-seen); an event
  * past the gap closes it and opens a new one. On a real stream the
  * timeout would flush idle sessions; draining with AvailableNow plus
  * [[finalOpenSessions]] emits the trailing open sessions deterministically
  * in tests.
  */
object Sessionize {

  final case class Event(user_id: Long, event_id: Long, ms: Long)
  final case class OpenSession(userId: Long, seq: Long, nEvents: Long, startMs: Long, endMs: Long)
  final case class Session(user_id: Long, session_seq: Long, n_events: Long,
      start_ms: Long, end_ms: Long)

  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Event], state: GroupState[OpenSession]) =>
          // within one batch, events of a key arrive unordered — sort like
          // the batch form does (ms, then event_id)
          val sorted = evs.toSeq.sortBy(e => (e.ms, e.event_id))
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          var open = state.getOption.orNull
          sorted.foreach { e =>
            if (open == null) {
              open = OpenSession(userId, 1L, 1L, e.ms, e.ms)
            } else if (e.ms - open.endMs > gapMs) {
              closed += Session(userId, open.seq, open.nEvents, open.startMs, open.endMs)
              open = OpenSession(userId, open.seq + 1, 1L, e.ms, e.ms)
            } else {
              // max, not assignment: a late event from a later micro-batch
              // (sorting is only within-batch) must not regress the open
              // session's end and corrupt subsequent gap decisions
              open = open.copy(nEvents = open.nEvents + 1,
                endMs = math.max(open.endMs, e.ms))
            }
          }
          if (open != null) state.update(open)
          closed.iterator
      }
  }

  /** Final open sessions left in state after a drain — batch-mode helper:
    * re-runs the same fold and emits only the trailing session per user. */
  def finalOpenSessions(events: Dataset[Event], gapMs: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (userId, evs) =>
      val sorted = evs.toSeq.sortBy(e => (e.ms, e.event_id))
      var open: OpenSession = null
      sorted.foreach { e =>
        if (open == null) open = OpenSession(userId, 1L, 1L, e.ms, e.ms)
        else if (e.ms - open.endMs > gapMs)
          open = OpenSession(userId, open.seq + 1, 1L, e.ms, e.ms)
        else open = open.copy(nEvents = open.nEvents + 1, endMs = e.ms)
      }
      if (open == null) Iterator.empty
      else Iterator(Session(userId, open.seq, open.nEvents, open.startMs, open.endMs))
    }.toDF()
  }
}
