package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.queries.ExtendedQueries
import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Event, Session}

/** The stateful (flatMapGroupsWithState) sessionizer must emit exactly the
  * sessions the declarative window form (q54 / its oracle) computes. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val gapMs = 30 * 60 * 1000L

  test("stateful sessionizer matches the SQL-window form on real events") {
    val dir = "/root/testdata/sf0.001"
    val batchForm = ExtendedQueries.q54Sessionize(spark, dir)
      .select($"user_id", $"session_seq", $"n_events", $"start_ms", $"end_ms")
      .as[Session].collect().toSet

    val events = graft.tables.Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ms"))
      .as[Event]
    // streaming drain via memory stream semantics in batch: closed sessions
    // plus the final open session per user = all sessions
    val closed = Sessionize.sessionize(events, gapMs)
    val closedSet =
      if (closed.isStreaming) Set.empty[Session] else closed.collect().toSet
    val open = Sessionize.finalOpenSessions(events, gapMs)
      .as[Session].collect().toSet
    // batch Dataset.flatMapGroupsWithState over a static frame emits closed
    // sessions directly
    val all = closedSet ++ open
    assert(all == batchForm,
      s"stateful=${all.size} window=${batchForm.size}; diff=${(all diff batchForm).take(3)} / ${(batchForm diff all).take(3)}")
  }

  test("transformWithState sessionizer matches flatMapGroupsWithState on a stream") {
    val dir = "/root/testdata/sf0.001"
    def streamEvents = graft.tables.Tables.eventsStream(spark, dir)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ms"))
      .as[Event]
    def drain(sessions: org.apache.spark.sql.Dataset[Session], name: String): Set[Session] = {
      val q = sessions.writeStream.outputMode("append")
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = spark.table(name).as[Session].collect().toSet
      spark.catalog.dropTempView(name)
      out
    }
    val v1 = drain(Sessionize.sessionize(streamEvents, gapMs), "twss_v1")
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val v2 = drain(
        graft.streaming.SessionProcessor.sessionize(streamEvents, gapMs), "twss_v2")
      assert(v2 == v1,
        s"v2=${v2.size} v1=${v1.size}; diff=${(v2 diff v1).take(3)} / ${(v1 diff v2).take(3)}")
      assert(v1.nonEmpty, "drain must close at least one session")
    } finally saved.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("stateful sessionizer works as a real stream with AvailableNow") {
    val dir = "/root/testdata/sf0.001"
    val stream = graft.tables.Tables.eventsStream(spark, dir)
      .select($"user_id", $"event_id", unix_millis($"ts").as("ms"))
      .as[Event]
    val sessions = Sessionize.sessionize(stream, gapMs)
    val name = "sessions_out"
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val emitted = spark.table(name).count()
    // closed sessions only (open ones stay in state) — must be most of them
    val total = ExtendedQueries.q54Sessionize(spark, dir).count()
    assert(emitted > 0 && emitted <= total)
  }
}
