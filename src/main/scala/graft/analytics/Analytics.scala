package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's four analytic queries (ref sql/queries.sql:1-45) as
  * DataFrame builders over the target tables. Q1/Q2 plan as
  * TakeOrderedAndProject (true top-k — no global sort); Q3/Q4 are star
  * joins where the dim side broadcasts.
  */
object Analytics {

  /** Q1 — five most recently synced member_quest rows with their lag
    * (ref sql/queries.sql:2-8). syncLag is rendered in whole seconds
    * (the interval presentation is display-side in the reference). */
  def recentSyncLags(memberQuest: DataFrame): DataFrame =
    memberQuest.select(
        col("memberQuestId"), col("memberId"), col("questId"),
        col("approximateUpdateTimestamp"), col("syncTimestamp"),
        (unix_timestamp(col("syncTimestamp")) -
         unix_timestamp(col("approximateUpdateTimestamp"))).as("syncLagSeconds"))
      .orderBy(col("syncTimestamp").desc, col("memberQuestId").asc)
      .limit(5)

  /** Q2 — five worst lags for a given day (ref sql/queries.sql:12-19;
    * `TRUNC(ts) = CURRENT_DATE` with the date passed in for determinism). */
  def worstLagsOn(memberQuest: DataFrame, day: java.sql.Date): DataFrame =
    memberQuest
      .filter(to_date(col("approximateUpdateTimestamp")) === lit(day))
      .select(
        col("memberQuestId"), col("memberId"),
        (unix_timestamp(col("syncTimestamp")) -
         unix_timestamp(col("approximateUpdateTimestamp"))).as("syncLagSeconds"))
      .orderBy(col("syncLagSeconds").desc, col("memberQuestId").asc)
      .limit(5)

  /** Q3 — total rewards by member (ref sql/queries.sql:24-32, with the
    * §2.8e whitespace-slip intent: GROUP BY id, name ORDER BY total DESC). */
  def rewardsByMember(memberQuest: DataFrame, member: DataFrame): DataFrame =
    memberQuest.join(broadcast(member), Seq("memberId"))
      .groupBy(col("memberId"), col("memberName"))
      .agg(sum(col("dollarsEarned")).as("totalDollarsEarned"))
      .orderBy(col("totalDollarsEarned").desc, col("memberId").asc)

  /** Q4 — total rewards by quest (ref sql/queries.sql:36-45). */
  def rewardsByQuest(memberQuest: DataFrame, quest: DataFrame): DataFrame =
    memberQuest.join(broadcast(quest), Seq("questId"))
      .groupBy(col("questId"), col("questName"))
      .agg(sum(col("dollarsEarned")).as("totalDollarsEarned"))
      .orderBy(col("totalDollarsEarned").desc, col("questId").asc)
}

/** Thin facade with the shape of the reference's async statement protocol
  * (submit → poll describe-statement → get-statement-result,
  * ref scripts/test_sync_time.sh:9-34) for API parity. Spark executes
  * synchronously; submit() runs the plan eagerly on a background thread.
  *
  * Results are BOUNDED: a statement whose result exceeds `maxRows`
  * (default 100,000 — generous for the poll-and-print protocol this
  * facade mirrors, tiny next to driver heap) reports Failed instead of
  * collecting — the facade is for analytic summaries, and nothing
  * upstream constrains callers, so an unlimited `df.collect()` here
  * would be the one driver-OOM hole in an otherwise bounded engine.
  * Callers with genuinely large results should write to a table/sink
  * instead (S5), exactly as they would against the reference's
  * get-statement-result paging cap.
  */
final class StatementRunner(maxRows: Int = StatementRunner.DefaultMaxRows) {
  import java.util.concurrent.{ConcurrentHashMap, Executors}
  import scala.jdk.CollectionConverters._

  sealed trait Status
  case object Submitted extends Status
  case object Finished extends Status
  final case class Failed(error: String) extends Status

  private val pool = Executors.newCachedThreadPool()
  private val statements = new ConcurrentHashMap[String, (Status, Seq[org.apache.spark.sql.Row])]()
  private val counter = new java.util.concurrent.atomic.AtomicLong()

  def executeStatement(df: DataFrame): String = {
    val id = s"stmt-${counter.incrementAndGet()}"
    statements.put(id, (Submitted, Seq.empty))
    pool.submit(new Runnable {
      def run(): Unit =
        try {
          // limit(maxRows + 1) plans as CollectLimit — the driver never
          // materializes more than the bound + 1 sentinel row, so even a
          // full-table statement cannot OOM the facade
          val rows = df.limit(maxRows + 1).collect().toIndexedSeq
          if (rows.length > maxRows)
            statements.put(id, (Failed(
              s"result exceeds maxRows=$maxRows — aggregate, LIMIT, or " +
                "write to a table sink instead"), Seq.empty))
          else statements.put(id, (Finished, rows))
        }
        catch { case e: Throwable => statements.put(id, (Failed(e.getMessage), Seq.empty)) }
    })
    id
  }

  def describeStatement(id: String): Status =
    Option(statements.get(id)).map(_._1).getOrElse(Failed(s"unknown id $id"))

  def getStatementResult(id: String): Seq[org.apache.spark.sql.Row] =
    Option(statements.get(id)) match {
      case Some((Finished, rows)) => rows
      case Some((Failed(err), _)) =>
        throw new IllegalStateException(s"$id failed: $err")
      case Some((Submitted, _)) =>
        throw new IllegalStateException(s"$id not finished")
      case None => throw new IllegalStateException(s"unknown statement $id")
    }

  def awaitResult(id: String, timeoutMs: Long = 60000): Seq[org.apache.spark.sql.Row] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (describeStatement(id) == Submitted && System.currentTimeMillis() < deadline)
      Thread.sleep(20)
    getStatementResult(id)
  }

  def shutdown(): Unit = pool.shutdown()
}

object StatementRunner {
  /** See class doc: the facade mirrors a poll-and-print result protocol,
    * so a six-figure row count already signals the caller wanted a sink,
    * not a statement result. */
  val DefaultMaxRows: Int = 100000
}
