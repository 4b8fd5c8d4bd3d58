package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.queries.BehaviorQueries

/** Invariants for the behavior-analytics pack (q98–q103). The DuckDB
  * oracle proves value equality; these pin the semantic properties the
  * oracle can't express (island disjointness, funnel monotonicity, grid
  * completeness).
  */
class BehaviorSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q98 islands are disjoint, contiguous, and cover all active days") {
    val islands = BehaviorQueries.q98GapsIslands(spark, dir).collect()
    val activeDays = graft.tables.Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().count()
    // len == end - start + 1 for every island (contiguity)
    islands.foreach { r =>
      val len = r.getAs[Long]("len")
      val span = Date.valueOf(r.getAs[String]("end_day")).toLocalDate.toEpochDay -
        Date.valueOf(r.getAs[String]("start_day")).toLocalDate.toEpochDay + 1
      assert(len == span, s"island $r not contiguous")
    }
    // islands partition the active-day set exactly
    assert(islands.map(_.getAs[Long]("len")).sum == activeDays)
    // consecutive islands of one user are separated by a genuine gap
    islands.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      rs.sortBy(_.getAs[String]("start_day")).sliding(2).foreach {
        case Array(a, b) =>
          val gap = Date.valueOf(b.getAs[String]("start_day")).toLocalDate.toEpochDay -
            Date.valueOf(a.getAs[String]("end_day")).toLocalDate.toEpochDay
          assert(gap >= 2, s"adjacent islands touch: $a | $b")
        case _ =>
      }
    }
  }

  test("q100 funnel stage counts are monotonically non-increasing") {
    val rows = BehaviorQueries.q100Funnel(spark, dir).collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq ==
      Seq("1_view", "2_click", "3_purchase"))
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2))
    assert(rows.head.getAs[Double]("rate") == 1.0)
  }

  test("q99 cohort week-0 count equals cohort size; offsets never exceed it") {
    val rows = BehaviorQueries.q99CohortRetention(spark, dir).collect()
    val byCohort = rows.groupBy(_.getAs[String]("cohort_week"))
    byCohort.foreach { case (_, rs) =>
      val base = rs.find(_.getAs[Long]("week_offset") == 0L).get.getAs[Long]("n_users")
      rs.foreach(r => assert(r.getAs[Long]("n_users") <= base))
    }
  }

  test("q101 emits the full user × day grid with nulls only before first obs") {
    val rows = BehaviorQueries.q101TimeGridFfill(spark, dir)
    val users = graft.tables.Tables.events(spark, dir)
      .select(col("user_id")).distinct().count()
    assert(rows.count() == users * 30)
    // once a user has a non-null fill, it never reverts to null
    val reverted = rows
      .withColumn("was_filled", max(col("value_ffill").isNotNull.cast("int"))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("day"))
          .rowsBetween(Long.MinValue, 0)))
      .filter(col("was_filled") === 1 && col("value_ffill").isNull)
    assert(reverted.count() == 0)
  }

  test("q221: path occurrences are bounded by the per-user 3-gram budget") {
    import spark.implicits._
    val events = graft.tables.Tables.events(spark, dir)
    val nUsers = events.select(col("user_id")).distinct().count()
    // every user with n events contributes exactly max(0, n-2) 3-grams,
    // so the corpus-wide path mass is fixed by the event stream alone
    val gramBudget = events.groupBy(col("user_id")).count()
      .agg(sum(greatest(col("count") - 2, lit(0L)))).as[Long].head()
    val rows = BehaviorQueries.q221EventPaths(spark, dir).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val occ = r.getAs[Long]("n_occurrences")
      val users = r.getAs[Long]("n_users")
      assert(users >= 1 && users <= nUsers,
        s"path ${r.getString(0)}: n_users $users outside [1, $nUsers]")
      assert(occ >= users,
        s"path ${r.getString(0)}: each counted user contributes >= 1 occurrence")
      assert(occ <= gramBudget)
    }
    assert(rows.map(_.getAs[Long]("n_occurrences")).sum <= gramBudget,
      "top-20 path occurrences cannot exceed the corpus 3-gram budget")
  }
}
