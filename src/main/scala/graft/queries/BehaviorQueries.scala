package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.VectorOps
import graft.tables.Tables

/** User-behavior / sequence analytics over the `events` table plus the
  * array-function and binning kits — the classic warehouse patterns
  * (gaps-and-islands, cohort retention, ordered funnels, resample +
  * forward-fill) that a training-data or product-analytics pipeline runs
  * at full scale.
  *
  * Scale notes (see SCALE.md §2): every query here is one-or-two
  * hash-exchanges on `user_id` (cardinality ≫ executors), with all
  * window state O(1) or O(frame); the calendar grid in q101 is a
  * broadcast-sized dimension (days × users rows out, but days ≤ 10⁴ and
  * the join is on the already-partitioned user key).
  *
  * Determinism: timestamps are compared as `unix_micros` on both engines
  * (whatever physical type events.parquet ships — nanos or micros — the
  * loader normalizes Spark to µs and DuckDB's epoch_us floors to the
  * same longs). Raw `value` doubles pass through unaggregated or through
  * exact integer paths only.
  */
object BehaviorQueries {

  // ---------------------------------------------------------------------
  // q98 — gaps-and-islands: maximal runs of consecutive active days per
  // user. The island anchor (day − row_number) is the standard trick: one
  // exchange on user_id, O(1) window state, then a per-(user, anchor)
  // aggregate that reuses the same partitioning.
  def q98GapsIslands(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val days = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("day")).distinct()
    val w = Window.partitionBy($"user_id").orderBy($"day".asc)
    days.withColumn("anchor", date_sub($"day", row_number().over(w)))
      .groupBy($"user_id", $"anchor")
      .agg(min($"day").cast("string").as("start_day"),
        max($"day").cast("string").as("end_day"),
        count(lit(1)).as("len"))
      .select($"user_id", $"start_day", $"end_day", $"len")
      .orderBy($"user_id".asc, $"start_day".asc)
  }
  val q98Oracle: String = """
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    r AS (SELECT user_id, day,
            row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn FROM d),
    g AS (SELECT user_id, day, day - CAST(rn AS INTEGER) AS anchor FROM r)
    SELECT user_id, CAST(MIN(day) AS VARCHAR) AS start_day,
           CAST(MAX(day) AS VARCHAR) AS end_day, COUNT(*) AS len
    FROM g GROUP BY user_id, anchor ORDER BY user_id ASC, start_day ASC"""

  // ---------------------------------------------------------------------
  // q99 — cohort retention: users bucketed by first-active ISO week, then
  // distinct-user counts per (cohort, week offset). Two aggregations that
  // share the user_id partitioning; the cohort table is user-cardinality
  // (small relative to events) and joins on the same key.
  def q99CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val wk = Tables.events(spark, dir)
      .select($"user_id", to_date(date_trunc("week", $"ts")).as("week"))
      .distinct()
    val cohort = wk.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    wk.join(cohort, "user_id")
      .select($"user_id", $"cohort_week",
        expr("CAST(datediff(week, cohort_week) DIV 7 AS BIGINT)").as("week_offset"))
      .groupBy($"cohort_week".cast("string").as("cohort_week"), $"week_offset")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_week".asc, $"week_offset".asc)
  }
  val q99Oracle: String = """
    WITH wk AS (SELECT DISTINCT user_id,
                  CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week
                FROM events),
    c AS (SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY 1)
    SELECT CAST(c.cohort_week AS VARCHAR) AS cohort_week,
           CAST((wk.week - c.cohort_week) // 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT wk.user_id) AS n_users
    FROM wk JOIN c USING (user_id)
    GROUP BY 1, 2 ORDER BY cohort_week ASC, week_offset ASC"""

  // ---------------------------------------------------------------------
  // q100 — strict-order funnel view → click → purchase: a user converts a
  // stage only with an event strictly after their previous stage's first
  // qualifying event. Three user-keyed aggregates chained by joins on the
  // same partitioning; stage counts collapse to 3 rows + conversion rate
  // (double division of two exact longs).
  def q100Funnel(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t_view"))
    val c = e.filter($"event_type" === "click").join(v, "user_id")
      .filter($"us" > $"t_view")
      .groupBy($"user_id").agg(min($"us").as("t_click"))
    val p = e.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"us" > $"t_click")
      .groupBy($"user_id").agg(min($"us").as("t_purchase"))
    val stages =
      v.agg(count(lit(1)).as("n_users")).select(lit("1_view").as("stage"), $"n_users")
        .unionByName(c.agg(count(lit(1)).as("n_users"))
          .select(lit("2_click").as("stage"), $"n_users"))
        .unionByName(p.agg(count(lit(1)).as("n_users"))
          .select(lit("3_purchase").as("stage"), $"n_users"))
    val total = v.agg(count(lit(1)).as("t")).select($"t")
    stages.crossJoin(total)
      .select($"stage", $"n_users",
        ($"n_users".cast("double") / $"t".cast("double")).as("rate"))
      .orderBy($"stage".asc)
  }
  val q100Oracle: String = """
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
    v AS (SELECT user_id, MIN(us) AS t_view FROM e
          WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, MIN(us) AS t_click FROM e JOIN v USING (user_id)
          WHERE event_type = 'click' AND us > t_view GROUP BY 1),
    p AS (SELECT e.user_id, MIN(us) AS t_purchase FROM e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND us > t_click GROUP BY 1),
    s AS (SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
          UNION ALL SELECT '2_click', COUNT(*) FROM c
          UNION ALL SELECT '3_purchase', COUNT(*) FROM p)
    SELECT stage, n_users,
           CAST(n_users AS DOUBLE) / CAST((SELECT COUNT(*) FROM v) AS DOUBLE) AS rate
    FROM s ORDER BY stage ASC"""

  // ---------------------------------------------------------------------
  // q101 — time-grid resample + forward fill: every (user, day) on the
  // fixed January grid carries the user's last observed `value` (ties
  // within a day broken by (µs, event_id) — replay-deterministic). The
  // grid is sequence()-generated (30 rows broadcast against users); the
  // fill is one last(ignoreNulls) running window per user. Raw doubles
  // pass through with no arithmetic → bit-identical.
  def q101TimeGridFfill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("day"),
        unix_micros($"ts").as("us"), $"event_id", $"value")
    val wDay = Window.partitionBy($"user_id", $"day")
      .orderBy($"us".desc, $"event_id".desc)
    val daily = e.withColumn("rn", row_number().over(wDay))
      .filter($"rn" === 1).select($"user_id", $"day", $"value")
    val grid = e.select($"user_id").distinct()
      .crossJoin(spark.range(1).select(explode(sequence(
        to_date(lit("2024-01-01")), to_date(lit("2024-01-30")))).as("day")))
    val wFill = Window.partitionBy($"user_id").orderBy($"day".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .withColumn("value_ffill", last($"value", ignoreNulls = true).over(wFill))
      .select($"user_id", $"day".cast("string").as("day"), $"value_ffill")
      .orderBy($"user_id".asc, $"day".asc)
  }
  val q101Oracle: String = """
    WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, epoch_us(ts) AS us,
                      event_id, value FROM events),
    d AS (SELECT user_id, day, value FROM (
            SELECT *, row_number() OVER
              (PARTITION BY user_id, day ORDER BY us DESC, event_id DESC) AS rn
            FROM e) WHERE rn = 1),
    u AS (SELECT DISTINCT user_id FROM e),
    cal AS (SELECT CAST(gs AS DATE) AS day
            FROM generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                 INTERVAL 1 DAY) t(gs)),
    g AS (SELECT u.user_id, cal.day FROM u CROSS JOIN cal),
    j AS (SELECT g.user_id, g.day, d.value FROM g
          LEFT JOIN d ON g.user_id = d.user_id AND g.day = d.day)
    SELECT user_id, CAST(day AS VARCHAR) AS day,
           last_value(value IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
    FROM j ORDER BY user_id ASC, day ASC"""

  // ---------------------------------------------------------------------
  // q102 — array higher-order-function kit over quantized embeddings:
  // filter / transform / aggregate / slice / array_max, all integer-exact.
  // (These HOFs are CodegenFallback in Spark 4 — fine here because the
  // arrays are short; the hot kernels elsewhere use native expressions.)
  def q102HofKit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.embeddings(spark, dir)
      .select($"vec_id", VectorOps.quantize($"embedding").as("q"))
      .select($"vec_id",
        size(filter($"q", x => x > 0)).cast("long").as("n_pos"),
        aggregate(slice($"q", 1, 8), lit(0L), (a, x) => a + x * x).as("sumsq_head8"),
        array_max(transform($"q", x => abs(x))).as("max_abs"),
        aggregate($"q", lit(0L), (a, x) => a + abs(x)).as("l1_norm"))
      .orderBy($"vec_id".asc)
  }
  val q102Oracle: String = """
    WITH e AS (SELECT vec_id,
        list_transform(embedding,
          x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS q
      FROM embeddings)
    SELECT vec_id,
      CAST(len(list_filter(q, x -> x > 0)) AS BIGINT) AS n_pos,
      CAST(list_sum(list_transform(q[1:8], x -> x * x)) AS BIGINT) AS sumsq_head8,
      list_max(list_transform(q, x -> abs(x))) AS max_abs,
      CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS l1_norm
    FROM e ORDER BY vec_id ASC"""

  // ---------------------------------------------------------------------
  // q103 — fixed-width histogram binning of l_extendedprice in exact
  // integer cents (bin = cents DIV 500000 ⇒ $5,000 buckets): the binning,
  // counting, and bounds all stay in BIGINT, so the histogram
  // hash-matches bit-for-bit. One map-side-combined exchange on bin id.
  def q103Histogram(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select(expr(
        "CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)").as("cents"))
      .withColumn("bin", expr("cents DIV 500000"))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        min($"cents").as("min_cents"), max($"cents").as("max_cents"))
      .orderBy($"bin".asc)
  }
  val q103Oracle: String = """
    SELECT cents // 500000 AS bin, COUNT(*) AS n,
           MIN(cents) AS min_cents, MAX(cents) AS max_cents
    FROM (SELECT CAST(round(CAST(l_extendedprice AS DOUBLE) * 100) AS BIGINT)
            AS cents FROM lineitem)
    GROUP BY 1 ORDER BY bin ASC"""

  // q221 — behavioral path mining: the top-20 3-step event-type paths
  // across all users, with occurrence and distinct-user counts — funnel
  // DISCOVERY (which journeys exist and how common they are), where
  // q100's funnel measures one predefined journey. Determinism: each
  // user's stream orders by (µs, event_id) — replay-exact, q101's
  // convention. Scale shape: per-user sequence assembly is ONE
  // partial-agg'd collect bounded by events-per-user (the sessionize
  // regime; a whale-user cap or per-session windowing is the documented
  // swap if user streams are unbounded), the path explode is linear in
  // events, and the report is a TakeOrdered over the path vocabulary.
  def q221EventPaths(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"),
        $"event_id")
    val seqs = e.groupBy($"user_id")
      .agg(sort_array(collect_list(
        struct($"us", $"event_id", $"event_type"))).as("s"))
      .select($"user_id", expr("transform(s, x -> x.event_type)").as("types"))
    val grams = seqs.filter(size($"types") >= 3)
      .select($"user_id", explode(expr(
        "transform(sequence(1, size(types) - 2), " +
          "i -> concat_ws(' > ', slice(types, i, 3)))")).as("path"))
    grams.groupBy($"path")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"n_occurrences".desc, $"path".asc)
      .limit(20)
  }
  val q221Oracle: String = """
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id
               FROM events),
    s AS (SELECT user_id,
            list(event_type ORDER BY us ASC, event_id ASC) AS types
          FROM e GROUP BY user_id),
    g AS (SELECT user_id,
            unnest(list_transform(generate_series(1, len(types) - 2),
              i -> array_to_string(types[i:i+2], ' > '))) AS path
          FROM s WHERE len(types) >= 3)
    SELECT path, COUNT(*) AS n_occurrences,
           COUNT(DISTINCT user_id) AS n_users
    FROM g GROUP BY path
    ORDER BY n_occurrences DESC, path ASC LIMIT 20"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q221_event_paths" -> (q221EventPaths _),
    "q98_gaps_islands" -> (q98GapsIslands _),
    "q99_cohort_retention" -> (q99CohortRetention _),
    "q100_funnel" -> (q100Funnel _),
    "q101_time_grid_ffill" -> (q101TimeGridFfill _),
    "q102_hof_kit" -> (q102HofKit _),
    "q103_histogram" -> (q103Histogram _))

  val oracles: Map[String, String] = Map(
    "q221_event_paths" -> q221Oracle,
    "q98_gaps_islands" -> q98Oracle,
    "q99_cohort_retention" -> q99Oracle,
    "q100_funnel" -> q100Oracle,
    "q101_time_grid_ffill" -> q101Oracle,
    "q102_hof_kit" -> q102Oracle,
    "q103_histogram" -> q103Oracle)
}
