package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** Analytic-surface breadth: the full window-function kit, pivot/unpivot
  * reshaping, and cube grouping. All oracle-checked — every construct here
  * exists in DuckDB SQL, and rank-arithmetic doubles (percent_rank,
  * cume_dist) are exact small-integer ratios so they hash-match.
  */
object AnalyticQueries {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  // q65 — window-function kit over each customer's order history:
  // lag/lead, ntile, percent_rank, cume_dist, rank/dense_rank, and
  // first/last value over an explicit sliding ROWS frame. Unique
  // (ms, orderkey) tiebreak keeps every function deterministic.
  def q65WindowKit(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("ms").asc, col("o_orderkey").asc)
    val sliding = w.rowsBetween(-1, 1)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 100)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"),
        col("o_totalprice"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .withColumn("tile4", ntile(4).over(w))
      .withColumn("prank", percent_rank().over(w))
      .withColumn("cdist", cume_dist().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("nbr_first", first(col("o_orderkey")).over(sliding))
      .withColumn("nbr_last", last(col("o_orderkey")).over(sliding))
      .orderBy(col("o_custkey").asc, col("ms").asc, col("o_orderkey").asc)
  }
  val q65Oracle: String = """
    SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS ms, o_totalprice,
      lag(o_totalprice, 1) OVER w AS prev_price,
      lead(o_totalprice, 1) OVER w AS next_price,
      ntile(4) OVER w AS tile4,
      percent_rank() OVER w AS prank,
      cume_dist() OVER w AS cdist,
      rank() OVER w AS rnk,
      first_value(o_orderkey) OVER
        (w ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS nbr_first,
      last_value(o_orderkey) OVER
        (w ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS nbr_last
    FROM orders WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY epoch_ms(o_orderdate) ASC, o_orderkey ASC)
    ORDER BY o_custkey ASC, ms ASC, o_orderkey ASC"""

  // q66 — pivot: one row per user, event types fanned out to columns with
  // two measures each (count + decimal-exact value sum). The value list is
  // pinned so the output schema never depends on a distinct-scan.
  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  def q66Pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("user_id") < 50)
      .groupBy(col("user_id"))
      .pivot("event_type", eventTypes)
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
      .na.fill(0L, eventTypes.map(t => s"${t}_n"))
      .orderBy(col("user_id").asc)
  val q66Oracle: String = {
    val cols = eventTypes.map { t =>
      s"""COUNT(*) FILTER (WHERE event_type = '$t') AS ${t}_n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) FILTER (WHERE event_type = '$t')
           AS DOUBLE) AS ${t}_total"""
    }.mkString(",\n      ")
    s"""
    SELECT user_id, $cols
    FROM events WHERE user_id < 50
    GROUP BY user_id ORDER BY user_id ASC"""
  }

  // q67 — unpivot (melt): wide per-flag aggregates reshaped to long
  // (metric, val) rows. Spark's native unpivot; the oracle is the
  // portable UNION ALL spelling.
  def q67Unpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price")), "metric", "val")
      .orderBy(col("l_returnflag").asc, col("metric").asc)
  val q67Oracle: String = """
    WITH agg AS (
      SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, metric, val FROM (
      SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS val FROM agg
      UNION ALL
      SELECT l_returnflag, 'sum_price' AS metric, sum_price AS val FROM agg)
    ORDER BY l_returnflag ASC, metric ASC"""

  // q68 — cube: all four grouping combinations of (returnflag, linestatus)
  // in one pass, with grouping_id distinguishing subtotal levels.
  def q68Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
        grouping_id().as("gid"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"), col("gid"))
      .orderBy(col("gid").asc, col("rf").asc, col("ls").asc)
  val q68Oracle: String = """
    SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid ASC, rf ASC, ls ASC"""

  // q80 — exact second-moment statistics: population variance and
  // Pearson correlation computed from fixed-point integer power sums
  // (Σq, Σq², Σp, Σp², Σqp as DECIMAL(38,0) — exact, merge-order-free),
  // finished with the same one-rounding-per-op double arithmetic on both
  // engines. Built-in stddev/corr stream doubles through Welford-style
  // updates whose rounding depends on partition order — useless for a
  // cross-engine hash check; this formulation is the deterministic way
  // to do distributed statistics.
  def q80ExactStats(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val q = round(col("l_quantity")).cast("long")
    val p = round(col("l_extendedprice") * 100).cast("long")
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(q.cast(d38)).as("sq"), sum((q * q).cast(d38)).as("sqq"),
        sum(p.cast(d38)).as("sp"), sum((p * p).cast(d38)).as("spp"),
        sum((q * p).cast(d38)).as("sqp"))
      .select(col("l_returnflag"), col("n"),
        ((col("n") * col("sqq") - col("sq") * col("sq")).cast("double") /
          (col("n") * col("n")).cast("double")).as("var_qty"),
        ((col("n") * col("sqp") - col("sq") * col("sp")).cast("double") /
          sqrt((col("n") * col("sqq") - col("sq") * col("sq")).cast("double") *
            (col("n") * col("spp") - col("sp") * col("sp")).cast("double")))
          .as("corr_qty_price"))
      .orderBy(col("l_returnflag").asc)
  }
  val q80Oracle: String = """
    SELECT l_returnflag, n,
      CAST(n * sqq - sq * sq AS DOUBLE) / CAST(n * n AS DOUBLE) AS var_qty,
      CAST(n * sqp - sq * sp AS DOUBLE) /
        sqrt(CAST(n * sqq - sq * sq AS DOUBLE) *
             CAST(n * spp - sp * sp AS DOUBLE)) AS corr_qty_price
    FROM (
      SELECT l_returnflag, COUNT(*) AS n,
        SUM(CAST(q AS DECIMAL(38,0))) AS sq,
        SUM(CAST(q * q AS DECIMAL(38,0))) AS sqq,
        SUM(CAST(p AS DECIMAL(38,0))) AS sp,
        SUM(CAST(p * p AS DECIMAL(38,0))) AS spp,
        SUM(CAST(q * p AS DECIMAL(38,0))) AS sqp
      FROM (SELECT l_returnflag,
              CAST(round(l_quantity) AS BIGINT) AS q,
              CAST(round(l_extendedprice * 100) AS BIGINT) AS p
            FROM lineitem)
      GROUP BY l_returnflag)
    ORDER BY l_returnflag ASC"""

  // q83 — explicit GROUPING SETS (the general form cube/rollup sugar over;
  // SURVEY §2.4): three chosen aggregation levels in one pass — Spark
  // expands to one Expand + single shuffle, not three scans.
  def q83GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("q83_orders")
    spark.sql("""
      SELECT COALESCE(o_orderpriority, 'ALL') AS pri,
             COALESCE(o_orderstatus, 'ALL') AS status,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
             CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                  AS BIGINT) AS gid
      FROM q83_orders
      GROUP BY GROUPING SETS ((o_orderpriority),
                              (o_orderstatus),
                              (o_orderpriority, o_orderstatus))
      ORDER BY gid ASC, pri ASC, status ASC""")
  }
  val q83Oracle: String = """
    SELECT COALESCE(o_orderpriority, 'ALL') AS pri,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority),
                            (o_orderstatus),
                            (o_orderpriority, o_orderstatus))
    ORDER BY gid ASC, pri ASC, status ASC"""

  // q87 — two-stage salted aggregation, the skew lever for hot group keys
  // (SCALE.md §6) expressed inside the oracle gate: stage 1 aggregates
  // (key, salt) — a hot key's rows spread over 16 reducers — stage 2
  // combines the ≤16 partials per key. DECIMAL partials make the re-
  // aggregation exact, so the result hash-matches the plain GROUP BY the
  // oracle runs. Deterministic salt (hash of the row key) → reproducible.
  def q87SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("_salt", pmod(xxhash64(col("l_orderkey")), lit(16)))
      .groupBy(col("l_returnflag"), col("_salt"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 6))).as("q"),
        count(lit(1)).as("c"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("q")).cast("double").as("sum_qty"), sum(col("c")).as("n"))
      .orderBy(col("l_returnflag").asc)
  val q87Oracle: String = """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag ASC"""

  // q118 — TIME-RANGE window frame: per-customer rolling 90-day order
  // count and revenue, `RANGE BETWEEN <ms> PRECEDING AND CURRENT ROW`
  // over epoch-ms. Value-defined frames make peer rows (tied ms) see the
  // same aggregate, so the row-level output is deterministic without a
  // tiebreaker inside the frame spec. Revenue partials go through
  // DECIMAL(18,6) on both engines for bit-stable sums. Scale: one hash
  // exchange on o_custkey; the running frame is a single sorted pass per
  // partition (Spark's bounded-preceding range frame keeps a sliding
  // buffer, O(rows in 90 days) memory per key, no re-scan).
  private val ms90d = 90L * 86400000L
  def q118RangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("ms").asc)
      .rangeBetween(-ms90d, 0)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") < 200)
      .select(col("o_custkey"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"),
        col("o_totalprice"))
      .withColumn("n_90d", count(lit(1)).over(w))
      .withColumn("rev_90d",
        sum(col("o_totalprice").cast(DecimalType(18, 6))).over(w)
          .cast("double"))
      .drop("o_totalprice")
      .orderBy(col("o_custkey").asc, col("ms").asc, col("o_orderkey").asc)
  }
  val q118Oracle: String = s"""
    SELECT o_custkey, o_orderkey, ms,
           count(*) OVER w AS n_90d,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
             AS rev_90d
    FROM (SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS ms,
                 o_totalprice
          FROM orders WHERE o_custkey < 200)
    WINDOW w AS (PARTITION BY o_custkey ORDER BY ms ASC
                 RANGE BETWEEN $ms90d PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey ASC, ms ASC, o_orderkey ASC"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q65_window_kit" -> (q65WindowKit _),
    "q118_range_window" -> (q118RangeWindow _),
    "q66_pivot" -> (q66Pivot _),
    "q67_unpivot" -> (q67Unpivot _),
    "q68_cube" -> (q68Cube _),
    "q80_exact_stats" -> (q80ExactStats _),
    "q83_grouping_sets" -> (q83GroupingSets _),
    "q87_salted_agg" -> (q87SaltedAgg _))

  val oracles: Map[String, String] = Map(
    "q65_window_kit" -> q65Oracle,
    "q118_range_window" -> q118Oracle,
    "q66_pivot" -> q66Oracle,
    "q67_unpivot" -> q67Oracle,
    "q68_cube" -> q68Oracle,
    "q80_exact_stats" -> q80Oracle,
    "q83_grouping_sets" -> q83Oracle,
    "q87_salted_agg" -> q87Oracle)
}
