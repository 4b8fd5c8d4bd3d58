package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** Relational operator inventory (SURVEY.md §2) re-expressed over the
  * harness test tables, each with a DuckDB oracle.
  *
  * Determinism contract with the oracle:
  *  - Money/measure aggregates go through `CAST(x AS DECIMAL(18,6))` before
  *    SUM (exact, order-independent), then `CAST(... AS DOUBLE)` at the end.
  *    Per-row double arithmetic is IEEE-identical in Spark and DuckDB; the
  *    decimal cast absorbs summation-order divergence.
  *  - Every result is fully ordered with unique tie-breaker columns.
  *  - `events.ts` has shipped as both TIMESTAMP(NANOS) and
  *    TIMESTAMP(MICROS) across testdata drops; [[Tables.events]]
  *    normalizes to micros, so outputs only expose it via epoch_ms /
  *    date casts (identical truncation on both engines either way).
  */
object CoreQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 6))
  /** Order-independent exact sum of a (≤6-decimal) double expression. */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")
  /** Deterministic average: exact decimal sum / count, divided as doubles. */
  private def davg(c: Column): Column = dsum(c) / count(lit(1))

  // Oracle-side spellings of the same helpers.
  private def oSum(e: String): String = s"CAST(SUM(CAST(($e) AS DECIMAL(18,6))) AS DOUBLE)"
  private def oAvg(e: String): String = s"${oSum(e)} / COUNT(*)"

  // ---------------------------------------------------------------------
  // q01 — grouped aggregation, TPC-H Q1 shape (SURVEY §2.4 A1).
  // Ref: sql/queries.sql:24-32 (join+SUM+sort reward report generalized).
  def q01PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1999-12-31 00:00:00")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        davg($"l_quantity").as("avg_qty"),
        davg($"l_extendedprice").as("avg_price"),
        davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  val q01Oracle: String = s"""
    SELECT l_returnflag, l_linestatus,
      ${oSum("l_quantity")} AS sum_qty,
      ${oSum("l_extendedprice")} AS sum_base_price,
      ${oSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
      ${oSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
      ${oAvg("l_quantity")} AS avg_qty,
      ${oAvg("l_extendedprice")} AS avg_price,
      ${oAvg("l_discount")} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1999-12-31 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus"""

  // ---------------------------------------------------------------------
  // q02 — top-k by sort (SURVEY §2.5 W1; ref sql/queries.sql:8,19).
  // Spark plans TakeOrderedAndProject: true top-k, no global sort.
  def q02TopkOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(10)
  }
  val q02Oracle: String = """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""

  // ---------------------------------------------------------------------
  // q03 — star join fact→dim + grouped SUM + sort: the reference's
  // rewards-by-member report (sql/queries.sql:24-32) over customer/orders.
  // Dim side is broadcast (small), fact side streams.
  def q03RevenueByCustomer(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy($"c_custkey", $"c_name")
      .agg(dsum($"o_totalprice").as("total_spent"), count(lit(1)).as("order_count"))
      .orderBy($"total_spent".desc, $"c_custkey".asc)
      .limit(20)
  }
  val q03Oracle: String = s"""
    SELECT c_custkey, c_name, ${oSum("o_totalprice")} AS total_spent,
           COUNT(*) AS order_count
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY total_spent DESC, c_custkey ASC LIMIT 20"""

  // ---------------------------------------------------------------------
  // q04 — second star join: rewards-by-quest analog (sql/queries.sql:36-45)
  // as revenue by part brand. lineitem⋈part with broadcast dim.
  def q04RevenueByBrand(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy($"p_brand")
      .agg(
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        dsum($"l_quantity").as("total_qty"),
        count(lit(1)).as("line_count"))
      .orderBy($"revenue".desc, $"p_brand".asc)
  }
  val q04Oracle: String = s"""
    SELECT p_brand,
      ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      ${oSum("l_quantity")} AS total_qty,
      COUNT(*) AS line_count
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand ORDER BY revenue DESC, p_brand ASC"""

  // ---------------------------------------------------------------------
  // q05 — 5-way star join through the dimension chain
  // lineitem⋈orders⋈customer⋈nation⋈region (join reorder + broadcast).
  def q05RevenueByRegionNation(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name", $"n_name")
      .agg(
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        count(lit(1)).as("line_count"))
      .orderBy($"r_name".asc, $"n_name".asc)
  }
  val q05Oracle: String = s"""
    SELECT r_name, n_name,
      ${oSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
      COUNT(*) AS line_count
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name ORDER BY r_name ASC, n_name ASC"""

  // ---------------------------------------------------------------------
  // q06 — selective filter + arithmetic sum (TPC-H Q6 shape): predicate
  // pushdown to the parquet scan, no shuffle beyond the final agg.
  def q06ForecastRevenue(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
              $"l_shipdate" <  lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
              $"l_discount" >= 0.05 && $"l_discount" <= 0.07 && $"l_quantity" < 24)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
           count(lit(1)).as("n_lines"))
  }
  val q06Oracle: String = s"""
    SELECT ${oSum("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""

  // ---------------------------------------------------------------------
  // q07 — latest-per-key dedup window (SURVEY §2.5 W2 / §2.6 ST5; ref
  // sql/incremental_sync_members.sql:40). row_number over (key, ts desc).
  def q07LatestEventPerUser(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // order at micros (what Spark actually has after the nanos truncation)
    // with the event_id tiebreak the oracle mirrors — ordering by raw ts
    // would let DuckDB's nanosecond precision pick a different winner on
    // sub-microsecond ties
    val w = Window.partitionBy($"user_id")
      .orderBy(unix_micros($"ts").desc, $"event_id".desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type",
              unix_millis($"ts").as("epoch_ms"), $"value")
      .orderBy($"user_id".asc)
  }
  val q07Oracle: String = """
    SELECT user_id, event_id, event_type, epoch_ms(ts) AS epoch_ms, value
    FROM (SELECT *, row_number() OVER
            (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1 ORDER BY user_id ASC"""

  // ---------------------------------------------------------------------
  // q08 — anti join (SURVEY §2.3 J3: delete-semi-join / NOT IN rewrite,
  // ref sql/incremental_sync_members.sql:44): customers with no orders.
  def q08CustomersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey".asc)
  }
  val q08Oracle: String = """
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey ASC"""

  // ---------------------------------------------------------------------
  // q09 — semi join: suppliers in nations that have customers (EXISTS).
  def q09SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = Tables.supplier(spark, dir)
    val c = Tables.customer(spark, dir)
    s.join(c, s("s_nationkey") === c("c_nationkey"), "left_semi")
      .select($"s_suppkey", $"s_name", $"s_nationkey")
      .orderBy($"s_suppkey".asc)
  }
  val q09Oracle: String = """
    SELECT s_suppkey, s_name, s_nationkey FROM supplier
    WHERE EXISTS (SELECT 1 FROM customer WHERE c_nationkey = s_nationkey)
    ORDER BY s_suppkey ASC"""

  // ---------------------------------------------------------------------
  // q10 — scalar string surface (SURVEY §2.2 P6/P7/P8/P12): charset LTRIM
  // (ref sql/initial_load_members.sql:3), LIKE with escape
  // (ref sql/incremental_sync_members.sql:31), concat, substring, casts.
  def q10StringFuncs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir)
      .select(
        $"c_custkey",
        ltrim($"c_name", "Custome#r").as("id_digits"),          // charset ltrim, §2.8a
        regexp_replace($"c_name", "^Customer#", "").as("id_strict"), // strict prefix strip
        concat($"c_mktsegment", lit("_"), $"c_nationkey".cast("string")).as("seg_nation"),
        substring($"c_name", 1, 8).as("name_prefix"),
        upper($"c_mktsegment").as("seg_upper"),
        $"c_acctbal".cast("string").as("bal_str"),
        $"c_name".like("Customer#0000000__").as("is_low_id"))
      .filter($"c_name".like("Customer#%"))
      .orderBy($"c_custkey".asc)
  }
  val q10Oracle: String = """
    SELECT c_custkey,
      LTRIM(c_name, 'Custome#r') AS id_digits,
      REGEXP_REPLACE(c_name, '^Customer#', '') AS id_strict,
      c_mktsegment || '_' || CAST(c_nationkey AS VARCHAR) AS seg_nation,
      SUBSTRING(c_name, 1, 8) AS name_prefix,
      UPPER(c_mktsegment) AS seg_upper,
      CAST(c_acctbal AS VARCHAR) AS bal_str,
      c_name LIKE 'Customer#0000000__' AS is_low_id
    FROM customer WHERE c_name LIKE 'Customer#%'
    ORDER BY c_custkey ASC"""

  // ---------------------------------------------------------------------
  // q11 — JSON path extraction (SURVEY §2.2 P2/P4/P5; ref
  // scripts/setup_redshift.sh:95-103 json_extract_path_text).
  def q11JsonExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .groupBy($"event_type")
      .agg(sum($"k").as("sum_k"), count(lit(1)).as("n"),
           min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type".asc)
  }
  val q11Oracle: String = """
    SELECT event_type, CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(*) AS n,
           CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type ORDER BY event_type ASC"""

  // ---------------------------------------------------------------------
  // q12 — epoch-ms → timestamp → date pipeline (SURVEY §2.2 P9/P11; ref
  // sql/incremental_sync_members.sql:28 TIMESTAMP 'epoch' + n/1000 * ...).
  // Integer division truncates to whole seconds, reproduced exactly.
  def q12EpochSeconds(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_id",
        unix_millis($"ts").as("epoch_ms"),
        (unix_millis($"ts") / 1000).cast("long").as("epoch_s"),
        to_date(timestamp_seconds((unix_millis($"ts") / 1000).cast("long")))
          .cast("string").as("event_date"))
      .orderBy($"event_id".asc)
  }
  val q12Oracle: String = """
    SELECT event_id, epoch_ms(ts) AS epoch_ms,
      epoch_ms(ts) // 1000 AS epoch_s,
      CAST(CAST(to_timestamp(epoch_ms(ts) // 1000) AS DATE) AS VARCHAR) AS event_date
    FROM events ORDER BY event_id ASC"""

  // ---------------------------------------------------------------------
  // q13 — date-trunc grouping (SURVEY §2.2 P11; ref sql/queries.sql:18
  // TRUNC(ts) = CURRENT_DATE, with a fixed date for determinism).
  def q13DailyCounts(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(to_date($"ts").cast("string").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
      .orderBy($"day".asc, $"event_type".asc)
  }
  val q13Oracle: String = s"""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
           COUNT(*) AS n, ${oSum("value")} AS total_value
    FROM events GROUP BY 1, 2 ORDER BY day ASC, event_type ASC"""

  // ---------------------------------------------------------------------
  // q14 — distinct aggregation: exact COUNT(DISTINCT) per group.
  def q14DistinctUsers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"),
           count(lit(1)).as("n_events"))
      .orderBy($"event_type".asc)
  }
  val q14Oracle: String = """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type ASC"""

  // ---------------------------------------------------------------------
  // q15 — set operators: UNION / INTERSECT / EXCEPT (engine layer; the
  // reference's delete-then-insert upsert is the EXCEPT∪stage equivalent,
  // SURVEY §2.5).
  def q15SetOps(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val bigSpenders = c.filter($"c_acctbal" > 5000).select($"c_custkey")
    val furniture = c.filter($"c_mktsegment" === "FURNITURE").select($"c_custkey")
    val machinery = c.filter($"c_mktsegment" === "MACHINERY").select($"c_custkey")
    bigSpenders.intersect(furniture)
      .union(bigSpenders.intersect(machinery))
      .except(c.filter($"c_nationkey" < 2).select($"c_custkey"))
      .orderBy($"c_custkey".asc)
  }
  val q15Oracle: String = """
    SELECT c_custkey FROM (
      (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
       INTERSECT
       SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE')
      UNION ALL
      (SELECT c_custkey FROM customer WHERE c_acctbal > 5000
       INTERSECT
       SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      EXCEPT
      SELECT c_custkey FROM customer WHERE c_nationkey < 2)
    ORDER BY c_custkey ASC"""

  // ---------------------------------------------------------------------
  // q119 — bag-semantics set operators: INTERSECT ALL / EXCEPT ALL keep
  // multiplicities (q15's distinct forms collapse them). The multiset
  // difference of supplier keys between two order-priority slices of
  // lineitem is exactly the "how many MORE times" question bag semantics
  // answer. Duplicate output rows are identical, so ORDER BY the value is
  // fully deterministic for the hash compare.
  def q119SetOpsAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
    def side(flag: String) = li.filter($"l_returnflag" === flag)
      .filter($"l_suppkey" < 40).select($"l_suppkey")
    val a = side("A"); val b = side("R")
    a.intersectAll(b).select(lit("intersect_all").as("op"), $"l_suppkey")
      .unionByName(a.exceptAll(b).select(lit("except_all").as("op"), $"l_suppkey"))
      .orderBy($"op".asc, $"l_suppkey".asc)
  }
  val q119Oracle: String = """
    SELECT 'intersect_all' AS op, l_suppkey FROM (
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A' AND l_suppkey < 40
      INTERSECT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R' AND l_suppkey < 40)
    UNION ALL
    SELECT 'except_all' AS op, l_suppkey FROM (
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A' AND l_suppkey < 40
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R' AND l_suppkey < 40)
    ORDER BY op ASC, l_suppkey ASC"""

  // ---------------------------------------------------------------------
  // q16 — HAVING: post-aggregation filter.
  def q16HavingFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("spent"))
      .filter($"n_orders" >= 12)
      .orderBy($"o_custkey".asc)
  }
  val q16Oracle: String = s"""
    SELECT o_custkey, COUNT(*) AS n_orders, ${oSum("o_totalprice")} AS spent
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
    ORDER BY o_custkey ASC"""

  // ---------------------------------------------------------------------
  // q17 — CASE WHEN conditional aggregation (pivot-style).
  def q17CaseWhen(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .agg(
        sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("n_finished"),
        sum(when($"o_orderstatus" === "O", 1L).otherwise(0L)).as("n_open"),
        sum(when($"o_orderstatus" === "P", 1L).otherwise(0L)).as("n_pending"),
        dsum(when($"o_orderstatus" === "F", $"o_totalprice").otherwise(lit(0.0)))
          .as("finished_value"))
      .orderBy($"o_orderpriority".asc)
  }
  val q17Oracle: String = s"""
    SELECT o_orderpriority,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
      ${oSum("CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END")} AS finished_value
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority ASC"""

  // ---------------------------------------------------------------------
  // q18 — window functions: running sum + rank + lag per customer.
  def q18WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    Tables.orders(spark, dir)
      .filter($"o_custkey" < 30)
      .withColumn("running_spent",
        sum(dec($"o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .withColumn("order_rank", row_number().over(w))
      .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
      .select($"o_custkey", $"o_orderkey",
        // o_orderdate is TIMESTAMP_NTZ in parquet; cast to TIMESTAMP (session
        // TZ pinned to UTC) so unix_millis resolves.
        unix_millis($"o_orderdate".cast("timestamp")).as("order_epoch_ms"),
        $"o_totalprice", $"running_spent", $"order_rank", $"prev_price")
      .orderBy($"o_custkey".asc, $"order_rank".asc)
  }
  val q18Oracle: String = """
    SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS order_epoch_ms,
      o_totalprice,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE) AS running_spent,
      row_number() OVER w AS order_rank,
      lag(o_totalprice, 1) OVER w AS prev_price
    FROM orders WHERE o_custkey < 30
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey ASC, order_rank ASC"""

  // ---------------------------------------------------------------------
  // q19 — scalar subquery threshold (deterministic decimal-exact avg).
  def q19AboveAvgOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val threshold = o.agg((dsum($"o_totalprice") * 1.5 / count(lit(1))).as("t"))
    o.join(broadcast(threshold))
      .filter($"o_totalprice" > $"t")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_orderkey".asc)
  }
  val q19Oracle: String = s"""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_totalprice > (SELECT ${oSum("o_totalprice")} * 1.5 / COUNT(*) FROM orders)
    ORDER BY o_orderkey ASC"""

  // ---------------------------------------------------------------------
  // q20 — ungrouped MIN/MAX/COUNT: the watermark read (SURVEY §2.4 A2/A5;
  // ref sql/incremental_sync_members.sql:11-12).
  def q20Watermark(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .agg(
        max(unix_millis($"ts")).as("max_epoch_ms"),
        min(unix_millis($"ts")).as("min_epoch_ms"),
        count(lit(1)).as("n"),
        countDistinct($"user_id").as("n_users"))
  }
  val q20Oracle: String = """
    SELECT MAX(epoch_ms(ts)) AS max_epoch_ms, MIN(epoch_ms(ts)) AS min_epoch_ms,
           COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users
    FROM events"""

  // ---------------------------------------------------------------------
  // q21 — grouping sets / rollup (engine layer): revenue by (region, nation)
  // with subtotals. Deterministic ordering with NULL-safe keys.
  def q21Rollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("total_bal"))
      .select(coalesce($"r_name", lit("ALL")).as("region"),
              coalesce($"n_name", lit("ALL")).as("nation"),
              $"n_customers", $"total_bal")
      .orderBy($"region".asc, $"nation".asc)
  }
  val q21Oracle: String = s"""
    SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
           COUNT(*) AS n_customers, ${oSum("c_acctbal")} AS total_bal
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region ASC, nation ASC"""

  // ---------------------------------------------------------------------
  // q22 — CDC merge semantics in batch (SURVEY §2.6 ST5/ST6): latest event
  // per user wins; a final 'error' event acts as REMOVE and deletes the key.
  def q22CdcMergeSemantics(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // micros + event_id ordering for oracle parity (see q07)
    val w = Window.partitionBy($"user_id")
      .orderBy(unix_micros($"ts").desc, $"event_id".desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"event_type" =!= "error")
      .select($"user_id", $"event_id".as("last_event_id"),
              $"event_type".as("last_event_type"), $"value".as("last_value"))
      .orderBy($"user_id".asc)
  }
  val q22Oracle: String = """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
           value AS last_value
    FROM (SELECT *, row_number() OVER
            (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
          FROM events)
    WHERE rn = 1 AND event_type <> 'error'
    ORDER BY user_id ASC"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_topk_orders" -> (q02TopkOrders _),
    "q03_revenue_by_customer" -> (q03RevenueByCustomer _),
    "q04_revenue_by_brand" -> (q04RevenueByBrand _),
    "q05_revenue_by_region_nation" -> (q05RevenueByRegionNation _),
    "q06_forecast_revenue" -> (q06ForecastRevenue _),
    "q07_latest_event_per_user" -> (q07LatestEventPerUser _),
    "q08_customers_without_orders" -> (q08CustomersWithoutOrders _),
    "q09_semi_join" -> (q09SemiJoin _),
    "q10_string_funcs" -> (q10StringFuncs _),
    "q11_json_extract" -> (q11JsonExtract _),
    "q12_epoch_seconds" -> (q12EpochSeconds _),
    "q13_daily_counts" -> (q13DailyCounts _),
    "q14_distinct_users" -> (q14DistinctUsers _),
    "q15_set_ops" -> (q15SetOps _),
    "q119_set_ops_all" -> (q119SetOpsAll _),
    "q16_having_filter" -> (q16HavingFilter _),
    "q17_case_when" -> (q17CaseWhen _),
    "q18_window_running" -> (q18WindowRunning _),
    "q19_above_avg_orders" -> (q19AboveAvgOrders _),
    "q20_watermark" -> (q20Watermark _),
    "q21_rollup" -> (q21Rollup _),
    "q22_cdc_merge_semantics" -> (q22CdcMergeSemantics _))

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Oracle,
    "q02_topk_orders" -> q02Oracle,
    "q03_revenue_by_customer" -> q03Oracle,
    "q04_revenue_by_brand" -> q04Oracle,
    "q05_revenue_by_region_nation" -> q05Oracle,
    "q06_forecast_revenue" -> q06Oracle,
    "q07_latest_event_per_user" -> q07Oracle,
    "q08_customers_without_orders" -> q08Oracle,
    "q09_semi_join" -> q09Oracle,
    "q10_string_funcs" -> q10Oracle,
    "q11_json_extract" -> q11Oracle,
    "q12_epoch_seconds" -> q12Oracle,
    "q13_daily_counts" -> q13Oracle,
    "q14_distinct_users" -> q14Oracle,
    "q15_set_ops" -> q15Oracle,
    "q119_set_ops_all" -> q119Oracle,
    "q16_having_filter" -> q16Oracle,
    "q17_case_when" -> q17Oracle,
    "q18_window_running" -> q18Oracle,
    "q19_above_avg_orders" -> q19Oracle,
    "q20_watermark" -> q20Oracle,
    "q21_rollup" -> q21Oracle,
    "q22_cdc_merge_semantics" -> q22Oracle)
}
