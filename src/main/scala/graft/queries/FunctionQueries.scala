package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Scalar-function breadth: date arithmetic, string kit, exact math,
  * regexp, and the built-in session_window. Everything here is
  * deterministic in IEEE/integer arithmetic (no libm transcendentals in
  * oracle-checked outputs — java.lang.Math and C libm can differ in the
  * last ulp).
  */
object FunctionQueries {

  // q58 — date/interval arithmetic on order dates.
  def q58DateArithmetic(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 200)
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).cast("string").as("order_day"),
        date_add(to_date(col("o_orderdate")), 30).cast("string").as("due_day"),
        last_day(to_date(col("o_orderdate"))).cast("string").as("month_end"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofweek(col("o_orderdate")).as("dow"),
        datediff(lit(java.sql.Date.valueOf("2002-01-01")), to_date(col("o_orderdate")))
          .as("days_to_2002"))
      .orderBy(col("o_orderkey").asc)
  val q58Oracle: String = """
    SELECT o_orderkey,
      CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_day,
      CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_day,
      CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
      year(o_orderdate) AS y, quarter(o_orderdate) AS q, month(o_orderdate) AS m,
      dayofweek(o_orderdate) + 1 AS dow,
      datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
    FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey ASC"""

  // q59 — string kit: pad/translate/initcap/levenshtein/split/nullif/
  // greatest/least.
  def q59StringKit(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        lpad(col("p_brand"), 12, "*").as("brand_padded"),
        translate(col("p_type"), "AEO", "aeo").as("type_translated"),
        initcap(col("p_name")).as("name_title"),
        levenshtein(col("p_brand"), lit("Brand#1")).as("brand_dist"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        nullif(col("p_type"), lit("PROMO")).as("type_or_null"),
        greatest(col("p_size"), lit(5)).as("size_floor5"),
        least(col("p_retailprice"), lit(950.0)).as("price_cap"))
      .orderBy(col("p_partkey").asc)
  val q59Oracle: String = """
    SELECT p_partkey,
      lpad(p_brand, 12, '*') AS brand_padded,
      translate(p_type, 'AEO', 'aeo') AS type_translated,
      array_to_string(list_transform(string_split(p_name, ' '),
        w -> upper(w[1]) || substr(w, 2)), ' ') AS name_title,
      levenshtein(p_brand, 'Brand#1') AS brand_dist,
      string_split(p_name, ' ')[1] AS first_word,
      nullif(p_type, 'PROMO') AS type_or_null,
      greatest(p_size, 5) AS size_floor5,
      least(p_retailprice, 950.0) AS price_cap
    FROM part ORDER BY p_partkey ASC"""

  // q60 — exact math: abs/sign/ceil/floor/mod/sqrt/round (no libm).
  def q60ExactMath(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("disc_dev"),
        signum(col("l_discount") - 0.05).as("disc_sign"),
        ceil(col("l_extendedprice") / 1000).as("price_k_ceil"),
        floor(col("l_quantity") / 7).as("qty_div7"),
        pmod(col("l_partkey"), lit(13L)).as("part_mod13"),
        sqrt(col("l_extendedprice")).as("price_sqrt"),
        round(col("l_extendedprice") * col("l_tax"), 3).as("tax_rounded"))
      // (orderkey, linenumber) is NOT unique in the synthetic lineitem
      // (~80 duplicate pairs with differing prices even under orderkey <
      // 100) — the ordering must be total over every projected column or
      // the engines' tie orders diverge whenever a sort implementation
      // changes; remaining ties are then identical tuples, which compare
      // equal in any order
      .orderBy(col("l_orderkey").asc, col("l_linenumber").asc,
        col("price_sqrt").asc, col("tax_rounded").asc, col("disc_dev").asc,
        col("qty_div7").asc, col("part_mod13").asc, col("price_k_ceil").asc,
        col("disc_sign").asc)
  val q60Oracle: String = """
    SELECT l_orderkey, l_linenumber,
      abs(l_discount - 0.05) AS disc_dev,
      CAST(sign(l_discount - 0.05) AS DOUBLE) AS disc_sign,
      CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
      CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
      l_partkey % 13 AS part_mod13,
      sqrt(l_extendedprice) AS price_sqrt,
      round(l_extendedprice * l_tax, 3) AS tax_rounded
    FROM lineitem WHERE l_orderkey < 100
    ORDER BY l_orderkey ASC, l_linenumber ASC, price_sqrt ASC,
      tax_rounded ASC, disc_dev ASC, qty_div7 ASC, part_mod13 ASC,
      price_k_ceil ASC, disc_sign ASC"""

  // q61 — regexp extract/replace/match with RE2-safe patterns.
  def q61Regexp(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)$", 1).as("id_digits"),
        regexp_replace(col("c_name"), "0+", "0").as("name_squeezed"),
        col("c_name").rlike("00[0-9]$").as("ends_low"),
        regexp_extract(col("c_mktsegment"), "^([A-Z]{4})", 1).as("seg4"))
      .orderBy(col("c_custkey").asc)
  val q61Oracle: String = """
    SELECT c_custkey,
      regexp_extract(c_name, '([0-9]+)$', 1) AS id_digits,
      regexp_replace(c_name, '0+', '0', 'g') AS name_squeezed,
      regexp_matches(c_name, '00[0-9]$') AS ends_low,
      regexp_extract(c_mktsegment, '^([A-Z]{4})', 1) AS seg4
    FROM customer ORDER BY c_custkey ASC"""

  // q62 — built-in session_window (gap 30 min): Spark's native form of
  // q54's hand-rolled sessionization; the oracle derives the same
  // boundaries with window functions. The ts is truncated to ms before
  // session_window so both engines decide gap breaks at the same
  // precision (the oracle's lag-diff works on epoch_ms; a true gap that
  // straddles exactly 30 min at sub-ms precision would otherwise
  // sessionize differently).
  def q62SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("ts", timestamp_millis(unix_millis(col("ts"))))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("start_ms"),
        col("n_events"))
      .orderBy(col("user_id").asc, col("start_ms").asc)
  val q62Oracle: String = """
    WITH marked AS (
      SELECT user_id, epoch_ms(ts) AS ms,
        CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL
               OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w >= 1800000
             THEN 1 ELSE 0 END AS is_break
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts) ASC, event_id ASC)),
    sessions AS (
      SELECT user_id, ms,
        SUM(is_break) OVER (PARTITION BY user_id ORDER BY ms ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS session_seq
      FROM marked)
    SELECT user_id, MIN(ms) AS start_ms, COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, session_seq
    ORDER BY user_id ASC, start_ms ASC"""

  // q97 — null-handling kit: NULLIF / COALESCE / null-safe equality (<=>,
  // SQL's IS NOT DISTINCT FROM) / IS NULL arithmetic, plus null-vs-empty
  // aggregation semantics (COUNT(col) skips nulls, SUM over all-null is
  // NULL → coalesced). The reference's SQL leans on these in the merge
  // predicates (SURVEY §2.8b NOT-IN null trap).
  def q97NullKit(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey"),
        expr("nullif(o_orderstatus, 'O')").as("s_null"),
        expr("coalesce(nullif(o_orderstatus, 'O'), 'open')").as("status2"),
        expr("nullif(o_orderstatus, 'O') <=> NULL").cast("int").as("was_open"),
        expr("nullif(o_orderstatus, 'O') <=> nullif(o_orderpriority, o_orderpriority)")
          .cast("int").as("both_null"),
        (col("o_totalprice").isNull).cast("int").as("price_null"))
      .orderBy(col("o_orderkey").asc)
  val q97Oracle: String = """
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS s_null,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status2,
           CAST(NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL AS INT)
             AS was_open,
           CAST(NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM
                NULLIF(o_orderpriority, o_orderpriority) AS INT) AS both_null,
           CAST(o_totalprice IS NULL AS INT) AS price_null
    FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey ASC"""

  // q121 — map-typed column kit: build a per-user map event_type→count
  // with map_from_entries over a collected struct array, interrogate it
  // (map_keys/size/element_at with a missing-key NULL), and explode the
  // entries back to rows. The map round-trip happens entirely in Spark;
  // the exploded, fully-ordered rows are what the oracle (a plain GROUP
  // BY reformulation) checks — complex-type plumbing with a scalar-exact
  // gate. Scale: one shuffle to the per-user agg; maps stay bounded by
  // the event-type cardinality, never by event count.
  def q121MapKit(spark: SparkSession, dir: String): DataFrame = {
    val perType = Tables.events(spark, dir)
      .filter(col("user_id") < 40)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val asMap = perType
      .groupBy(col("user_id"))
      .agg(map_from_entries(array_sort(collect_list(
        struct(col("event_type"), col("n"))))).as("m"))
      .select(col("user_id"),
        size(col("m")).cast("bigint").as("n_types"),
        element_at(col("m"), "view").as("n_view"),
        element_at(col("m"), "no_such_type").isNull.cast("int").as("missing_is_null"),
        explode(map_entries(col("m"))).as("e"))
    asMap.select(col("user_id"), col("n_types"), col("n_view"),
        col("missing_is_null"),
        col("e.key").as("event_type"), col("e.value").as("n"))
      .orderBy(col("user_id").asc, col("event_type").asc)
  }
  val q121Oracle: String = """
    WITH per_type AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events WHERE user_id < 40 GROUP BY user_id, event_type),
    per_user AS (
      SELECT user_id, COUNT(*) AS n_types,
             MAX(CASE WHEN event_type = 'view' THEN n END) AS n_view,
             CAST(1 AS INT) AS missing_is_null
      FROM per_type GROUP BY user_id)
    SELECT p.user_id, u.n_types, u.n_view, u.missing_is_null,
           p.event_type, p.n
    FROM per_type p JOIN per_user u USING (user_id)
    ORDER BY p.user_id ASC, p.event_type ASC"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q97_null_kit" -> (q97NullKit _),
    "q121_map_kit" -> (q121MapKit _),
    "q58_date_arithmetic" -> (q58DateArithmetic _),
    "q59_string_kit" -> (q59StringKit _),
    "q60_exact_math" -> (q60ExactMath _),
    "q61_regexp" -> (q61Regexp _),
    "q62_session_window" -> (q62SessionWindow _))

  val oracles: Map[String, String] = Map(
    "q97_null_kit" -> q97Oracle,
    "q121_map_kit" -> q121Oracle,
    "q58_date_arithmetic" -> q58Oracle,
    "q59_string_kit" -> q59Oracle,
    "q60_exact_math" -> q60Oracle,
    "q61_regexp" -> q61Oracle,
    "q62_session_window" -> q62Oracle)
}
