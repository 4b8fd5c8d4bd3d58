package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** SQL-surface depth: recursive CTEs (Spark 4's WITH RECURSIVE), correlated
  * LATERAL subqueries, and incremental aggregate maintenance — the
  * iterate / per-row-subquery / maintain-don't-recompute shapes warehouses
  * lean on beyond plain SELECT.
  */
object SqlDepthQueries {

  // ---------------------------------------------------------------------
  // q112 — recursive CTE: walk each seed order key up its binary-ancestor
  // chain (node → node DIV 2) until the root. Spark 4 plans WITH RECURSIVE
  // as an iterative UnionLoop — each step is one distributed join-free
  // projection over the previous frontier, so depth bounds the iteration
  // count (≈ log₂(maxkey)), not the data size. All-integer arithmetic.
  def q112RecursiveCte(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("q112_orders")
    spark.sql("""
      WITH RECURSIVE walk (start, node, depth) AS (
        SELECT o_orderkey, o_orderkey, 0
        FROM q112_orders WHERE o_orderkey % 997 = 0
        UNION ALL
        SELECT start, node DIV 2, depth + 1 FROM walk WHERE node > 0)
      SELECT start, node, depth FROM walk
      ORDER BY start ASC, depth ASC""")
  }
  val q112Oracle: String = """
    WITH RECURSIVE walk AS (
      SELECT o_orderkey AS start, o_orderkey AS node, 0 AS depth
      FROM orders WHERE o_orderkey % 997 = 0
      UNION ALL
      SELECT start, node // 2, depth + 1 FROM walk WHERE node > 0)
    SELECT start, node, depth FROM walk ORDER BY start ASC, depth ASC"""

  // ---------------------------------------------------------------------
  // q113 — correlated LATERAL top-k: each customer's two largest orders
  // via a per-row subquery. Catalyst de-correlates this into a ranked
  // window over one join — per-customer top-k without a driver loop, the
  // same physical shape as q79's grouped top-k. (The DIV-100 bucket keeps
  // the customer list small enough that the oracle's O(customers ×
  // orders) lateral stays fast at sf0.1.)
  def q113LateralTopk(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("q113_orders")
    Tables.customer(spark, dir).createOrReplaceTempView("q113_customer")
    spark.sql("""
      SELECT c.c_custkey, t.o_orderkey,
             CAST(round(t.o_totalprice * 100) AS BIGINT) AS price_cents
      FROM q113_customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM q113_orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
      WHERE c.c_custkey % 100 = 0
      ORDER BY c.c_custkey ASC, price_cents DESC, o_orderkey ASC""")
  }
  val q113Oracle: String = """
    SELECT c.c_custkey, t.o_orderkey,
           CAST(round(t.o_totalprice * 100) AS BIGINT) AS price_cents
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) t
    WHERE c.c_custkey % 100 = 0
    ORDER BY c.c_custkey ASC, price_cents DESC, o_orderkey ASC"""

  // ---------------------------------------------------------------------
  // q114 — incremental aggregate maintenance: a per-customer revenue
  // aggregate is built from batch 1, then batch 2 arrives and the state
  // is MERGED (full outer join of partial sums — cost ∝ state ∪ delta),
  // never recomputed from raw history. The oracle recomputes from scratch
  // and must agree — the IVM correctness condition. Exact integer cents
  // make partial-sum merge order irrelevant.
  def q114IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    def partial(batch: DataFrame): DataFrame =
      batch.groupBy($"o_custkey")
        .agg(sum(cents).as("rev"), count(lit(1)).as("n"))
    val orders = Tables.orders(spark, dir)
    val state1 = partial(orders.filter($"o_orderkey" % 2 === 0))
    val delta = partial(orders.filter($"o_orderkey" % 2 =!= 0))
    val s = state1.select($"o_custkey", $"rev".as("rev_a"), $"n".as("n_a"))
    val d = delta.select($"o_custkey", $"rev".as("rev_b"), $"n".as("n_b"))
    s.join(d, Seq("o_custkey"), "full_outer")
      .select($"o_custkey",
        (coalesce($"rev_a", lit(0L)) + coalesce($"rev_b", lit(0L))).as("revenue_cents"),
        (coalesce($"n_a", lit(0L)) + coalesce($"n_b", lit(0L))).as("n_orders"))
      .orderBy($"o_custkey".asc)
  }
  val q114Oracle: String = """
    SELECT o_custkey,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey ORDER BY o_custkey ASC"""

  // ---------------------------------------------------------------------
  // q120 — incremental JOIN maintenance: q114's idea lifted from
  // aggregates to joins. With both sides receiving deltas, the maintained
  // result is the delta algebra
  //   J_new = (A₀⋈B₀) ∪ (ΔA⋈B₀) ∪ (A₀⋈ΔB) ∪ (ΔA⋈ΔB)
  // — the classic trap is dropping the ΔA⋈ΔB cross term. At scale A₀⋈B₀
  // is the stored join result (here recomputed inline for the oracle);
  // only the three delta terms touch new data, and each is an equi-join
  // the bucketed layout co-locates. The oracle full-recomputes A⋈B and
  // must agree — the IVM correctness condition. Exact integer cents.
  def q120IncrementalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
    val orders = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", cents.as("price_cents"))
    val dAPred = $"o_orderkey" % 4 === 0
    val dBPred = $"l_orderkey" % 5 === 0
    val (a0, dA) = (orders.filter(!dAPred), orders.filter(dAPred))
    val (b0, dB) = (li.filter(!dBPred), li.filter(dBPred))
    def j(a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, a("o_orderkey") === b("l_orderkey"))
        .select($"o_custkey", $"price_cents")
    j(a0, b0).unionByName(j(dA, b0))
      .unionByName(j(a0, dB)).unionByName(j(dA, dB))
      .groupBy($"o_custkey")
      .agg(sum($"price_cents").as("revenue_cents"), count(lit(1)).as("n_lines"))
      .orderBy($"o_custkey".asc)
  }
  val q120Oracle: String = """
    SELECT o_custkey,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_lines
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_custkey ORDER BY o_custkey ASC"""

  // ---------------------------------------------------------------------
  // q117 — the custom physical operator: per-customer top-2 orders through
  // graft.plans.TopKPerKeyExec (LogicalPlan + Strategy + SparkPlan), which
  // declares ClusteredDistribution + ordering and streams each partition
  // once with O(1) state — no rank column, no filter pass. Same semantics
  // as q113's lateral, different machinery; the oracle is the ranked
  // window formulation. PlanSpec pins that the custom node actually plans.
  def q117TopkExec(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, dir)
      .select($"o_custkey", $"o_orderkey",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_cents"))
    graft.plans.TopKPerKey.topK(spark, orders,
        keyCols = Seq($"o_custkey"),
        orderCols = Seq($"price_cents".desc, $"o_orderkey".asc), k = 2)
      .orderBy($"o_custkey".asc, $"price_cents".desc, $"o_orderkey".asc)
  }
  val q117Oracle: String = """
    SELECT o_custkey, o_orderkey, price_cents FROM (
      SELECT o_custkey, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
                        o_orderkey ASC) AS rn
      FROM orders)
    WHERE rn <= 2
    ORDER BY o_custkey ASC, price_cents DESC, o_orderkey ASC"""

  // ---------------------------------------------------------------------
  // q143 — incremental aggregate maintenance WITH RETRACTIONS (the Z-set
  // completion of q114's insert-only maintenance): a delete batch arrives
  // as negative-multiplicity deltas, the maintained state absorbs them by
  // the same merge-partials union — never a recompute — and groups whose
  // support reaches zero are dropped (the Z-set normalization step; a
  // maintained view must not retain empty groups the recompute wouldn't
  // produce). Cost ∝ state ∪ delta, one hash shuffle. The oracle
  // recomputes from the surviving rows and must agree exactly.
  def q143IncrementalRetract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cents = expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    val orders = Tables.orders(spark, dir)
    // maintained state: per-customer (sum, count) over ALL orders
    val state = orders.groupBy($"o_custkey")
      .agg(sum(cents).as("rev"), count(lit(1)).as("n"))
    // retraction batch: every 7th order is deleted → negative multiplicity
    val retract = orders.filter($"o_orderkey" % 7 === 0)
      .groupBy($"o_custkey")
      .agg((-sum(cents)).as("rev"), (-count(lit(1))).as("n"))
    state.unionByName(retract)
      .groupBy($"o_custkey")
      .agg(sum($"rev").as("revenue_cents"), sum($"n").as("n_orders"))
      .filter($"n_orders" > 0) // Z-set normalization: drop emptied groups
      .orderBy($"o_custkey".asc)
  }
  val q143Oracle: String = """
    SELECT o_custkey,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_orders
    FROM orders WHERE o_orderkey % 7 <> 0
    GROUP BY o_custkey ORDER BY o_custkey ASC"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q143_incremental_retract" -> (q143IncrementalRetract _),
    "q112_recursive_cte" -> (q112RecursiveCte _),
    "q113_lateral_topk" -> (q113LateralTopk _),
    "q114_incremental_agg" -> (q114IncrementalAgg _),
    "q117_topk_exec" -> (q117TopkExec _),
    "q120_incremental_join" -> (q120IncrementalJoin _))

  val oracles: Map[String, String] = Map(
    "q143_incremental_retract" -> q143Oracle,
    "q112_recursive_cte" -> q112Oracle,
    "q113_lateral_topk" -> q113Oracle,
    "q114_incremental_agg" -> q114Oracle,
    "q117_topk_exec" -> q117Oracle,
    "q120_incremental_join" -> q120Oracle)
}
