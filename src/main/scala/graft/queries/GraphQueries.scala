package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Iterative graph analytics on derived relational graphs. q93's
  * connected components covered the propagate-to-fixpoint shape; PageRank
  * adds the other canonical iterative pattern — weighted neighborhood
  * aggregation with a damping base — in exact integer arithmetic so a SQL
  * oracle replays it bit-for-bit.
  */
object GraphQueries {

  /** Total rank mass: integer "micro-rank" units so every division is a
    * BIGINT floor — no floating point anywhere in the iteration, hence
    * engine-exact (the same trick as q60/q80/q107's exact statistics). */
  private val Mass = 1000000000000L
  private val Iters = 5

  // ---------------------------------------------------------------------
  // q138 — PageRank (damping 0.85, 5 iterations) over a link graph
  // derived deterministically from orders: customer u endorses customer
  // (o_orderkey mod |customers|) for each of u's orders (distinct pairs).
  // Plan shape per iteration: edges ⋈ ranks on src (one hash shuffle —
  // both sides pre-partitioned on the join key after iteration 1, and at
  // 100 TB the edge table is bucketed by src so ranks is the only moving
  // side) → partial-aggregated sum per dst → left join back to the node
  // set. Iteration count is fixed (5), so lineage stays bounded without
  // checkpointing; longer schedules would localCheckpoint every ~10
  // rounds like q93. Dangling mass leaks (the standard simplified
  // formulation) — identically in both engines. Floor-divisions make
  // every intermediate a deterministic BIGINT: rank_{t+1}(v) =
  // base + 85·Σ_{u→v} (rank_t(u) DIV outdeg(u)) DIV 100.
  def q138PageRank(spark: SparkSession, dir: String): DataFrame = {
    val customers = Tables.customer(spark, dir)
    val nC = customers.count()
    val base = (15L * Mass) / (100L * nC)
    val edges = Tables.orders(spark, dir)
      .select(col("o_custkey").as("src"),
        (col("o_orderkey") % nC).as("dst"))
      .distinct()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    // edge list with out-degree attached, reused every iteration
    val esrc = edges.join(deg, "src").persist()
    val nodes = customers.select(col("c_custkey").as("v"))
    var ranks = nodes.withColumn("r", lit(Mass / nC))
    (1 to Iters).foreach { _ =>
      val contrib = esrc.join(ranks, esrc("src") === ranks("v"))
        .select(col("dst"), expr("r DIV d").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, nodes("v") === contrib("dst"), "left")
        .select(nodes("v"),
          expr(s"$base + (85 * coalesce(s, 0L)) DIV 100").as("r"))
    }
    ranks.orderBy(col("r").desc, col("v").asc).limit(20)
      .select(col("v").as("c_custkey"), col("r").as("rank_micros"))
  }
  val q138Oracle: String = {
    val rounds = (1 to Iters).map { i =>
      val p = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (
        SELECT e.dst AS v, SUM(r.r // d.d) AS s
        FROM edges e JOIN $p r ON e.src = r.v JOIN deg d ON e.src = d.src
        GROUP BY e.dst),
      r$i AS (
        SELECT r0.v,
               (15 * ${Mass} // (100 * (SELECT n FROM nc)))
                 + (85 * COALESCE(c$i.s, 0)) // 100 AS r
        FROM r0 LEFT JOIN c$i ON r0.v = c$i.v)"""
    }.mkString(",\n      ")
    s"""
    WITH nc AS (SELECT COUNT(*) AS n FROM customer),
      edges AS (
        SELECT DISTINCT o_custkey AS src,
               o_orderkey % (SELECT n FROM nc) AS dst
        FROM orders),
      deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
      r0 AS (
        SELECT c_custkey AS v, ${Mass} // (SELECT n FROM nc) AS r
        FROM customer),
      $rounds
    SELECT v AS c_custkey, CAST(r AS BIGINT) AS rank_micros
    FROM r$Iters ORDER BY r DESC, v ASC LIMIT 20"""
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_pagerank" -> (q138PageRank _))

  val oracles: Map[String, String] = Map(
    "q138_pagerank" -> q138Oracle)
}
