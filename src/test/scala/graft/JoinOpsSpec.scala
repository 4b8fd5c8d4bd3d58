package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.operators.JoinOps

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the unsalted join result") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.tables.Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    val p = graft.tables.Tables.part(spark, dir)
      .select($"p_partkey".as("l_partkey"), $"p_brand")
    val plain = li.join(p, Seq("l_partkey"))
      .groupBy($"p_brand").agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = JoinOps.saltedEquiJoin(li, p, "l_partkey", saltFactor = 7)
      .groupBy($"p_brand").agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      val dir = "/root/testdata/sf0.001"
      val orders = graft.tables.Tables.orders(spark, dir)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val li = graft.tables.Tables.lineitem(spark, dir)
        .select($"l_orderkey".as("o_orderkey"), $"l_quantity")
      val bucketed = JoinOps.bucketize(spark,
        Map("b_orders" -> orders, "b_lineitem" -> li), "o_orderkey", buckets = 4)
      val joined = bucketed("b_orders").join(bucketed("b_lineitem"), Seq("o_orderkey"))
      // execute first: a regression that adds a shuffle would wrap the plan
      // in AdaptiveSparkPlanExec, which hides its subtree from collect() —
      // the string of the finalized plan can't lie (count() would build a
      // separate QueryExecution, so materialize this one directly)
      val nRows = joined.collect().length.toLong
      val planStr = joined.queryExecution.executedPlan.toString
      assert(!planStr.contains("Exchange hashpartitioning") &&
        joined.queryExecution.executedPlan.collect {
          case s: ShuffleExchangeExec => s
        }.isEmpty,
        s"expected co-located bucketed join, plan was:\n$planStr")
      // and it still computes the right thing
      assert(nRows == orders.join(li, Seq("o_orderkey")).count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
