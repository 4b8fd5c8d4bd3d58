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

  test("join hints steer the physical strategy (broadcast / merge / shuffle_hash)") {
    // At 100 TB the planner's size estimates can be wrong (post-filter
    // cardinalities, opaque UDF selectivity); hints are the operator's
    // manual override and must demonstrably reach the physical plan.
    val dir = "/root/testdata/sf0.001"
    val o = graft.tables.Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_custkey")
    val c = graft.tables.Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment")
    def planOf(df: org.apache.spark.sql.DataFrame): String = {
      df.collect()
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    val cond = $"o_custkey" === $"c_custkey"
    val merged = planOf(o.join(c.hint("merge"), cond))
    assert(merged.contains("SortMergeJoin") && !merged.contains("BroadcastHashJoin"),
      s"merge hint must force SMJ even for a broadcastable dim:\n${merged.take(600)}")
    val hashed = planOf(o.join(c.hint("shuffle_hash"), cond))
    assert(hashed.contains("ShuffledHashJoin"),
      s"shuffle_hash hint must force SHJ:\n${hashed.take(600)}")
    val bcast = planOf(o.join(c.hint("broadcast"), cond))
    assert(bcast.contains("BroadcastHashJoin"),
      s"broadcast hint must force BHJ:\n${bcast.take(600)}")
  }

  test("set-similarity join: exact verify, no false positives, finds dups") {
    val left = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated text about spark execution plans"),
      (4L, "short one")
    ).toDF("id", "body")
    val right = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // dup of 0
      (3L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 0
      (5L, "totally different content on another subject entirely")
    ).toDF("id", "body")
    val out = JoinOps.setSimilarityJoin(left, right, idCol = "id",
      textCol = "body", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    // identical texts share every minhash → collide in all bands → always
    // a candidate; exact verify gives jaccard 1.0 on 8 distinct 3-grams
    val exact = out.find(t => t._1 == 0L && t._2 == 1L)
    assert(exact.isDefined, s"identical pair (0,1) must be found, got ${out.toSeq}")
    assert(exact.get._3 == 8 && exact.get._4 == 8 && exact.get._5 == 8)
    assert(exact.get._6 == 1.0)
    // every emitted pair is exactly verified — recompute each Jaccard by
    // brute force and require agreement (no false positives by design)
    def grams(s: String) = s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val lTexts = Map(0L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "completely unrelated text about spark execution plans",
      4L -> "short one")
    val rTexts = Map(1L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "the quick brown fox jumps over the lazy dog tonight",
      5L -> "totally different content on another subject entirely")
    out.foreach { case (lid, rid, inter, nl, nr, j) =>
      val (a, b) = (grams(lTexts(lid)), grams(rTexts(rid)))
      assert(inter == (a & b).size && nl == a.size && nr == b.size,
        s"pair ($lid,$rid) must carry exact counts")
      assert(j >= 0.5 && math.abs(j - inter.toDouble / (a | b).size) < 1e-12)
    }
    // dissimilar pairs never pass the exact verify regardless of LSH luck
    assert(!out.exists(t => t._1 == 2L || t._1 == 4L || t._2 == 5L))
  }

  test("AQE splits the hot partition of a skewed sort-merge join") {
    // SCALE.md §6 claims AQE skew-join splitting is available as a runtime
    // lever — prove it: one key owns ~95% of the fact rows, thresholds
    // are scaled to the test data, and the finalized adaptive plan must
    // carry the skew=true marker while still computing the exact join.
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // hot key 0 (95% of fact rows) IS a dim key, so the split partition
      // also carries the bulk of the join output
      val fact = spark.range(200000)
        .select(when($"id" % 20 =!= 0, lit(0L)).otherwise($"id").as("k"),
          concat(lit("payload-payload-payload-"), $"id").as("payload"))
      val dim = spark.range(0, 200000, 1000).select($"id".as("k"),
        concat(lit("dim"), $"id").as("d"))
      val joined = fact.join(dim, Seq("k"))
      val n = joined.count()
      val expected = fact.groupBy($"k").count().as("f")
        .join(dim, Seq("k")).agg(sum($"count")).head().getLong(0)
      assert(n == expected && n >= 190000L, "skew-split join must stay exact")
      val run = joined.filter($"k".isNotNull) // fresh execution to stringify
      run.collect()
      val s = run.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(s.contains("skew=true"),
        s"AQE must mark the skewed join sides, plan was:\n${s.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
