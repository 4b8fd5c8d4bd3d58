package graft

import org.apache.spark.sql.functions._

import graft.operators.JoinOps

/** As-of and range join semantics on hand-computable fixtures, plus the
  * physical-plan property that makes them scale (no nested-loop join).
  */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof backward join picks latest right row at-or-before each left row") {
    val left = Seq(
      (1L, 100L, "l1"), (1L, 200L, "l2"), (1L, 50L, "l0"),
      (2L, 100L, "l3")).toDF("k", "ms", "name")
    val right = Seq(
      (1L, 100L, 10.0, 1L), // exactly at l1's ts -> matches l1 and l2
      (1L, 100L, 20.0, 2L), // same (k, ms), higher tiebreak -> wins
      (1L, 150L, 30.0, 3L), // between l1 and l2 -> matches l2
      (3L, 10L, 99.0, 4L)   // other key -> never matches
    ).toDF("k", "ms", "v", "tb")
      .select($"k", $"ms", $"ms".as("r_ms"), $"v".as("r_v"), $"tb")

    val out = JoinOps.asofJoinBackward(left, right, Seq("k"), "ms",
        Seq("r_ms", "r_v"), "tb")
      .orderBy($"k", $"ms")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))

    assert(out.toSeq == Seq(
      (1L, 50L, "l0", None, None),              // before any right row
      (1L, 100L, "l1", Some(100L), Some(20.0)), // equal ts matches, max tb wins
      (1L, 200L, "l2", Some(150L), Some(30.0)), // latest at-or-before
      (2L, 100L, "l3", None, None)))            // key with no right rows
  }

  test("asof tolerance nulls matches older than the staleness bound") {
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (1L, 1000L, "l3"))
      .toDF("k", "ms", "name")
    val right = Seq((1L, 90L, 10.0, 1L))
      .toDF("k", "ms", "v", "tb")
      .select($"k", $"ms", $"v".as("r_v"), $"tb")
    val out = JoinOps.asofJoinBackward(left, right, Seq("k"), "ms",
        Seq("r_v"), "tb", tolerance = Some(150L))
      .orderBy($"ms")
      .collect().map(r => (r.getLong(1), Option(r.get(3))))
    assert(out.toSeq == Seq(
      (100L, Some(10.0)),  // 10 ms stale — fresh
      (200L, Some(10.0)),  // 110 ms stale — still inside the bound
      (1000L, None)))      // 910 ms stale — match exists but is too old
  }

  test("range join pairs each point with every containing interval") {
    val points = Seq((0L, "a"), (95L, "b"), (100L, "c"), (150L, "d"), (250L, "e"))
      .toDF("p", "name")
    val ranges = Seq((0L, 100L, "r1"), (90L, 200L, "r2"), (100L, 101L, "r3"),
        (500L, 400L, "broken")) // e < s: zero buckets, matches nothing
      .toDF("s", "e", "rname")
    val out = JoinOps.rangeJoin(points, ranges, "p", "s", "e", bucketWidth = 64L)
      .select($"name", $"rname").as[(String, String)].collect().toSet
    assert(out == Set(
      ("a", "r1"),                // start-inclusive
      ("b", "r1"), ("b", "r2"),   // overlap region -> two matches
      ("c", "r2"), ("c", "r3"),   // end-exclusive: 100 not in [0,100)
      ("d", "r2")))               // e=250 beyond every interval
  }

  test("range join plans as equi-join on buckets, not a nested loop") {
    val dir = "/root/testdata/sf0.001"
    val df = graft.queries.TemporalQueries.q64RangeJoin(spark, dir)
    df.collect() // finalize the adaptive plan — an un-executed
    // AdaptiveSparkPlanExec hides its subtree from plan traversal
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join fell back to a nested loop:\n$plan")
  }

  test("asof join output has exactly one row per left row") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.tables.Tables.events(spark, dir)
    val nPurchases = ev.filter($"event_type" === "purchase").count()
    assert(graft.queries.TemporalQueries.q63AsofJoin(spark, dir).count() == nPurchases)
  }
}
