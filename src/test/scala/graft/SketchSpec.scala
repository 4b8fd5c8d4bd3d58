package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtendedQueries

/** Error bounds for the sketch aggregates (q57) against exact answers. */
class SketchSpec extends SparkSpec {

  // The three sketch queries embed their error bounds as *_ok columns
  // (the oracle expects every check true); the specs assert the checks
  // hold at sf0.01 and that the exact side lines up with an independent
  // computation.

  test("approx sketches land within tolerance of exact answers") {
    val dir = "/root/testdata/sf0.01"
    val rows = ExtendedQueries.q57ApproxSketches(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getString(0)
      assert(r.getAs[Int]("orders_ok") == 1, s"$flag HLL orders out of bound")
      assert(r.getAs[Int]("parts_ok") == 1, s"$flag HLL parts out of bound")
      assert(r.getAs[Int]("p50_ok") == 1, s"$flag p50 outside quantile envelope")
      assert(r.getAs[Int]("p95_ok") == 1, s"$flag p95 outside quantile envelope")
    }
    val exactN = graft.tables.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getAs[Long]("n") == exactN(r.getString(0))))
  }

  test("count-min estimates respect the one-sided CM error bound") {
    val dir = "/root/testdata/sf0.01"
    val rows = ExtendedQueries.q84CountMinFreq(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Int]("cm_ok") == 1,
        s"user ${r.getLong(0)}: CM estimate outside [exact, exact + eps*N]")
    }
  }

  test("unioned daily HLL sketches estimate weekly distincts within bound") {
    val dir = "/root/testdata/sf0.01"
    val rows = ExtendedQueries.q82SketchRollup(spark, dir).collect()
    val exactMs = graft.tables.Tables.events(spark, dir)
      .groupBy(unix_millis(date_trunc("week", to_date(col("ts"))).cast("timestamp"))
        .as("week_ms"))
      .agg(countDistinct(col("user_id")).as("users"))
      .collect().map(r => r.getLong(0)).toSet
    assert(rows.map(_.getLong(0)).toSet == exactMs, "week buckets must line up")
    rows.foreach { r =>
      assert(r.getAs[Int]("users_ok") == 1,
        s"week ${r.getLong(0)}: HLL union estimate outside 5% of exact")
    }
  }

  test("bottom-k sample is partition-invariant and bounds quantile error") {
    val s = spark
    import s.implicits._
    val sketch = udaf(new graft.functions.BottomKSketch(100))
    // 10k rows, value = permuted id so the true p50 is known exactly
    val base = (0L until 10000L).map(i => (i, (i * 7919L) % 10000L))
      .toDF("id", "v")
      .select(md5(concat($"id".cast("string"), lit("|t"))).as("h"), $"v")
    def sample(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(sketch($"h", $"v").as("s")).as[Seq[Long]].head()
    val s1 = sample(base.repartition(1))
    val s32 = sample(base.repartition(32))
    assert(s1 === s32, "bottom-k sample must not depend on partitioning")
    assert(s1.length === 100)
    assert(s1 === s1.sorted, "finish() returns values ascending")
    // rank error of the sample median vs true median (5000): O(1/sqrt(k))
    val est = s1(49)
    assert(math.abs(est - 5000L) < 1500,
      s"sample p50 $est too far from true 5000")
  }

  test("bottom-k sketches re-aggregate: merged group samples equal global") {
    val s = spark
    import s.implicits._
    val sketch = udaf(new graft.functions.BottomKSketch(50))
    val df = (0L until 2000L).map(i => (i % 4, i)).toDF("g", "v")
      .select($"g", md5(concat($"v".cast("string"), lit("|m"))).as("h"), $"v")
    // rollup path: per-group sketches → union of the two groups' rows
    // re-sketched must equal sketching the union directly (bottom-k is
    // merge-associative)
    val direct = df.filter($"g" < 2)
      .agg(sketch($"h", $"v")).as[Seq[Long]].head()
    val viaUnion = df.filter($"g" === 0).union(df.filter($"g" === 1))
      .agg(sketch($"h", $"v")).as[Seq[Long]].head()
    assert(direct === viaUnion)
  }
}
