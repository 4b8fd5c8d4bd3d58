package graft

import org.apache.spark.sql.functions._

import graft.queries.ExtendedQueries

/** Error bounds for the sketch aggregates (q57) against exact answers. */
class SketchSpec extends SparkSpec {

  test("approx sketches land within tolerance of exact answers") {
    val dir = "/root/testdata/sf0.01"
    val approx = ExtendedQueries.q57ApproxSketches(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = graft.tables.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("orders"),
        countDistinct(col("l_partkey")).as("parts"),
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .collect().map(r => r.getString(0) -> r).toMap
    def rel(approxV: Double, exactV: Double): Double =
      math.abs(approxV - exactV) / exactV
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      val relOrders = rel(a.getAs[Long]("approx_orders").toDouble, e.getAs[Long]("orders").toDouble)
      assert(relOrders < 0.05, s"$flag HLL orders rel err $relOrders")
      val relParts = rel(a.getAs[Long]("approx_parts").toDouble, e.getAs[Long]("parts").toDouble)
      assert(relParts < 0.05, s"$flag HLL parts rel err $relParts")
      val relP50 = rel(a.getAs[Double]("price_p50"), e.getAs[Double]("p50"))
      assert(relP50 < 0.05, s"$flag p50 rel err $relP50")
      val relP95 = rel(a.getAs[Double]("price_p95"), e.getAs[Double]("p95"))
      assert(relP95 < 0.05, s"$flag p95 rel err $relP95")
    }
  }

  test("count-min estimates respect the one-sided CM error bound") {
    val dir = "/root/testdata/sf0.01"
    val n = graft.tables.Tables.events(spark, dir).count()
    val eps = 0.0005
    val rows = ExtendedQueries.q84CountMinFreq(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val approx = r.getAs[Long]("n_approx")
      assert(approx >= exact, s"CM never underestimates ($approx < $exact)")
      assert(approx <= exact + (eps * n).toLong + 1,
        s"user ${r.getLong(0)}: $approx exceeds $exact + eps*N")
    }
  }

  test("unioned daily HLL sketches estimate weekly distincts within bound") {
    val dir = "/root/testdata/sf0.01"
    val approx = ExtendedQueries.q82SketchRollup(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exactMs = graft.tables.Tables.events(spark, dir)
      .groupBy(unix_millis(date_trunc("week", to_date(col("ts"))).cast("timestamp"))
        .as("week_ms"))
      .agg(countDistinct(col("user_id")).as("users"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exactMs.keySet, "week buckets must line up")
    exactMs.foreach { case (week, users) =>
      val est = approx(week)
      val relErr = math.abs(est - users).toDouble / users
      assert(relErr < 0.05, s"week $week HLL union rel err $relErr ($est vs $users)")
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
