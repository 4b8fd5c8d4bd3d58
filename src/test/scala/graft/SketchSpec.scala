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
}
