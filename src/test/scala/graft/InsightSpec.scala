package graft

import org.apache.spark.sql.functions._

import graft.queries.InsightQueries

/** Semantic invariants for the insight pack (q104–q110) beyond the oracle's
  * value equality: EWMA recurrence replayed in Scala, change-feed op
  * classification recomputed from modular arithmetic, quantile ordering.
  */
class InsightSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q108 EWMA matches a driver-side replay of the recurrence") {
    val got = InsightQueries.q108Ewma(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_events"), r.getAs[Double]("ewma"))).toMap
    val raw = graft.tables.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    raw.groupBy(_._1).foreach { case (uid, rows) =>
      val ordered = rows.sortBy(t => (t._2, t._3)).map(_._4)
      val expect = ordered.tail.foldLeft(ordered.head)((acc, v) => acc * 0.5 + v * 0.5)
      val (n, ewma) = got(uid)
      assert(n == ordered.length)
      assert(ewma == expect, s"user $uid: $ewma != $expect")
    }
  }

  test("q110 change-feed ops match the modular construction rules") {
    val byOp = InsightQueries.q110ChangeFeed(spark, dir).collect()
      .groupBy(_.getAs[String]("op"))
    val keys = graft.tables.Tables.orders(spark, dir)
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val inserts = keys.count(k => k % 3 == 0 && k % 5 != 0)
    val deletes = keys.count(k => k % 3 != 0 && k % 5 == 0)
    val updates = keys.count(k => k % 3 != 0 && k % 5 != 0 && k % 7 == 0)
    assert(byOp("insert").length == inserts)
    assert(byOp("delete").length == deletes)
    assert(byOp("update").length == updates)
    byOp("update").foreach { r =>
      assert(r.getAs[Double]("price_new") == r.getAs[Double]("price_old") * 2.0)
    }
  }

  test("q109 quantiles are ordered and the discrete median is a data value") {
    val cents = graft.tables.Tables.events(spark, dir)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    InsightQueries.q109PercentileKit(spark, dir).collect().foreach { r =>
      val (p25, p50, p75) = (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))
      assert(p25 <= p50 && p50 <= p75)
      assert(cents(r.getString(0)).contains(r.getAs[Long]("p50_disc")))
    }
  }

  test("q106 validation suite is all-green on the generated data") {
    val rows = InsightQueries.q106ValidationSuite(spark, dir).collect()
    assert(rows.length == 7)
    rows.foreach(r => assert(r.getAs[Long]("violations") == 0L, r.toString))
  }

  test("q115 bitmap rollup is partition-invariant (merge order free)") {
    val base = InsightQueries.q115BitmapRollup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exact = graft.tables.Tables.events(spark, dir)
      .groupBy(date_trunc("week", to_date(col("ts"))).cast("date").as("w"))
      .agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getLong(1))
    assert(base.map(_._2).sorted.toSeq == exact.sorted.toSeq,
      "bitmap counts must equal exact distincts")
    val shuffled = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      val alt = InsightQueries.q115BitmapRollup(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(alt.toSeq == base.toSeq)
    } finally spark.conf.set("spark.sql.shuffle.partitions", shuffled)
  }

  test("q106 catches seeded violations") {
    import spark.implicits._
    // corrupt copies: a dup key, a dangling FK, an out-of-range discount
    val orders = graft.tables.Tables.orders(spark, dir)
    val lineitem = graft.tables.Tables.lineitem(spark, dir)
    val badOrders = orders.unionByName(orders.limit(1))
    val badLine = lineitem.withColumn("l_discount",
      when(col("l_orderkey") === lineitem.select(min("l_orderkey")).head().getLong(0),
        lit(2.0)).otherwise(col("l_discount")))
    val dup = badOrders.groupBy($"o_orderkey").agg(count(lit(1)).as("c")).filter($"c" > 1).count()
    val range = badLine.filter($"l_discount" < 0.0 || $"l_discount" > 1.0).count()
    assert(dup == 1L)
    assert(range >= 1L)
  }
}
