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
        expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r).toMap
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      val relErr = math.abs(a.getAs[Long]("approx_orders") - e.getAs[Long]("orders")).toDouble /
        e.getAs[Long]("orders")
      assert(relErr < 0.05, s"$flag HLL rel err $relErr")
      val p50 = a.getAs[scala.collection.Seq[Double]]("price_p50_p95").head
      val relP = math.abs(p50 - e.getAs[Double]("p50")) / e.getAs[Double]("p50")
      assert(relP < 0.05, s"$flag p50 rel err $relP")
    }
  }
}
