package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.CumsumOps

/** CumsumOps.runningSums must be bit-identical to the single-window
  * formulation it replaces (exact integer sums reassociate freely) at
  * every group-width regime: width 1 (every row its own group), a width
  * that splits the frame mid-group, and a width larger than the frame
  * (degenerates to the single window). */
class CumsumOpsSpec extends SparkSpec {
  import spark.implicits._

  test("two-pass running sums equal the global-window cumsum at any width") {
    // sparse, unsorted bucket ids with negative-free gaps; two measures
    val rows = Seq((7L, 3L, 10L), (0L, 1L, 2L), (2049L, 5L, 1L),
      (1024L, 2L, 4L), (1023L, 7L, 0L), (5000L, 11L, 6L), (3L, 1L, 1L))
    val df = rows.toDF("bucket", "a", "b")
    val w = Window.orderBy(col("bucket").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("cum_a", sum(col("a")).over(w))
      .withColumn("cum_b", sum(col("b")).over(w))
      .orderBy(col("bucket").asc).collect().toSeq
    for (width <- Seq(1L, 3L, 1024L, 100000L)) {
      val got = CumsumOps.runningSums(df, "bucket",
          Seq("a" -> "cum_a", "b" -> "cum_b"), groupWidth = width)
        .select("bucket", "a", "b", "cum_a", "cum_b")
        .orderBy(col("bucket").asc).collect().toSeq
      assert(got == expected, s"width $width diverged")
    }
  }
}
