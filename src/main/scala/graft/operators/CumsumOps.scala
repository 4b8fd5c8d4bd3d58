package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact running sums over an ordered bucket frame WITHOUT a global
  * single-partition window.
  *
  * `Window.orderBy(bucket)` with no partitioning forces every row
  * through ONE task — fine on a frame that is bounded by construction
  * (a fixed grid, a top-k head), linear-in-corpus on one that merely
  * *shrinks* the corpus (n/width bucket rows still grow with n). The
  * curve queries (q189 dedup saturation, q204 vocabulary growth) sit in
  * the second class, so they take the same swap q224's decile map got:
  *
  *   1. per-group partial sums — group = `order DIV groupWidth`, a
  *      plain hash aggregate, fully parallel;
  *   2. prefix OFFSETS over the group frame — n/width/groupWidth rows,
  *      a second-level bound that keeps the only unpartitioned window
  *      thousands of times smaller than the input frame (and the input
  *      frame is already corpus/width);
  *   3. offsets broadcast-join back; the per-row running sum is a
  *      window PARTITIONED by group (≤ groupWidth rows per partition)
  *      plus the group's offset.
  *
  * Results are bit-identical to the single-window formulation (exact
  * integer sums reassociate freely), so oracles don't change.
  *
  * Requirements: `orderCol` is a non-negative integral column with one
  * row per value (the bucket frames here come straight out of a
  * `groupBy(bucket)`, so both hold by construction).
  */
object CumsumOps {

  /** Append, for each `(srcCol, dstCol)` in `cums`, a running sum of
    * `srcCol` over rows ordered by `orderCol` ascending, named
    * `dstCol`. Column order: input columns, then the new columns in
    * `cums` order. */
  def runningSums(df: DataFrame, orderCol: String,
      cums: Seq[(String, String)], groupWidth: Long = 1024L): DataFrame = {
    require(cums.nonEmpty, "need at least one (src, dst) column pair")
    require(groupWidth > 0, "groupWidth must be positive")
    val withG = df.withColumn("__g", expr(s"`$orderCol` DIV $groupWidth"))
    val partialCols = cums.map { case (s, _) => sum(col(s)).as(s"__ps_$s") }
    val partials = withG.groupBy(col("__g"))
      .agg(partialCols.head, partialCols.tail: _*)
    // the sole unpartitioned window: one row per GROUP, a frame
    // groupWidth× smaller than the (already bucket-compressed) input
    val offW = Window.orderBy(col("__g").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = partials.select(
      col("__g") +: cums.map { case (s, _) =>
        coalesce(sum(col(s"__ps_$s")).over(offW), lit(0L)).as(s"__off_$s")
      }: _*)
    val inW = Window.partitionBy(col("__g")).orderBy(col(orderCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = withG.join(broadcast(offsets), Seq("__g"))
    cums.foldLeft(joined) { case (acc, (s, d)) =>
      acc.withColumn(d, col(s"__off_$s") + sum(col(s)).over(inW))
    }.drop("__g" +: cums.map { case (s, _) => s"__off_$s" }: _*)
  }
}
