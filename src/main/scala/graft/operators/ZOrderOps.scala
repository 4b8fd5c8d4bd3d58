package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two dimension
  * columns so that sorting by the single z-value co-locates rows that are
  * close in EITHER dimension. Written with small parquet row groups, the
  * layout gives row-group min/max stats that stay tight on both columns —
  * so pushed-down filters on either dimension skip row groups, where a
  * single-column sort only prunes its own column.
  *
  * This is the multi-dimensional clustering story for a 100 TB table with
  * two hot filter columns (e.g. user and day): one physical order serves
  * both predicates. The z-value is pure bit arithmetic — codegen-friendly
  * and identically computable by any engine (q111's oracle recomputes it
  * in SQL).
  */
object ZOrderOps {

  /** Morton z-value of two non-negative integer columns, `bits` bits each
    * (bits ≤ 31; the result fits in 2·bits ≤ 62 bits of a long). */
  def zvalue(a: Column, b: Column, bits: Int = 16): Column = {
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** The DuckDB/ANSI spelling of [[zvalue]] over column names — kept here
    * so the Spark expression and the oracle SQL are generated from one
    * definition and cannot drift. */
  def zvalueSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** Write `df` z-clustered on (a, b): range-partition on the z-value into
    * `numFiles` files, sort within each, and cap parquet row groups at
    * `rowGroupBytes` so min/max pruning operates at sub-file granularity.
    * At 100 TB the same call shape applies with production row-group sizes
    * (64–256 MB) — granularity scales with the row-group budget, not the
    * table. */
  def writeZOrdered(df: DataFrame, a: String, b: String, path: String,
      numFiles: Int = 8, bits: Int = 16, rowGroupBytes: Long = 64L * 1024): Unit =
    df.withColumn("_z", zvalue(col(a), col(b), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .parquet(path)
}
