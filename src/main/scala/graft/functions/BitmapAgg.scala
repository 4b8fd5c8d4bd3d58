package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact re-aggregatable distinct counting via fixed-universe bitsets.
  *
  * [[BitmapBuild]] folds ids in `[0, nWords·64)` into an `Array[Long]`
  * bitset; [[BitmapOr]] unions already-built bitmaps. Together they give
  * the exact counterpart of the HLL rollup (q82): materialize per-day
  * bitmaps once, then answer any coarser-window distinct by OR-ing
  * daily bitmaps — zero raw re-scans, and exact instead of ±2%.
  *
  * Scale shape: bitmap size tracks the id universe (2²⁰ users = 128 KiB
  * per group), not the row count; partial/merge is word-wise OR, so the
  * shuffle carries one bitmap per (task, group). For sparse universes a
  * roaring-style container layout drops the constant; the dense layout
  * here is the right one for the packed integer ids the testdata uses —
  * and the merge tree, the API, and the rollup algebra are identical.
  */
class BitmapBuild(nWords: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  def zero: Array[Long] = new Array[Long](nWords)
  def reduce(b: Array[Long], id: Long): Array[Long] = {
    b((id >> 6).toInt) |= 1L << (id & 63)
    b
  }
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
  def finish(b: Array[Long]): Array[Long] = b
  def bufferEncoder: Encoder[Array[Long]] = BitmapAgg.wordsEncoder
  def outputEncoder: Encoder[Array[Long]] = BitmapAgg.wordsEncoder
}

/** Union of pre-built bitmaps (the rollup step). The zero-length zero
  * adapts to the first real bitmap seen, so callers don't thread the
  * universe size through the second level. */
class BitmapOr extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  def zero: Array[Long] = Array.emptyLongArray
  private def or(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else if (a.length >= b.length) {
      var i = 0
      while (i < b.length) { a(i) |= b(i); i += 1 }
      a
    } else or(b.clone(), a) // differing universes: widest array wins, no drop
  def reduce(b: Array[Long], in: Array[Long]): Array[Long] = or(b, in.clone())
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = or(a, b)
  def finish(b: Array[Long]): Array[Long] = b
  def bufferEncoder: Encoder[Array[Long]] = BitmapAgg.wordsEncoder
  def outputEncoder: Encoder[Array[Long]] = BitmapAgg.wordsEncoder
}

object BitmapAgg {
  val wordsEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
