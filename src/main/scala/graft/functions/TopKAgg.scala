package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k highest (score, id) pairs,
  * ordered score-desc then id-asc (the tie-break makes results replay-
  * deterministic and cross-engine-checkable).
  *
  * This is the distributed grouped-top-k shape: as an Aggregator it gets
  * Spark's partial/merge tree, so each map task ships at most k rows per
  * group into the shuffle — versus a window `row_number` formulation that
  * shuffles and sorts EVERY scored row. For ANN/top-k at 100 TB the
  * shuffle drops from O(corpus) to O(k × tasks × groups).
  *
  * Buffer is a sorted list truncated to k: inserts are O(k) — fine for
  * the k ≤ 100 regime this targets (a binary heap only wins above that).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  // java.lang.Double.compare, not > / ==: raw comparisons are not a total
  // order under NaN (both directions false), which would corrupt the
  // sorted-buffer invariant. compare treats NaN as largest — the same
  // place SQL engines sort it in a DESC ordering, so window-formulation
  // parity holds even for NaN scores (e.g. 0/0 cosines).
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    if (buf.sizeIs >= k && !better(x, buf.last)) buf
    else {
      val (front, back) = buf.span(better(_, x))
      (front ::: x :: back).take(k)
    }

  def zero: List[(Double, Long)] = Nil
  def reduce(b: List[(Double, Long)], in: (Double, Long)): List[(Double, Long)] =
    insert(b, in)
  def merge(a: List[(Double, Long)], b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)
  def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b
  def bufferEncoder: Encoder[List[(Double, Long)]] = TopKAgg.listEncoder
  def outputEncoder: Encoder[Seq[(Double, Long)]] = TopKAgg.seqEncoder
}

object TopKAgg {
  // Encoders for the collection types (Encoders.product only covers
  // case classes; lists/seqs of tuples need the implicit machinery).
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private[functions] val listEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  private[functions] val seqEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
