package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k hash sample: keeps the k rows with the SMALLEST salted row
  * hashes, i.e. a uniform random sample of the group that is
  * - **deterministic** (the hash is a pure function of row identity),
  * - **merge-associative** (the global k smallest of a union is computable
  *   from per-partition k smallest — the classic bottom-k sketch
  *   property), hence partition-invariant and re-aggregatable across
  *   rollup levels exactly like the HLL (q82) and CMS (q84) sketches,
  * - **oracle-checkable** (a SQL engine reproduces the identical sample
  *   with a row_number over the same hash).
  *
  * The intended consumer is sample-based quantile estimation (q140):
  * finish() returns the sampled values sorted ascending, so the p-th
  * quantile estimate is element ⌈p·|sample|⌉ — within O(1/√k) rank error
  * with probability 1-δ, while the shuffle carries ≤ k rows per group per
  * map task instead of the group's full value set. Spark's own
  * approx_percentile gives tighter guarantees but is neither
  * deterministic under re-partitioning nor replicable in an external
  * engine — this sketch trades accuracy-per-byte for replayability, the
  * same trade every deterministic operator in this library makes.
  *
  * Buffer is a sorted list truncated to k (same O(k)-insert regime as
  * TopKAgg — fine for k ≤ a few hundred).
  */
class BottomKSketch(k: Int)
    extends Aggregator[(String, Long), List[(String, Long)], Seq[Long]] {

  // smaller hash wins; hashes are salted md5 of unique row ids, so ties
  // are cryptographically negligible (value tiebreak kept for totality)
  private def smaller(a: (String, Long), b: (String, Long)): Boolean = {
    val c = a._1.compareTo(b._1)
    c < 0 || (c == 0 && a._2 < b._2)
  }

  private def insert(buf: List[(String, Long)], x: (String, Long)): List[(String, Long)] =
    if (buf.sizeIs >= k && !smaller(x, buf.last)) buf
    else {
      val (front, back) = buf.span(smaller(_, x))
      (front ::: x :: back).take(k)
    }

  def zero: List[(String, Long)] = Nil
  def reduce(b: List[(String, Long)], in: (String, Long)): List[(String, Long)] =
    insert(b, in)
  def merge(a: List[(String, Long)], b: List[(String, Long)]): List[(String, Long)] =
    b.foldLeft(a)(insert)
  /** Sampled values, ascending — ⌈p·n⌉-th element estimates quantile p. */
  def finish(b: List[(String, Long)]): Seq[Long] = b.map(_._2).sorted
  def bufferEncoder: Encoder[List[(String, Long)]] = BottomKSketch.bufEncoder
  def outputEncoder: Encoder[Seq[Long]] = BottomKSketch.outEncoder
}

object BottomKSketch {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private[functions] val bufEncoder: Encoder[List[(String, Long)]] =
    ExpressionEncoder[List[(String, Long)]]()
  private[functions] val outEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
