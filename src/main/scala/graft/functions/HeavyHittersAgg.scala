package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable Misra-Gries heavy-hitter summary (Misra & Gries 1982;
  * mergeability per Agarwal et al. 2012, "Mergeable Summaries"): at most
  * `k` counters, and any item whose true frequency exceeds N/(k+1) is
  * GUARANTEED to survive in the candidate set, with each surviving
  * counter undercounting by at most N/(k+1).
  *
  * This is the 100 TB shape for "most frequent tokens/n-grams": a full
  * `groupBy(token)` shuffles the ENTIRE vocabulary (trillions of distinct
  * grams in a web corpus); the MG summary ships at most k counters per
  * map task up the partial/merge tree, and the bounded candidate set is
  * then verified with EXACT counts (one broadcast-semi-join scan) — the
  * standard sketch-then-verify pattern. The candidate SET may vary with
  * merge order (counter values are order-dependent), but the guarantee
  * does not: no item above threshold is ever lost, so the verified
  * output — candidates with exact count strictly above N/(k+1) — is
  * DETERMINISTIC and hash-checkable against an exact oracle.
  *
  * reduce: classic MG — increment a held counter, open a new one below
  * capacity, else decrement ALL counters (dropping zeros). merge: sum
  * counter maps, then restore the k-bound by subtracting the (k+1)-th
  * largest count from every counter (the mergeable-summaries rule) and
  * dropping non-positives. finish: the candidate keys, sorted for
  * display stability.
  */
class HeavyHittersAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Seq[String]] {
  require(k >= 1, "need at least one counter")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // decrement-all: drops zeros, never grows past k
        b.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
    }

  def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val summed = b2.foldLeft(b1) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from everyone, drop <= 0 —
      // the error each absorbs is bounded by that count, preserving the
      // N/(k+1) undercount bound through the merge tree
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (t, c) =>
        if (c - cut > 0) Some(t -> (c - cut)) else None
      }
    }
  }

  def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

  def bufferEncoder: Encoder[Map[String, Long]] = HeavyHittersAgg.mapEncoder
  def outputEncoder: Encoder[Seq[String]] = HeavyHittersAgg.seqEncoder
}

object HeavyHittersAgg {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private[functions] val mapEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  private[functions] val seqEncoder: Encoder[Seq[String]] =
    ExpressionEncoder[Seq[String]]()
}
