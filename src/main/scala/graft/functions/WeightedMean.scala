package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregator (the UDAF extension point): quantity-weighted
  * mean price, accumulated in integer centi-units so the partial/merge
  * tree is exact and order-free — the same fixed-point discipline the
  * decimal-sum oracle queries use, packaged as a reusable Aggregator.
  *
  * Input rows arrive as (price, qty) doubles with ≤2 decimals (price) and
  * integral qty; the buffer carries Σ round(price·100)·qty and Σ qty as
  * longs, so merge order across partitions can't perturb the result. The
  * final division is one IEEE op from exact integers → bit-identical on
  * any engine that spells it the same way.
  */
object WeightedMean extends Aggregator[(Double, Double), (Long, Long), Double] {
  def zero: (Long, Long) = (0L, 0L)
  def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
    val (price, qty) = in
    val q = math.round(qty)
    (b._1 + math.round(price * 100) * q, b._2 + q)
  }
  def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)
  def finish(b: (Long, Long)): Double =
    if (b._2 == 0L) Double.NaN else (b._1.toDouble / 100.0) / b._2.toDouble
  def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
