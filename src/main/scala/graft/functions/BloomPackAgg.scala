package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Packs bloom bit POSITIONS (ints in [0, mBits)) into the m-bit bitset
  * executor-side. The naive alternative — `collect_set(position)` per
  * bucket and packing on the driver — ships every distinct position as a
  * boxed int Row: at 1024 buckets × 128 Ki bits a near-full sidecar is
  * ~134M set elements (multiple GB of Row overhead) for a bitset whose
  * packed form is 16 MiB. This Aggregator's partial buffers are the
  * packed m/8-byte arrays themselves, merged by OR, so both the shuffle
  * and the driver collect are bounded by groups × m/8 bytes regardless
  * of row count.
  *
  * Byte layout is little-endian bit order — byte i holds bits 8i..8i+7,
  * bit p lives at `bytes(p >>> 3) & (1 << (p & 7))` — matching
  * [[HashKernels.packedBytesToLongs]]'s word assembly so the unpacked
  * long[] answers `bits(p >>> 6) & (1L << (p & 63))` probes.
  */
class BloomPackAgg(mBits: Int) extends Aggregator[Int, Array[Byte], Array[Byte]] {
  private val nBytes = (mBits + 7) >>> 3

  override def zero: Array[Byte] = new Array[Byte](nBytes)

  override def reduce(b: Array[Byte], pos: Int): Array[Byte] = {
    b(pos >>> 3) = (b(pos >>> 3) | (1 << (pos & 7))).toByte
    b
  }

  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < nBytes) { x(i) = (x(i) | y(i)).toByte; i += 1 }
    x
  }

  override def finish(r: Array[Byte]): Array[Byte] = r

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** [[BloomPackAgg]] over raw string VALUES: the k probe positions are
  * computed INSIDE the aggregator with the same [[HashKernels]] kernel
  * the read-side probes use, so callers need no `explode(bloom_bits(..))`
  * row multiplication — one input row per value instead of k position
  * rows. That in turn lets the store compute zone-map min/max aggregates
  * and bloom bitsets for every sidecar column in ONE groupBy over the
  * staged bytes (min/max over position-exploded rows would still be
  * correct, but two bloom columns would need two explodes — impossible in
  * one pass). NULL values contribute no bits: they are not probe-able,
  * and an all-zero bitset correctly proves "no non-null values here".
  * Buffer/shuffle/collect stay bounded at groups × m/8 bytes. */
class BloomPackValueAgg(mBits: Int, kHashes: Int)
    extends Aggregator[String, Array[Byte], Array[Byte]] {
  private val nBytes = (mBits + 7) >>> 3

  override def zero: Array[Byte] = new Array[Byte](nBytes)

  override def reduce(b: Array[Byte], v: String): Array[Byte] = {
    if (v != null) {
      val h = HashKernels.fnv1a64(
        org.apache.spark.unsafe.types.UTF8String.fromString(v))
      val ps = HashKernels.bloomPositions(h, mBits, kHashes)
      var i = 0
      while (i < ps.length) {
        val pos = ps(i)
        b(pos >>> 3) = (b(pos >>> 3) | (1 << (pos & 7))).toByte
        i += 1
      }
    }
    b
  }

  override def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < nBytes) { x(i) = (x(i) | y(i)).toByte; i += 1 }
    x
  }

  override def finish(r: Array[Byte]): Array[Byte] = r

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
