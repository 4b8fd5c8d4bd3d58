package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode/feature-extract as
  * partition-mapped batch functions.
  *
  * The container ships no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB — everything around it (schema,
  * binary column handling, batch iteration shape, partitioning, explode
  * of per-frame rows) is the real Spark plumbing a production decode
  * would drop into (swap [[StubCodec.decode]] for an actual codec bound
  * per-executor).
  */
object MultimodalOps {

  /** Media row: payload + metadata, the at-rest layout for a 100 TB
    * multimodal table (binary column stays columnar-compressed in parquet;
    * metadata prunes without touching payload bytes). */
  final case class MediaRow(doc_id: Long, kind: String, media: Array[Byte])

  final case class MediaFeatures(
      doc_id: Long, kind: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** Documents → media table: payload = UTF-8 bytes of the text (stand-in
    * for real image/audio bytes), kind assigned round-robin from doc_id. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("media"))

  /** Decoder seam: anything that maps (kind, payload bytes) →
    * (width, height, frames, contentHash). Implementations must be
    * Serializable (instances ship to executors inside the mapPartitions
    * closure) and cheap to construct — heavyweight native handles belong
    * in a lazy per-partition field, not the constructor. Two impls ship:
    * [[StubCodec]] (deterministic md5-derived fake — the ORACLE codec:
    * cross-engine-checkable, so q46's driver gate stays meaningful) and
    * [[HeaderCodec]] (a pure-JVM real parser for JPEG/PNG headers —
    * the path a user with actual image bytes starts from; full pixel
    * decodes slot in the same way, the container just ships no codec
    * libraries to bind). */
  trait MediaCodec extends Serializable {
    def decode(kind: String, media: Array[Byte]): (Int, Int, Int, Long)
  }

  /** ======= STUB CODEC =======
    * Stands in for an image/audio decoder. Deterministic pure function of
    * the payload bytes so tests and driver checks are stable. A real
    * implementation would decode dimensions/duration and produce pixel or
    * PCM feature tensors here. */
  object StubCodec extends MediaCodec {
    /** Returns (width, height, frames, contentHash) — the hash doubles as
      * the checksum so callers don't rescan the payload. The hash is the
      * first 60 bits of md5 (not fnv) so the whole decode is expressible
      * in the DuckDB oracle — the stub's outputs are cross-engine-checked
      * like any relational query, not just spec-asserted. */
    def decode(kind: String, media: Array[Byte]): (Int, Int, Int, Long) = {
      // same 60-bit value as the DuckDB oracle's hex parse; one shared
      // kernel so the stub and the native expressions can't drift
      val h = graft.functions.HashKernels.md5Top60(media)
      val width = 64 + (h % 512).toInt
      val height = 64 + ((h >>> 16) % 512).toInt
      val frames = if (kind == "video") 1 + media.length / 100 else 1
      (width, height, frames, h)
    }
  }

  /** ======= REAL-HEADER CODEC =======
    * Pure-JVM parser for actual image container headers — PNG (IHDR
    * width/height, big-endian, after the 8-byte signature) and JPEG
    * (height/width from the first SOF0-SOF15 frame marker, skipping
    * APPn/quantization segments by their big-endian lengths). Payloads
    * that are neither (or truncated) fall back to the [[StubCodec]]
    * geometry so mixed corpora decode without a partial-batch failure;
    * the checksum stays the shared md5 kernel either way (content
    * identity is codec-independent). Frames: 1 for stills, the stub's
    * length-derived count for video (no container parser here). */
  object HeaderCodec extends MediaCodec {
    private def be16(a: Array[Byte], i: Int): Int =
      ((a(i) & 0xff) << 8) | (a(i + 1) & 0xff)
    private def be32(a: Array[Byte], i: Int): Int =
      ((a(i) & 0xff) << 24) | ((a(i + 1) & 0xff) << 16) |
        ((a(i + 2) & 0xff) << 8) | (a(i + 3) & 0xff)

    /** (width, height) when `media` opens a well-formed PNG/JPEG. */
    def imageDims(media: Array[Byte]): Option[(Int, Int)] = {
      val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
      if (media.length >= 24 && media.take(8).sameElements(png) &&
          new String(media.slice(12, 16), "US-ASCII") == "IHDR")
        Some((be32(media, 16), be32(media, 20)))
      else if (media.length >= 4 &&
          (media(0) & 0xff) == 0xff && (media(1) & 0xff) == 0xd8) {
        // walk JPEG segments: FF <marker> <len16 incl itself> ... until a
        // start-of-frame marker (C0-CF minus C4/C8/CC) carries the dims
        var i = 2
        while (i + 3 < media.length) {
          if ((media(i) & 0xff) != 0xff) return None // desynced: not a marker
          // runs of 0xFF are legal fill/padding before the marker byte
          // (ITU T.81 B.1.1.2) — skip them so the padding byte is not
          // misread as a marker with a garbage length field
          while (i + 3 < media.length && (media(i + 1) & 0xff) == 0xff) i += 1
          // the skip may exit on its bounds check (fill bytes pending or
          // a marker hard against the end) — the outer loop's i+3 bound
          // no longer holds, so any length-field read here would run past
          // the array: a padding-then-truncated payload falls back to the
          // stub instead
          if (i + 3 >= media.length) return None
          val m = media(i + 1) & 0xff
          if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
          else if (m == 0xd9 || m == 0xda) return None // EOI/SOS before any SOF
          else {
            val len = be16(media, i + 2)
            if (len < 2 || i + 2 + len > media.length) return None
            if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
              if (len < 7) return None
              return Some((be16(media, i + 7), be16(media, i + 5)))
            }
            i += 2 + len
          }
        }
        None
      } else None
    }

    def decode(kind: String, media: Array[Byte]): (Int, Int, Int, Long) = {
      val h = graft.functions.HashKernels.md5Top60(media)
      imageDims(media) match {
        case Some((w, ht)) => (w, ht, 1, h)
        case None => StubCodec.decode(kind, media)
      }
    }
  }

  /** Per-partition batch decode: one codec instance per partition (the
    * shape a JNI/native decoder needs — init once, stream the batch
    * through). No shuffle; runs scan→decode→project in one stage.
    * `codec` defaults to the oracle stub (q46's cross-engine gate);
    * deployments pass [[HeaderCodec]] or their own [[MediaCodec]]. */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
      codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("kind"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition init would go here (codec handle, model weights)
        rows.map { r =>
          val (w, h, f, checksum) = codec.decode(r.kind, r.media)
          MediaFeatures(r.doc_id, r.kind, r.media.length, w, h, f, checksum)
        }
      }
  }

  final case class Thumb(doc_id: Long, byte_len: Int, stride: Int,
      thumb_len: Int, thumb_md5: String)

  /** Resize/thumbnail plumbing: per-partition batch transform that
    * PRODUCES a new binary payload (the part frame-sampling and decode
    * don't exercise). The stub "resize" keeps every k-th payload byte with
    * k sized to a target byte budget — a real implementation swaps in a
    * pixel-domain scaler with the identical batch shape (binary in,
    * binary out, per-partition init). Emits the thumbnail's length and
    * md5 so the produced bytes themselves are cross-engine-checked, not
    * just counted. */
  def resizeThumbnails(spark: SparkSession, media: DataFrame,
      targetBytes: Int): Dataset[Thumb] = {
    import spark.implicits._
    media.select(col("doc_id"), col("kind"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5") // per-partition init
        rows.map { r =>
          val n = r.media.length
          val k = math.max(1, n / targetBytes)
          val thumb = Array.tabulate((n + k - 1) / k)(i => r.media(i * k))
          md.reset()
          val hex = md.digest(thumb).map("%02x".format(_)).mkString
          Thumb(r.doc_id, n, k, thumb.length, hex)
        }
      }
  }

  /** Frame sampling plumbing: explode one row per sampled frame for video
    * rows (stride in bytes stands in for a time stride). Pure column ops —
    * SQL-expressible, codegen'd, shuffle-free. */
  def frameSample(media: DataFrame, strideBytes: Int): DataFrame =
    media
      .withColumn("byte_len", length(col("media")).cast("long"))
      // byte_len > 0 guard: Spark's `-1 DIV n` truncates to 0 (phantom
      // frame) where a floor division would give -1 (no frames)
      .filter(col("kind") === "video" && col("byte_len") > 0)
      .select(col("doc_id"), col("byte_len"),
        explode(sequence(lit(0L), expr(s"(byte_len - 1) DIV $strideBytes"))).as("frame_idx"))
      .withColumn("offset", col("frame_idx") * strideBytes)

  /** aHash perceptual fingerprint, banded: 64 evenly-strided payload
    * bytes stand in for the decoded 8×8 luma thumbnail (a real codec
    * would decode + downscale here — identical mapPartitions shape), and
    * bit i sets iff pixel_i·64 > Σ pixels — the classic average-hash
    * threshold, kept INTEGER so both engines agree exactly. The 64 bits
    * are carried as four 16-bit band ints rather than one packed int64:
    * that's what the LSH candidate join needs anyway, and it keeps every
    * value small enough that the DuckDB oracle's bit arithmetic can't
    * overflow. Image payloads only; payloads under 64 bytes are excluded
    * (not plausible images, and the stride would alias). */
  final case class PHashBands(doc_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  def perceptualHashBands(spark: SparkSession,
      media: DataFrame): Dataset[PHashBands] = {
    import spark.implicits._
    media.filter(col("kind") === "image" && length(col("media")) >= 64)
      .select(col("doc_id"), col("kind"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val n = r.media.length
          val k = n / 64
          val px = Array.tabulate(64)(i => r.media(i * k) & 0xff)
          var s = 0L
          var i = 0
          while (i < 64) { s += px(i); i += 1 }
          val bands = new Array[Int](4)
          i = 0
          while (i < 64) {
            if (px(i).toLong * 64 > s) bands(i / 16) |= 1 << (i % 16)
            i += 1
          }
          PHashBands(r.doc_id, bands(0), bands(1), bands(2), bands(3))
        }
      }
  }

  /** Deterministic stub embedding for media payloads: a 16-bin byte-value
    * histogram per image — the mapPartitions shape a real image/audio
    * encoder (per-partition model init, batch through) drops into,
    * emitting the SAME (vec_id, embedding) frame every vector operator
    * consumes. This is the BRIDGE from multimodal payloads into the
    * ANN / cosine-dedup / outlier machinery: downstream code cannot tell
    * a histogram from a CLIP vector. Integer counts carried as floats
    * (exact to 2²⁴), so the quantized-cosine protocol stays exact.
    * Empty payloads are excluded — a zero vector has no cosine. */
  final case class MediaEmbedding(vec_id: Long, embedding: Array[Float])

  def byteHistogramEmbeddings(spark: SparkSession,
      media: DataFrame): Dataset[MediaEmbedding] = {
    import spark.implicits._
    media.filter(col("kind") === "image" && length(col("media")) > 0)
      .select(col("doc_id"), col("kind"), col("media")).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val h = new Array[Float](16)
          r.media.foreach(b => h((b & 0xff) >> 4) += 1f)
          MediaEmbedding(r.doc_id, h)
        }
      }
  }

  /** Perceptual near-dup screen: pairs sharing ≥1 of the 4 hash bands
    * (exact 16-bit band equality — the SimHash/LSH blocking shape, so
    * the join shuffles only band collisions, never all pairs) whose full
    * 64-bit Hamming distance ≤ `maxHamming`. The dedup matrix's
    * multimodal column: the same candidates→exact-verify two-phase shape
    * as q34/q37, over payload bytes instead of text. `maxBucket` caps
    * each (band, value) cell at its lowest doc_ids before the candidate
    * join — identical-image clusters (logos, boilerplate thumbnails)
    * are REAL at 100 TB and would otherwise turn one hot cell into a
    * quadratic pair set; same capped-LSH trade as q34/q41, mirrored in
    * the oracle. */
  def phashNearDups(spark: SparkSession, media: DataFrame,
      maxHamming: Int = 10, maxBucket: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ph = perceptualHashBands(spark, media).toDF()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val capW = Window.partitionBy(col("band"), col("v"))
      .orderBy(col("doc_id").asc)
    val bands = ph.select(col("doc_id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "v")))
      .withColumn("rn", row_number().over(capW))
      .filter(col("rn") <= maxBucket).drop("rn")
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.v") === col("b.v") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val left = ph.toDF("doc_a", "a0", "a1", "a2", "a3")
    val right = ph.toDF("doc_b", "c0", "c1", "c2", "c3")
    val res = cand.join(left, "doc_a").join(right, "doc_b")
      .withColumn("hamming",
        (bit_count(col("a0").bitwiseXOR(col("c0")))
          + bit_count(col("a1").bitwiseXOR(col("c1")))
          + bit_count(col("a2").bitwiseXOR(col("c2")))
          + bit_count(col("a3").bitwiseXOR(col("c3")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
    Materialize.thenRelease(res, ph)
  }
}
