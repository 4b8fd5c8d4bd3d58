package graft

import org.apache.spark.sql.functions._

import graft.operators.MultimodalOps
import graft.operators.MultimodalOps.{HeaderCodec, StubCodec}

/** The MediaCodec seam: the stub stays the oracle codec (q46's driver
  * gate), and the real-header path must parse actual PNG/JPEG container
  * bytes — fixtures are hand-assembled minimal headers, so the expected
  * dimensions are known by construction, no codec library involved. */
class MediaCodecSpec extends SparkSpec {

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(w) ++ be32(h) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be32(0) // bit depth etc + fake CRC
  }

  private def jpegBytes(w: Int, h: Int, app0Pad: Int): Array[Byte] = {
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++
      be16(2 + app0Pad) ++ Array.fill[Byte](app0Pad)(0x20)
    // len 11 = len(2) + precision(1) + h(2) + w(2) + nComp(1) + comp(3)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++
      Array[Byte](8) ++ be16(h) ++ be16(w) ++ Array[Byte](1, 1, 0x11, 0)
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof0 ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
  }

  test("HeaderCodec parses PNG IHDR and JPEG SOF dimensions exactly") {
    assert(HeaderCodec.imageDims(pngBytes(640, 480)).contains((640, 480)))
    assert(HeaderCodec.imageDims(pngBytes(1, 70000)).contains((1, 70000)))
    // SOF behind a skipped APP0 segment — the marker walk, not an offset
    assert(HeaderCodec.imageDims(jpegBytes(1024, 768, app0Pad = 14))
      .contains((1024, 768)))
    assert(HeaderCodec.imageDims(jpegBytes(3, 5, app0Pad = 60))
      .contains((3, 5)))
  }

  test("HeaderCodec skips 0xFF fill bytes before JPEG markers (T.81 B.1.1.2)") {
    // legal padding: runs of 0xFF may precede any marker byte; the walk
    // must not treat the padding byte as a marker with a garbage length
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    val fill = Array.fill[Byte](5)(0xff.toByte)
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(6) ++
      Array.fill[Byte](4)(0x20)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(11) ++
      Array[Byte](8) ++ be16(240) ++ be16(320) ++ Array[Byte](1, 1, 0x11, 0)
    val padded = Array[Byte](0xff.toByte, 0xd8.toByte) ++ fill ++ app0 ++
      fill ++ sof0 ++ Array[Byte](0xff.toByte, 0xd9.toByte)
    assert(HeaderCodec.imageDims(padded).contains((320, 240)))
    // padding-then-truncated payload: the skip loop exits on its bounds
    // check — must fall back (None), never read a length past the array
    val truncated = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array.fill[Byte](4)(0xff.toByte)
    assert(HeaderCodec.imageDims(truncated).isEmpty)
    // marker hard against the end with no room for its length field
    val clipped = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte,
      0xff.toByte, 0xe0.toByte, 0x00.toByte)
    assert(HeaderCodec.imageDims(clipped).isEmpty)
  }

  test("HeaderCodec falls back to the stub on non-image payloads") {
    val junk = "just some text".getBytes("UTF-8")
    assert(HeaderCodec.imageDims(junk).isEmpty)
    assert(HeaderCodec.decode("image", junk) == StubCodec.decode("image", junk))
    // truncated PNG signature / JPEG with SOS before any SOF → fallback
    assert(HeaderCodec.imageDims(pngBytes(9, 9).take(20)).isEmpty)
    val noSof = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xda.toByte, 0, 4, 0, 0)
    assert(HeaderCodec.imageDims(noSof).isEmpty)
  }

  test("decodeFeatures through the seam: header codec on real headers, " +
      "checksum identical across codecs") {
    import spark.implicits._
    val rows = Seq(
      MultimodalOps.MediaRow(1L, "image", pngBytes(320, 200)),
      MultimodalOps.MediaRow(2L, "image", jpegBytes(64, 32, app0Pad = 8)),
      MultimodalOps.MediaRow(3L, "audio", "pcm-ish bytes".getBytes("UTF-8")))
    val media = spark.createDataset(rows).toDF()
    val real = MultimodalOps.decodeFeatures(spark, media, HeaderCodec)
      .collect().map(f => f.doc_id -> f).toMap
    val stub = MultimodalOps.decodeFeatures(spark, media)
      .collect().map(f => f.doc_id -> f).toMap
    assert(real(1L).width == 320 && real(1L).height == 200)
    assert(real(2L).width == 64 && real(2L).height == 32)
    // non-image falls back to the stub geometry
    assert(real(3L) == stub(3L))
    // content identity is codec-independent
    assert(rows.map(_.doc_id).forall(id =>
      real(id).checksum == stub(id).checksum))
  }

  test("q46's oracle gate is untouched: default codec is the stub") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "abc")).toDF("doc_id", "text")
    val media = MultimodalOps.asMediaTable(docs)
    val viaDefault = MultimodalOps.decodeFeatures(spark, media).collect()
    val viaStub = MultimodalOps.decodeFeatures(spark, media, StubCodec).collect()
    assert(viaDefault.sortBy(_.doc_id).sameElements(viaStub.sortBy(_.doc_id)))
  }
}
