package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaMeta, MediaRecord, Multimodal}

/**
 * Real-decoder tests: WAV PCM and PPM/PGM payloads built byte-by-byte
 * in-test (no codec library on either side), decoded through the same
 * [[Multimodal.decode]] dispatch the Spark pipeline uses, including the
 * end-to-end Dataset path and the corrupt-blob fallbacks.
 */
class MultimodalDecodeSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val meta = MediaMeta("audio", 16000, 1)

  /** Canonical RIFF/WAVE with a 16-byte fmt chunk and a data chunk. */
  private def wav(bits: Int, channels: Int, frames: Array[Array[Int]],
      audioFormat: Int = 1): Array[Byte] = {
    val bytesPer = bits / 8
    val dataLen = frames.length * channels * bytesPer
    val buf = ByteBuffer.allocate(44 + dataLen + (dataLen & 1))
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(audioFormat.toShort).putShort(channels.toShort)
      .putInt(16000).putInt(16000 * channels * bytesPer)
      .putShort((channels * bytesPer).toShort).putShort(bits.toShort)
    buf.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    frames.foreach(frame => frame.foreach { v =>
      if (bits == 16) buf.putShort(v.toShort) else buf.put(v.toByte)
    })
    buf.array()
  }

  test("WAV PCM16 stereo: first channel decoded, normalized to [-1, 1]") {
    val payload = wav(16, 2, Array(Array(16384, -1), Array(-32768, -2), Array(0, -3)))
    assert(Multimodal.isWav(payload))
    val got = Multimodal.decode(payload, meta)
    assert(got.toSeq == Seq(0.5, -1.0, 0.0))
  }

  test("WAV PCM8 mono: unsigned bytes centered at 128") {
    val payload = wav(8, 1, Array(Array(0), Array(128), Array(255)))
    val got = Multimodal.decode(payload, meta)
    assert(got.toSeq == Seq(-1.0, 0.0, 127.0 / 128.0))
  }

  test("WAV non-PCM or truncated yields an empty signal, never throws") {
    // audioFormat 3 (IEEE float) is a compressed/unsupported branch
    assert(Multimodal.decode(wav(16, 1, Array(Array(1)), audioFormat = 3), meta).isEmpty)
    // a data chunk that claims more bytes than exist decodes what is there
    val truncated = wav(16, 1, Array(Array(1000), Array(2000))).dropRight(2)
    assert(Multimodal.decode(truncated, meta).toSeq == Seq(1000 / 32768.0))
    // header only, no data chunk
    assert(Multimodal.decode(wav(16, 1, Array.empty), meta).isEmpty)
  }

  test("PPM P6: BT.601 luma per pixel in [0, 1], comments skipped") {
    val header = "P6\n# a comment\n2 1\n255\n".getBytes(StandardCharsets.US_ASCII)
    val raster = Array[Byte](255.toByte, 0, 0, 0, 255.toByte, 0) // red, green
    val payload = header ++ raster
    assert(Multimodal.isPnm(payload))
    val got = Multimodal.decode(payload, meta)
    assert(got.length == 2)
    assert(math.abs(got(0) - 0.299) < 1e-12 && math.abs(got(1) - 0.587) < 1e-12)
  }

  test("PGM P5: raw gray scaled by maxval; short raster falls to empty") {
    val payload = "P5 3 1 100\n".getBytes(StandardCharsets.US_ASCII) ++
      Array[Byte](0, 50, 100)
    assert(Multimodal.decode(payload, meta).toSeq == Seq(0.0, 0.5, 1.0))
    val short = "P5 4 4 255\n".getBytes(StandardCharsets.US_ASCII) ++ Array[Byte](1, 2)
    assert(Multimodal.decode(short, meta).isEmpty)
  }

  test("unrecognized payloads keep the unsigned-byte fallback") {
    assert(Multimodal.decode(Array[Byte](0, 10, 20), meta).toSeq == Seq(0.0, 10.0, 20.0))
  }

  test("decode never throws on arbitrary bytes, including magic-prefixed garbage") {
    // the 100 TB contract: one corrupt blob must not kill a scan task
    val rng = new scala.util.Random(0xD5C0DE)
    val magics = Seq(Array.empty[Byte], "RIFF".getBytes, "RIFFxxxxWAVE".getBytes,
      "P5 ".getBytes, "P6\n".getBytes, "P5 99999999 99999999 255\n".getBytes)
    for (i <- 0 until 500) {
      val garbage = Array.fill(rng.nextInt(200))(rng.nextInt(256).toByte)
      val payload = magics(i % magics.length) ++ garbage
      val out = Multimodal.decode(payload, meta) // must not throw
      assert(out != null)
    }
  }

  test("end-to-end: WAV records flow through the partition-batched extractor") {
    import spark.implicits._
    val media = Seq(
      MediaRecord(1L, wav(16, 1, Array(Array(16384), Array(-16384))), meta),
      MediaRecord(2L, Array[Byte](10, 20, 30), MediaMeta("opaque", 0, 0))
    ).toDS()
    val feats = Multimodal.extractFeatures(media).collect().map(f => f.doc_id -> f).toMap
    // doc 1: signal [0.5, -0.5] -> mean 0, std 0.5, min -0.5, max 0.5, energy 0.25
    assert(feats(1L).features.toSeq == Seq(0.0, 0.5, -0.5, 0.5, 0.25))
    assert(feats(1L).kind == "audio")
    // doc 2: fallback byte signal
    assert(feats(2L).features(0) == 20.0 && feats(2L).kind == "opaque")
  }
}
