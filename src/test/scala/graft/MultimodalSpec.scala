package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Real byte-level decodes through the pluggable codec path: hand-rolled
  * (but format-correct) BMP and WAV payloads, decoded by [[Multimodal]]'s
  * pure-JVM codecs — not the md5 stub. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** Uncompressed 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + BGR
    * rows padded to 4 bytes) — the layout any paint program writes. */
  private def bmp(width: Int, height: Int, rgb: (Int, Int, Int)): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    val (r, g, b) = rgb
    for (_ <- 0 until height) {
      for (_ <- 0 until width)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
      for (_ <- 0 until rowSize - width * 3) buf.put(0.toByte)
    }
    buf.array()
  }

  /** RIFF/WAVE 16-bit PCM. */
  private def wav(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  private def decodeOne(bytes: Array[Byte]) = {
    val row = Multimodal.decode(Seq((1L, bytes)).toDF("id", "content"), "content").head()
    (row.getStruct(2), row.getSeq[Float](3))
  }

  test("BmpCodec decodes a real 24-bit BMP: dimensions and mean color") {
    val (meta, feats) = decodeOne(bmp(4, 3, (255, 128, 0)))
    assert(meta.getString(0) == "image/bmp")
    assert(meta.getInt(1) == 4 && meta.getInt(2) == 3) // width x height
    assert(meta.getInt(3) == 3)                        // channels
    assert(math.abs(feats(0) - 1.0f) < 1e-6, "mean R")
    assert(math.abs(feats(1) - 128f / 255f) < 1e-6, "mean G")
    assert(math.abs(feats(2) - 0.0f) < 1e-6, "mean B")
    val luma = 0.299 * 1.0 + 0.587 * (128.0 / 255) + 0.114 * 0.0
    assert(math.abs(feats(3) - luma) < 1e-6, "mean luma")
  }

  test("BmpCodec handles row padding (odd width) and top-down (negative height)") {
    val base = bmp(3, 2, (10, 20, 30)) // rowSize 12 = 9 px + 3 pad bytes
    val (meta, feats) = decodeOne(base)
    assert(meta.getInt(1) == 3 && meta.getInt(2) == 2)
    assert(math.abs(feats(0) - 10f / 255f) < 1e-6)
    // flip the height sign: same pixels, same means
    val flipped = base.clone()
    val hb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(-2).array()
    System.arraycopy(hb, 0, flipped, 22, 4)
    val (meta2, feats2) = decodeOne(flipped)
    assert(meta2.getString(0) == "image/bmp" && meta2.getInt(2) == 2)
    assert(feats2 == feats)
  }

  test("WavCodec decodes real 16-bit PCM: rate, frames, RMS/peak/ZCR") {
    // alternating +/-16384 square wave: rms = meanAbs = peak = 0.5,
    // a crossing at every step -> zcr = (n-1)/n
    val n = 8
    val samples = Array.tabulate(n)(i => if (i % 2 == 0) 16384 else -16384).map(_.toShort)
    val (meta, feats) = decodeOne(wav(8000, 1, samples))
    assert(meta.getString(0) == "audio/wav")
    assert(meta.getInt(3) == 1)       // channels
    assert(meta.getInt(4) == 8000)    // sample rate
    assert(meta.getLong(5) == n.toLong)
    assert(math.abs(feats(0) - 0.5f) < 1e-6, "rms")
    assert(math.abs(feats(1) - 0.5f) < 1e-6, "meanAbs")
    assert(math.abs(feats(2) - 0.5f) < 1e-6, "peak")
    assert(math.abs(feats(3) - (n - 1).toFloat / n) < 1e-6, "zcr")
  }

  test("mixed frame: per-row codec dispatch with stub fallback for unknown bytes") {
    val rows = Seq(
      (1L, bmp(2, 2, (0, 0, 255))),
      (2L, wav(16000, 2, Array.tabulate(16)(i => (i * 1000).toShort))),
      (3L, "just some text".getBytes("UTF-8")))
    val out = Multimodal.decode(rows.toDF("id", "content"), "content")
      .select(col("id"), col("decoded.codec"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "image/bmp", 2L -> "audio/wav", 3L -> "stub"))
  }

  test("corrupt payloads fall through to the stub instead of failing the job") {
    // BMP magic but truncated header / wrong bpp; RIFF magic but non-PCM
    val corruptBmp = "BM".getBytes("US-ASCII") ++ Array.fill[Byte](60)(7)
    val nonPcm = {
      val w = wav(8000, 1, Array[Short](1, 2, 3, 4))
      val b = w.clone(); b(20) = 3 // format tag 3 = IEEE float, not PCM
      b
    }
    val out = Multimodal.decode(
      Seq((1L, corruptBmp), (2L, nonPcm)).toDF("id", "content"), "content")
      .select(col("decoded.codec")).collect().map(_.getString(0))
    assert(out.forall(_ == "stub"))
    // stereo WAV frame count: 16 samples / 2 channels = 8 frames
    val stereo = Multimodal.decode(
      Seq((1L, wav(16000, 2, Array.tabulate(16)(i => (i * 500).toShort))))
        .toDF("id", "content"), "content").head().getStruct(2)
    assert(stereo.getLong(5) == 8L)
  }

  test("decodeStub keeps the md5 byte-pair formula (back-compat + x11 oracle)") {
    val text = "hello multimodal"
    val got = Multimodal.decodeStub(
      Seq((1L, text)).toDF("id", "content"), "content").head().getSeq[Float](2)
    val h = java.security.MessageDigest.getInstance("MD5").digest(text.getBytes("UTF-8"))
    val want = Array.tabulate(4)(i =>
      (((h(2 * i) & 0xff) << 8 | (h(2 * i + 1) & 0xff)).toFloat / 65536.0f))
    assert(got == want.toSeq)
  }
}
