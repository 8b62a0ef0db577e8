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

  /** Minimal PNG writer: 8-bit gray/RGB/RGBA scanlines, one CHOSEN filter
    * per row applied forward (so the decoder must reverse exactly that
    * filter), zlib via Deflater, correct chunk CRCs. `idatSplit` > 1
    * spreads the zlib stream over several IDAT chunks (legal per spec —
    * chunk boundaries are arbitrary). */
  private def png(width: Int, height: Int, bpp: Int, pixels: Array[Byte],
      filters: Array[Int], idatSplit: Int = 1): Array[Byte] = {
    require(pixels.length == width * height * bpp && filters.length == height)
    val colorType = bpp match { case 1 => 0; case 3 => 2; case 4 => 6 }
    val stride = width * bpp
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until height) {
      val f = filters(y)
      raw.write(f)
      for (x <- 0 until stride) {
        val cur = pixels(y * stride + x) & 0xff
        val left = if (x >= bpp) pixels(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) pixels((y - 1) * stride + x - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) >> 1
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw.write((cur - pred) & 0xff)
      }
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw.toByteArray); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val zbuf = new Array[Byte](4096)
    while (!defl.finished()) zout.write(zbuf, 0, defl.deflate(zbuf))
    defl.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = ByteBuffer.allocate(12 + data.length) // big-endian default
      out.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }
    val ihdr = ByteBuffer.allocate(13).putInt(width).putInt(height)
      .put(8.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val z = zout.toByteArray
    val per = math.max(1, (z.length + idatSplit - 1) / idatSplit)
    val idats = z.grouped(per).map(chunk("IDAT", _)).reduce(_ ++ _)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ idats ++ chunk("IEND", Array.emptyByteArray)
  }

  /** Expected mean R/G/B + luma computed directly from the pixel array. */
  private def meansOf(pixels: Array[Byte], bpp: Int): Array[Float] = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < pixels.length) {
      if (bpp == 1) { val g = pixels(i) & 0xff; sr += g; sg += g; sb += g }
      else { sr += pixels(i) & 0xff; sg += pixels(i + 1) & 0xff; sb += pixels(i + 2) & 0xff }
      i += bpp
    }
    val n = pixels.length / bpp
    val (mr, mg, mb) = (sr.toDouble / n / 255, sg.toDouble / n / 255, sb.toDouble / n / 255)
    Array(mr.toFloat, mg.toFloat, mb.toFloat,
      (0.299 * mr + 0.587 * mg + 0.114 * mb).toFloat)
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

  test("PngCodec decodes a real zlib-compressed PNG: all five scanline filters") {
    // 4x5 RGB, one row per filter type (None/Sub/Up/Average/Paeth) with
    // varied pixels so every filter actually transforms the bytes
    val w = 4; val h = 5; val bpp = 3
    val pixels = Array.tabulate(w * h * bpp)(i => ((i * 37 + 11) % 251).toByte)
    val bytes = png(w, h, bpp, pixels, filters = Array(0, 1, 2, 3, 4))
    val (meta, feats) = decodeOne(bytes)
    assert(meta.getString(0) == "image/png")
    assert(meta.getInt(1) == w && meta.getInt(2) == h)
    assert(meta.getInt(3) == 3)
    val want = meansOf(pixels, bpp)
    for (i <- 0 until 4)
      assert(math.abs(feats(i) - want(i)) < 1e-6, s"feature $i: ${feats(i)} vs ${want(i)}")
  }

  test("PngCodec: gray replicates channels, RGBA ignores alpha, IDAT may split") {
    val gray = Array.tabulate(6)(i => (i * 40).toByte) // 3x2 gray
    val (gm, gf) = decodeOne(png(3, 2, 1, gray, Array(0, 1)))
    assert(gm.getInt(3) == 3 && gf(0) == gf(1) && gf(1) == gf(2))
    assert(math.abs(gf(0) - meansOf(gray, 1)(0)) < 1e-6)

    val rgba = Array.tabulate(2 * 2 * 4)(i => ((i * 53 + 7) % 256).toByte)
    val (am, af) = decodeOne(png(2, 2, 4, rgba, Array(4, 3), idatSplit = 3))
    assert(am.getString(0) == "image/png" && am.getInt(3) == 4)
    val wantA = meansOf(rgba, 4)
    for (i <- 0 until 4) assert(math.abs(af(i) - wantA(i)) < 1e-6)
  }

  test("PngCodec agrees with an independent encoder (JDK ImageIO)") {
    val w = 7; val h = 5
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 41 + y * 97) % 256 << 16) |
        ((x * 13 + y * 57) % 256 << 8) | ((x * 71 + y * 29) % 256))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val (meta, feats) = decodeOne(baos.toByteArray)
    assert(meta.getString(0) == "image/png")
    assert(meta.getInt(1) == w && meta.getInt(2) == h)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val p = img.getRGB(x, y)
      sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
    }
    val n = w * h
    assert(math.abs(feats(0) - sr.toDouble / n / 255) < 1e-6)
    assert(math.abs(feats(1) - sg.toDouble / n / 255) < 1e-6)
    assert(math.abs(feats(2) - sb.toDouble / n / 255) < 1e-6)
  }

  test("PngCodec: corrupt or unsupported PNGs fall through to the stub") {
    val good = png(3, 2, 3, Array.fill(18)(100.toByte), Array(0, 0))
    // truncate the IDAT stream mid-chunk
    val truncated = good.take(good.length - 20)
    // flip the interlace flag (Adam7 unsupported)
    val interlaced = good.clone(); interlaced(28) = 1
    // 16-bit depth unsupported
    val deep = good.clone(); deep(24) = 16
    val out = Multimodal.decode(
      Seq((1L, truncated), (2L, interlaced), (3L, deep))
        .toDF("id", "content"), "content")
      .select(col("decoded.codec")).collect().map(_.getString(0))
    assert(out.forall(_ == "stub"), out.mkString(","))
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

  /** 24-bit BMP with arbitrary grayscale pixel content (row-major,
    * TOP-DOWN input; written bottom-up as positive-height BMPs store). */
  private def bmpPx(width: Int, height: Int, gray: Array[Int]): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- (height - 1) to 0 by -1) { // bottom-up row order
      for (x <- 0 until width) {
        val v = gray(y * width + x).toByte
        buf.put(v).put(v).put(v)
      }
      for (_ <- 0 until rowSize - width * 3) buf.put(0.toByte)
    }
    buf.array()
  }

  test("dHash64 is identical across formats and robust to small edits") {
    val w = 36; val h = 32
    // horizontal gradient: every cell row increases left->right, so every
    // dHash bit is 0 (cell(x) > cell(x+1) never holds)
    val grad = Array.tabulate(h * w)(i => (i % w) * 255 / (w - 1))
    val bmpBytes = bmpPx(w, h, grad)
    val pngBytes = png(w, h, 1, grad.map(_.toByte), Array.fill(h)(0))
    val hb = Multimodal.dHash64(bmpBytes).get
    val hp = Multimodal.dHash64(pngBytes).get
    assert(hb == 0L, f"gradient dHash should be 0, got $hb%016x")
    // cross-format: same pixels => same hash (BMP and PNG of one image
    // dedup against each other)
    assert(hb == hp)
    // a small local edit (one darkened cell region) flips few bits
    val edited = grad.clone()
    for (y <- 0 until 4; x <- 0 until 4) edited(y * w + (w - 4 + x)) = 0
    val he = Multimodal.dHash64(bmpPx(w, h, edited)).get
    assert(java.lang.Long.bitCount(hb ^ he) > 0 &&
      java.lang.Long.bitCount(hb ^ he) <= 6)
    // the reversed gradient is maximally different
    val hr = Multimodal.dHash64(bmpPx(w, h, grad.map(255 - _))).get
    assert(java.lang.Long.bitCount(hb ^ hr) == 64)
    // sub-grid images and non-images produce no hash
    assert(Multimodal.dHash64(bmpPx(8, 4, Array.fill(32)(7))).isEmpty)
    assert(Multimodal.dHash64("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("imageNearDupPairs: banded hamming finds the edited copy, not the inverse") {
    val w = 36; val h = 32
    val grad = Array.tabulate(h * w)(i => (i % w) * 255 / (w - 1))
    val edited = grad.clone()
    for (y <- 0 until 4; x <- 0 until 4) edited(y * w + (w - 4 + x)) = 0
    val frame = Seq(
      (1L, bmpPx(w, h, grad)),
      (2L, png(w, h, 1, grad.map(_.toByte), Array.fill(h)(0))), // exact dup, other format
      (3L, bmpPx(w, h, edited)), // near dup
      (4L, bmpPx(w, h, grad.map(255 - _))), // inverse — far
      (5L, "plain text bytes".getBytes("UTF-8")) // not an image
    ).toDF("id", "content")
    val pairs = Multimodal.imageNearDupPairs(frame, "id", "content", maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(pairs((1L, 2L)) == 0) // cross-format exact dup
    assert(pairs((1L, 3L)) > 0 && pairs((1L, 3L)) <= 6)
  }

  test("JpegCodec decodes a real JFIF payload: dimensions exact, means near-exact") {
    val w = 24; val h = 16
    // smooth horizontal gradient — kind to the DCT, so the lossy
    // round-trip stays within a couple of gray levels
    val grad = Array.tabulate(h * w)(i => 64 + (i % w) * 4)
    val jpeg = Multimodal.encodeJpegGray(w, h, grad, quality = 0.95f)
    assert(Multimodal.JpegCodec.detect(jpeg))
    assert(!Multimodal.BmpCodec.detect(jpeg) && !Multimodal.PngCodec.detect(jpeg))
    val (meta, feats) = decodeOne(jpeg)
    assert(meta.getString(0) == "image/jpeg")
    assert(meta.getInt(1) == w && meta.getInt(2) == h && meta.getInt(3) == 3)
    val want = grad.sum.toDouble / grad.length / 255.0
    // JPEG is lossy: metadata is exact, means are epsilon-banded
    for (i <- 0 until 4)
      assert(math.abs(feats(i) - want) < 3.0 / 255.0,
        s"channel $i: ${feats(i)} vs $want")
    // corrupt payload (truncated entropy stream) falls through to the stub
    val (badMeta, _) = decodeOne(jpeg.take(jpeg.length / 3))
    assert(badMeta.getString(0) == "stub")
  }

  test("dHash64 over a JPEG re-encode stays near the source BMP's hash") {
    val w = 36; val h = 32
    val grad = Array.tabulate(h * w)(i => 64 + (i % w) * 3)
    val hBmp = Multimodal.dHash64(bmpPx(w, h, grad)).get
    val hJpeg = Multimodal.dHash64(
      Multimodal.encodeJpegGray(w, h, grad, quality = 0.95f)).get
    // lossy but perceptually identical: few (often zero) gradient-sign
    // flips — cross-format near-dup territory, nowhere near the ~32-bit
    // distance of unrelated images
    assert(java.lang.Long.bitCount(hBmp ^ hJpeg) <= 6,
      f"jpeg hash drifted: ${java.lang.Long.bitCount(hBmp ^ hJpeg)} bits")
  }

  test("fft: impulse, pure-tone bin, linearity against the direct DFT") {
    // impulse -> flat spectrum (all bins 1+0i)
    val re0 = Array.tabulate(8)(i => if (i == 0) 1.0 else 0.0)
    val im0 = new Array[Double](8)
    Multimodal.fft(re0, im0)
    assert(re0.forall(v => math.abs(v - 1.0) < 1e-12) &&
      im0.forall(v => math.abs(v) < 1e-12))
    // cos at bin 3 of 16: X_3 = X_13 = 8, everything else ~0
    val n = 16
    val re = Array.tabulate(n)(i => math.cos(2 * math.Pi * 3 * i / n))
    val im = new Array[Double](n)
    Multimodal.fft(re, im)
    for (k <- 0 until n) {
      val mag = math.hypot(re(k), im(k))
      if (k == 3 || k == 13) assert(math.abs(mag - 8.0) < 1e-9, s"bin $k: $mag")
      else assert(mag < 1e-9, s"bin $k leaked: $mag")
    }
    // cross-check a random-ish signal against the O(n^2) direct DFT
    val sig = Array.tabulate(32)(i => math.sin(i * 0.7) + 0.3 * math.cos(i * 2.1))
    val fr = sig.clone(); val fi = new Array[Double](32)
    Multimodal.fft(fr, fi)
    for (k <- 0 until 32) {
      var dr = 0.0; var di = 0.0
      for (i <- 0 until 32) {
        val a = -2 * math.Pi * k * i / 32
        dr += sig(i) * math.cos(a); di += sig(i) * math.sin(a)
      }
      assert(math.abs(fr(k) - dr) < 1e-9 && math.abs(fi(k) - di) < 1e-9,
        s"bin $k: fft (${fr(k)}, ${fi(k)}) vs dft ($dr, $di)")
    }
  }

  test("wavSamples + wavSpectralPeak recover the synthesized tone exactly") {
    val bytes = Multimodal.renderWavSine(256, bin = 7, sampleRate = 16000)
    val Some((rate, ch, samples)) = Multimodal.wavSamples(bytes)
    assert(rate == 16000 && ch == 1 && samples.length == 256)
    // 7 full cycles: sample 0 is 0, and the wave crosses zero 14 times
    assert(samples(0) == 0)
    val out = Multimodal.wavSpectralPeak(
      Seq((1L, bytes), (2L, "not audio".getBytes("UTF-8")))
        .toDF("id", "content"), "id").collect()
    assert(out.length == 1) // non-WAV rows drop
    val r = out(0)
    assert(r.getLong(0) == 1L && r.getInt(1) == 16000 && r.getLong(2) == 256L)
    assert(r.getLong(3) == 7L)
    assert(r.getDouble(4) == 1.0)
  }

  test("wavVadSegments: burst masks round-trip through PCM decode + frame RMS exactly") {
    // (mask, n_active, n_segments, longest, first_start or -1)
    val cases = Seq(
      (0x0000L, 0L, 0L, 0L, -1L),              // silence throughout
      (0x0001L, 1L, 1L, 1L, 0L),               // one leading frame
      (0xFFFFL, 16L, 1L, 16L, 0L),             // wall-to-wall
      (0x5555L, 8L, 8L, 1L, 0L),               // alternating
      (0x00F0L, 4L, 1L, 4L, 4L),               // one interior block
      (0x8001L, 2L, 2L, 1L, 0L))               // both edges
    val rows = cases.zipWithIndex.map { case ((mask, _, _, _, _), i) =>
      (i.toLong, Multimodal.renderWavBursts(16, 64, mask))
    } :+ (99L, "not audio".getBytes("UTF-8")) // non-WAV drops
    val out = Multimodal.wavVadSegments(
        rows.toDF("id", "content"), "id", frameLen = 64,
        threshold = 2000.0)
      .orderBy("id").collect()
    assert(out.length == cases.length)
    for (((_, act, seg, lng, fst), r) <- cases.zip(out)) {
      assert(r.getLong(1) == 16L, s"n_frames for id ${r.getLong(0)}")
      assert(r.getLong(2) == act && r.getLong(3) == seg &&
        r.getLong(4) == lng, s"run stats for id ${r.getLong(0)}: $r")
      if (fst < 0) assert(r.isNullAt(5), s"expected NULL first_start: $r")
      else assert(r.getLong(5) == fst, s"first_start for ${r.getLong(0)}")
    }
    // an absurd threshold silences everything (the RMS is real, not a
    // mask readback)
    val quiet = Multimodal.wavVadSegments(
        Seq((1L, Multimodal.renderWavBursts(16, 64, 0xFFFFL)))
          .toDF("id", "content"), "id", frameLen = 64, threshold = 1e9)
      .collect()(0)
    assert(quiet.getLong(2) == 0L && quiet.isNullAt(5))
    // active-frame RMS sits near amplitude/sqrt(2), far above threshold
    val Some((_, _, samples)) =
      Multimodal.wavSamples(Multimodal.renderWavBursts(1, 64, 0x1L))
    val rms = math.sqrt(samples.map(s => s.toDouble * s).sum / 64)
    assert(math.abs(rms - 8191 / math.sqrt(2)) < 60.0, s"rms=$rms")
  }

  test("renderBmpHashEncoded: decode + dHash64 round-trips arbitrary bytes exactly") {
    val cases = Seq(
      Array.fill[Byte](8)(0),
      Array.fill[Byte](8)(-1), // 0xff x8
      Array[Byte](0x29, 0, 0, 0, 0, 0, 0, 0),
      Array.tabulate[Byte](8)(j => ((j * 73 + 11) % 256).toByte),
      java.security.MessageDigest.getInstance("MD5")
        .digest("the quick brown fox".getBytes("UTF-8")).take(8))
    for (bytes <- cases) {
      val img = Multimodal.renderBmpHashEncoded(bytes)
      val hash = Multimodal.dHash64(img).get
      val want = (0 until 8).map(j => (bytes(j) & 0xffL) << (8 * j)).reduce(_ | _)
      assert(hash == want,
        f"bytes ${bytes.map(b => f"${b & 0xff}%02x").mkString} -> $hash%016x != $want%016x")
    }
    // the x68 edit contract: xor on byte 0 flips exactly those dHash bits
    val base = java.security.MessageDigest.getInstance("MD5")
      .digest("some doc".getBytes("UTF-8")).take(8)
    val edited = base.clone(); edited(0) = (edited(0) ^ 0x29).toByte
    val h0 = Multimodal.dHash64(Multimodal.renderBmpHashEncoded(base)).get
    val h1 = Multimodal.dHash64(Multimodal.renderBmpHashEncoded(edited)).get
    assert(java.lang.Long.bitCount(h0 ^ h1) == 3 && (h0 ^ h1) == 0x29L)
  }

  test("renderVideoGray + frameSample: every-k frames decode to the banded closed-form means; junk dropped") {
    import org.apache.spark.sql.types._
    // 4x6, 5 frames, seed 200: vTop wraps past 256 at frame 8 -> use
    // seed 250 to cross the wrap inside the sampled range
    val vid = Multimodal.renderVideoGray(4, 6, 5, seed = 250L)
    val rows = Seq(
      org.apache.spark.sql.Row(1L, vid),
      org.apache.spark.sql.Row(2L, "not a video".getBytes("UTF-8")))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("content", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val out = Multimodal.frameSample(df, "id", everyK = 2)
      .orderBy("id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4)))
    // frames 0,2,4: vTop = (250+7f)%256 = 250, 8, 22; mean =
    // (vTop + (vTop+64)%256)/2
    def mean(f: Long) = {
      val vt = (250L + 7 * f) % 256; (vt + (vt + 64) % 256) / 2.0
    }
    assert(out.toSeq == Seq(
      (1L, 0L, 4, 6, mean(0)), (1L, 2L, 4, 6, mean(2)),
      (1L, 4L, 4, 6, mean(4))))
    // wrap actually exercised: frame 0's bottom band wrapped past 256
    assert(mean(0) == (250.0 + 58.0) / 2)
  }

  test("renderAviMjpeg + aviMjpegFrameHashes: a hand-built 2-frame AVI round-trips hash-exact; everyK samples; junk dropped") {
    import org.apache.spark.sql.types._
    def md8(s: String): Array[Byte] = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8")).take(8)
    def expected(h: Array[Byte]): Long =
      (0 until 8).map(j => (h(j) & 0xffL) << (8 * j)).reduce(_ | _)
    val h0 = md8("frame_zero"); val h1 = md8("frame_one")
    val avi = Multimodal.renderAviMjpeg(
      Seq(Multimodal.renderJpegHashEncoded(h0),
        Multimodal.renderJpegHashEncoded(h1)), 72, 64)
    // the wrapper is a real RIFF AVI: fourccs where a player expects them
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(avi, 8, 4, "US-ASCII") == "AVI ")
    val rows = Seq(
      org.apache.spark.sql.Row(1L, avi),
      org.apache.spark.sql.Row(2L, "not an avi".getBytes("UTF-8")),
      // truncated mid-movi: walker must drop, not throw
      org.apache.spark.sql.Row(3L, avi.take(avi.length - 40)))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("content", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val all = Multimodal.aviMjpegFrameHashes(df, "id")
      .orderBy("id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the JPEG round-trip must not flip one gradient sign: the decoded
    // dHash equals the encoded md5 bytes exactly (id 3 keeps frame 0 —
    // its chunk is intact; the truncated second chunk is dropped)
    assert(all.toSeq == Seq((1L, 0L, expected(h0)),
      (1L, 1L, expected(h1)), (3L, 0L, expected(h0))))
    val sampled = Multimodal.aviMjpegFrameHashes(df, "id", everyK = 2)
      .filter(col("id") === 1L).collect().map(_.getLong(1)).toSeq
    assert(sampled == Seq(0L))
  }

  test("aviMjpegFrameHashes: a declared chunk size near 2^31 is truncation, not an executor throw") {
    import org.apache.spark.sql.types._
    def md8(s: String): Array[Byte] = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8")).take(8)
    def expected(h: Array[Byte]): Long =
      (0 until 8).map(j => (h(j) & 0xffL) << (8 * j)).reduce(_ | _)
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def cc(s: String): Array[Byte] = s.getBytes("US-ASCII")
    val h0 = md8("frame_zero")
    val jpeg0 = Multimodal.renderJpegHashEncoded(h0)
    val pad = if ((jpeg0.length & 1) == 1) Array(0.toByte)
      else Array.empty[Byte]
    // one good frame, then a frame chunk declaring ~Int.MaxValue bytes:
    // `o + 8 + size` overflows negative in Int and used to pass the
    // bounds check straight into a negative copyOfRange
    val movi = cc("movi") ++
      cc("00dc") ++ le32(jpeg0.length) ++ jpeg0 ++ pad ++
      cc("00dc") ++ le32(0x7ffffff0) ++ Array.fill(8)(1.toByte)
    val list = cc("LIST") ++ le32(movi.length) ++ movi
    val riff = cc("RIFF") ++ le32(4 + list.length) ++ cc("AVI ") ++ list
    // and a file whose TOP-LEVEL chunk declares the huge size (the other
    // overflowing cursor)
    val evilTop = cc("RIFF") ++ le32(0x7ffffff0) ++ cc("AVI ") ++
      cc("JUNK") ++ le32(0x7ffffff0) ++ Array.fill(16)(0.toByte)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("content", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, riff),
        org.apache.spark.sql.Row(2L, evilTop))), schema)
    val out = Multimodal.aviMjpegFrameHashes(df, "id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // the intact frame is salvaged; the overflowing chunks are dropped
    assert(out.toSeq == Seq((1L, 0L, expected(h0))))
  }
}
