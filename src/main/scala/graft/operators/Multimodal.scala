package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads plus a typed metadata struct, with decode / feature-extract
  * running per-partition in bounded batches.
  *
  * Decoding is PLUGGABLE ([[Codec]]): [[decode]] detects the payload
  * format against a codec list and runs the first match per-partition.
  * Four real codecs ship — [[BmpCodec]] (uncompressed 24-bit BMP: header
  * parse + pixel scan → mean-color features), [[PngCodec]]
  * (zlib-compressed PNG: chunk walk → Inflater → scanline unfilter →
  * mean-color features), [[JpegCodec]] (baseline JFIF via the JDK's
  * `javax.imageio` decoder — real crawls are overwhelmingly JPEG — with
  * the same from-scratch mean-color feature extraction over the decoded
  * pixel grid) and [[WavCodec]] (RIFF/WAVE 16-bit PCM: chunk walk →
  * RMS/peak/ZCR features) — so the plumbing is exercised by genuine
  * byte-level decodes, including two compressed formats. Formats with no
  * codec in the container (MP3, H.264…) fall back to [[StubCodec]], a
  * deterministic md5-derived fake, keeping the pipeline total.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("kind", StringType),      // image | audio | video | other
    StructField("byte_len", IntegerType),
    StructField("source", StringType)))

  /** Wrap a string/binary column as (content binary, meta struct). */
  def asMultimodal(df: DataFrame, contentCol: String, kind: String,
      sourceCol: String): DataFrame =
    df.withColumn("content", col(contentCol).cast(BinaryType))
      .withColumn("meta", struct(
        lit(kind).as("kind"),
        octet_length(col("content")).as("byte_len"),
        col(sourceCol).cast(StringType).as("source")))

  /** STUB resize: truncate the payload to `targetBytes` and refresh
    * meta.byte_len. A real implementation decodes, resamples, re-encodes;
    * the plumbing a codec drops into — binary in, binary out, meta kept
    * consistent, pure codegen'd expressions, no driver involvement — is
    * what this exercises. */
  def resizeStub(df: DataFrame, contentCol: String = "content",
      targetBytes: Int = 64): DataFrame = {
    val resized = expr(s"substring($contentCol, 1, $targetBytes)")
    val d1 = df.withColumn(contentCol, resized)
    if (d1.columns.contains("meta"))
      d1.withColumn("meta", struct(
        col("meta.kind").as("kind"),
        octet_length(col(contentCol)).as("byte_len"),
        col("meta.source").as("source")))
    else d1
  }

  /** STUB frame sampling: split the payload into `frames` contiguous byte
    * slices and emit one row per (frame_idx, frame) — the row-fan-out shape
    * of real video frame extraction (a codec would decode and pick I-frames
    * instead of slicing bytes). posexplode keeps lineage to the source row;
    * partitioning is inherited, no shuffle. */
  def frameSampleStub(df: DataFrame, contentCol: String = "content",
      frames: Int = 4): DataFrame = {
    val fl = s"greatest(octet_length($contentCol) div $frames, 1)"
    val slices = expr(
      s"transform(sequence(0, $frames - 1), i -> substring($contentCol, i * ($fl) + 1, $fl))")
    df.select(df.columns.map(col) :+
      posexplode(slices).as(Seq("frame_idx", "frame")): _*)
  }

  // ---------------------------------------------------------------- codecs

  /** One decoded payload: media metadata + a compact feature vector.
    * Fields not applicable to the media kind are -1. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_samples", LongType)))

  /** A byte-level media decoder. Implementations must be pure functions of
    * the payload (decoding runs on executors; results must be identical
    * across retries) and return None on corrupt/unsupported payloads so
    * [[decode]] can fall through to the stub. */
  trait Codec extends Serializable {
    def name: String
    /** Cheap magic-bytes probe — may not allocate or scan the payload. */
    def detect(bytes: Array[Byte]): Boolean
    /** Full decode: (decodedSchema row, `dims` features), or None. */
    def decode(bytes: Array[Byte], dims: Int): Option[(Row, Array[Float])]
  }

  /** Pad/truncate a feature vector to `dims`. */
  private def fit(f: Array[Float], dims: Int): Array[Float] =
    if (f.length == dims) f
    else if (f.length > dims) f.take(dims)
    else f ++ Array.fill(dims - f.length)(0.0f)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB): a full header
    * parse + pixel scan — features are mean R/G/B and mean luma in [0,1].
    * Bottom-up vs top-down row order doesn't matter for means, so
    * negative heights are handled by |height|. */
  object BmpCodec extends Codec {
    val name = "image/bmp"
    def detect(b: Array[Byte]): Boolean =
      b.length >= 54 && b(0) == 'B'.toByte && b(1) == 'M'.toByte
    def decode(b: Array[Byte], dims: Int): Option[(Row, Array[Float])] = {
      if (!detect(b)) return None
      val dataOff = i32(b, 10)
      val hdrSize = i32(b, 14)
      val width = i32(b, 18)
      val heightRaw = i32(b, 22)
      val bpp = u16(b, 28)
      val compression = i32(b, 30)
      if (hdrSize < 40 || bpp != 24 || compression != 0 ||
        width <= 0 || heightRaw == 0 || dataOff < 54) return None
      val height = math.abs(heightRaw)
      val rowSize = ((width * 3 + 3) / 4) * 4 // rows padded to 4 bytes
      if (dataOff.toLong + rowSize.toLong * height > b.length) return None
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < height) {
        val ro = dataOff + y * rowSize
        var x = 0
        while (x < width) {
          val po = ro + x * 3 // pixel order is BGR
          sb += b(po) & 0xff; sg += b(po + 1) & 0xff; sr += b(po + 2) & 0xff
          x += 1
        }
        y += 1
      }
      val n = width.toLong * height
      val mr = sr.toDouble / n / 255.0
      val mg = sg.toDouble / n / 255.0
      val mb = sb.toDouble / n / 255.0
      val luma = 0.299 * mr + 0.587 * mg + 0.114 * mb
      Some((Row(name, width, height, 3, -1, -1L),
        fit(Array(mr.toFloat, mg.toFloat, mb.toFloat, luma.toFloat), dims)))
    }
  }

  /** PNG (ISO/IEC 15948), 8-bit depth, color types 0 (gray), 2 (RGB) and
    * 6 (RGBA), non-interlaced: chunk walk concatenates the IDAT zlib
    * stream, `java.util.zip.Inflater` (in the JDK — no new deps)
    * decompresses it, and the five scanline filters (None/Sub/Up/
    * Average/Paeth) are reversed in one pass — a REAL compressed-format
    * decode, unlike BMP's plain pixel scan. Features are mean R/G/B and
    * mean luma in [0,1] (gray replicates into all three channels; alpha
    * is ignored for the means). Chunk CRCs are not verified — a corrupt
    * stream fails structurally (inflate error / short data) and falls
    * through to the stub like every codec miss. */
  object PngCodec extends Codec {
    val name = "image/png"
    private val Sig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    def detect(b: Array[Byte]): Boolean =
      b.length >= 33 && java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(b, 0, 8), Sig)

    private def i32be(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

    private def paeth(a: Int, bb: Int, c: Int): Int = {
      val p = a + bb - c
      val pa = math.abs(p - a); val pb = math.abs(p - bb); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c
    }

    /** Full pixel decode shared by [[decode]] (channel means) and
      * [[Multimodal.grayGrid]] (perceptual hashing): (width, height,
      * bytes-per-pixel, unfiltered row-major pixel bytes). */
    private[operators] def pixels(b: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
      if (!detect(b)) return None
      // IHDR is mandated to be the first chunk, at offset 8, length 13
      if (i32be(b, 8) != 13 ||
        new String(b, 12, 4, "US-ASCII") != "IHDR") return None
      val width = i32be(b, 16)
      val height = i32be(b, 20)
      val depth = b(24) & 0xff
      val colorType = b(25) & 0xff
      val interlace = b(28) & 0xff
      if (width <= 0 || height <= 0 || depth != 8 || interlace != 0) return None
      val bpp = colorType match {
        case 0 => 1 case 2 => 3 case 6 => 4 case _ => return None
      }
      val stride = width.toLong * bpp
      // (stride+1)*height raw bytes must fit an array — cap at ~256 MB
      if ((stride + 1) * height > (1L << 28)) return None

      // concatenate the IDAT stream (chunks need not align to anything)
      var off = 8
      val idat = new java.io.ByteArrayOutputStream()
      var end = false
      while (!end && off + 12 <= b.length) {
        val len = i32be(b, off)
        if (len < 0 || off + 12 + len > b.length) return None
        val typ = new String(b, off + 4, 4, "US-ASCII")
        if (typ == "IDAT") idat.write(b, off + 8, len)
        if (typ == "IEND") end = true
        off += 12 + len
      }
      if (idat.size() == 0) return None

      val rowBytes = stride.toInt
      val raw = new Array[Byte]((rowBytes + 1) * height)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      try {
        var got = 0
        while (got < raw.length && !inf.finished()) {
          val k = inf.inflate(raw, got, raw.length - got)
          if (k == 0 && (inf.needsInput() || inf.needsDictionary())) return None
          got += k
        }
        if (got < raw.length) return None
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally inf.end()

      // reverse the per-scanline filter in place (output = `img`)
      val img = new Array[Byte](rowBytes * height)
      var y = 0
      while (y < height) {
        val filter = raw((rowBytes + 1) * y) & 0xff
        val ro = (rowBytes + 1) * y + 1
        val oo = rowBytes * y
        var x = 0
        while (x < rowBytes) {
          val cur = raw(ro + x) & 0xff
          val left = if (x >= bpp) img(oo + x - bpp) & 0xff else 0
          val up = if (y > 0) img(oo - rowBytes + x) & 0xff else 0
          val ul = if (x >= bpp && y > 0) img(oo - rowBytes + x - bpp) & 0xff else 0
          val v = filter match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + ((left + up) >> 1)
            case 4 => cur + paeth(left, up, ul)
            case _ => return None
          }
          img(oo + x) = (v & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some((width, height, bpp, img))
    }

    def decode(b: Array[Byte], dims: Int): Option[(Row, Array[Float])] =
      pixels(b).map { case (width, height, bpp, img) =>
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < img.length) {
          if (bpp == 1) { val g = img(i) & 0xff; sr += g; sg += g; sb += g }
          else { sr += img(i) & 0xff; sg += img(i + 1) & 0xff; sb += img(i + 2) & 0xff }
          i += bpp
        }
        val n = width.toLong * height
        val mr = sr.toDouble / n / 255.0
        val mg = sg.toDouble / n / 255.0
        val mb = sb.toDouble / n / 255.0
        val luma = 0.299 * mr + 0.587 * mg + 0.114 * mb
        // channels: RGBA reports 4; RGB and gray-replicated report 3
        (Row(name, width, height, if (bpp == 4) 4 else 3, -1, -1L),
          fit(Array(mr.toFloat, mg.toFloat, mb.toFloat, luma.toFloat), dims))
      }
  }

  /** Baseline JPEG (JFIF/EXIF, SOF0/SOF2): the entropy decode + IDCT runs
    * through the JDK's `javax.imageio` reader (java.desktop module — in
    * the JVM already, no new deps; a from-scratch Huffman+IDCT would be a
    * codec project, not an analytics engine). Feature extraction over the
    * decoded pixel grid is the same from-scratch mean-R/G/B + mean-luma
    * pass as [[BmpCodec]]/[[PngCodec]]. Deterministic per JVM (libjpeg's
    * integer IDCT), which is the executor-retry contract; JPEG being
    * LOSSY means features of a re-encoded image differ slightly from the
    * source's — exact-oracle queries stay on BMP/PNG, JPEG is gated by
    * metadata exactness (dimensions survive any quality) plus
    * epsilon-banded feature checks (MultimodalSpec). */
  object JpegCodec extends Codec {
    val name = "image/jpeg"
    def detect(b: Array[Byte]): Boolean =
      b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
        (b(2) & 0xff) == 0xff
    def decode(b: Array[Byte], dims: Int): Option[(Row, Array[Float])] = {
      if (!detect(b)) return None
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
        val w = img.getWidth; val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val p = row(x)
            sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val mr = sr.toDouble / n / 255.0
        val mg = sg.toDouble / n / 255.0
        val mb = sb.toDouble / n / 255.0
        val luma = 0.299 * mr + 0.587 * mg + 0.114 * mb
        Some((Row(name, w, h, 3, -1, -1L),
          fit(Array(mr.toFloat, mg.toFloat, mb.toFloat, luma.toFloat), dims)))
      } catch { case _: Exception => None }
    }
  }

  /** RIFF/WAVE, 16-bit PCM (format tag 1): chunk walk for fmt/data, then
    * one pass over the samples — features are RMS, mean |amplitude|, peak
    * (all normalized by 2^15) and zero-crossing rate. */
  object WavCodec extends Codec {
    val name = "audio/wav"
    def detect(b: Array[Byte]): Boolean =
      b.length >= 44 &&
        b(0) == 'R'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte &&
        b(3) == 'F'.toByte && b(8) == 'W'.toByte && b(9) == 'A'.toByte &&
        b(10) == 'V'.toByte && b(11) == 'E'.toByte
    def decode(b: Array[Byte], dims: Int): Option[(Row, Array[Float])] = {
      if (!detect(b)) return None
      var off = 12
      var channels = -1; var sampleRate = -1; var bits = -1
      var dataOff = -1; var dataLen = -1
      while (off + 8 <= b.length && (channels < 0 || dataOff < 0)) {
        val id = new String(b, off, 4, "US-ASCII")
        val size = i32(b, off + 4)
        // Long bounds: a declared size near 2^31 overflows `off+8+size`
        // negative in Int and would slip past this check
        if (size < 0 || off.toLong + 8L + size > b.length) return None
        id match {
          case "fmt " =>
            if (size < 16) return None
            val fmtTag = u16(b, off + 8)
            if (fmtTag != 1) return None // PCM only
            channels = u16(b, off + 10)
            sampleRate = i32(b, off + 12)
            bits = u16(b, off + 22)
          case "data" =>
            dataOff = off + 8; dataLen = size
          case _ => // skip unknown chunk
        }
        off += 8 + size + (size & 1) // chunks are word-aligned
      }
      if (channels <= 0 || sampleRate <= 0 || bits != 16 || dataOff < 0) return None
      val bytesPerFrame = channels * 2
      val nFrames = dataLen.toLong / bytesPerFrame
      val nSamples = nFrames * channels
      if (nSamples == 0) return None
      var sumSq = 0.0; var sumAbs = 0.0; var peak = 0L; var crossings = 0L
      var prevSign = 0; var i = 0L
      while (i < nSamples) {
        val o = dataOff + (i * 2).toInt
        val s = (u16(b, o) << 16) >> 16 // sign-extend 16-bit LE
        val a = math.abs(s.toLong)
        sumSq += s.toDouble * s.toDouble
        sumAbs += a.toDouble
        if (a > peak) peak = a
        val sign = java.lang.Integer.signum(s)
        if (sign != 0) {
          if (prevSign != 0 && sign != prevSign) crossings += 1
          prevSign = sign
        }
        i += 1
      }
      val norm = 32768.0
      val rms = math.sqrt(sumSq / nSamples) / norm
      val meanAbs = sumAbs / nSamples / norm
      val peakN = peak.toDouble / norm
      val zcr = crossings.toDouble / nSamples
      Some((Row(name, -1, -1, channels, sampleRate, nFrames),
        fit(Array(rms.toFloat, meanAbs.toFloat, peakN.toFloat, zcr.toFloat), dims)))
    }
  }

  /** Deterministic fallback for formats without a codec in this container:
    * md5 of the payload folded into byte-pair floats in [0,1). Keeps the
    * decode total (every row gets features) and is replayable in SQL
    * (the x11 gate replays it in DuckDB). */
  object StubCodec extends Codec {
    val name = "stub"
    private val md = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
    def detect(bytes: Array[Byte]): Boolean = true
    def decode(bytes: Array[Byte], dims: Int): Option[(Row, Array[Float])] = {
      val digest = md.get()
      digest.reset()
      val h = digest.digest(bytes)
      val feats = Array.tabulate(dims) { i =>
        (((h(2 * i) & 0xff) << 8 | (h(2 * i + 1) & 0xff)).toFloat / 65536.0f)
      }
      Some((Row(name, -1, -1, -1, -1, -1L), feats))
    }
  }

  val defaultCodecs: Seq[Codec] = Seq(BmpCodec, PngCodec, JpegCodec, WavCodec)

  /** Decode a binary column: first detecting codec wins; a codec that
    * detects but fails to decode (corrupt payload) falls through to the
    * stub rather than failing the job — corrupt media at 100 TB is a
    * statistical certainty and must not kill the pipeline. Runs
    * per-partition in one pass (the mapInPandas shape), adding a
    * `decoded` metadata struct and a `features` array<float> column. */
  def decode(df: DataFrame, contentCol: String = "content",
      codecs: Seq[Codec] = defaultCodecs, dims: Int = 4): DataFrame = {
    require(dims <= 8, s"the stub fallback folds a 16-byte md5 digest into " +
      s"byte pairs — at most 8 dims (got $dims)")
    val outSchema = df.schema
      .add(StructField("decoded", decodedSchema))
      .add(StructField("features", ArrayType(FloatType)))
    val contentIdx = df.schema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.get(contentIdx) match {
          case b: Array[Byte] => b
          case other => String.valueOf(other).getBytes("UTF-8")
        }
        val (meta, feats) = codecs.find(_.detect(bytes))
          .flatMap(_.decode(bytes, dims))
          .getOrElse(StubCodec.decode(bytes, dims).get)
        Row.fromSeq(r.toSeq :+ meta :+ feats)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Stub-only decode (back-compat shape: adds just `features`). */
  def decodeStub(df: DataFrame, contentCol: String = "content",
      dims: Int = 4): DataFrame =
    decode(df, contentCol, codecs = Seq.empty, dims = dims).drop("decoded")

  // ---- perceptual hashing (image near-dup at scale) ----

  /** Deterministic 24-bit grayscale BMP writer (top-down `gray` values
    * 0-255, row-major; stored bottom-up as positive-height BMPs are).
    * The synthetic-image generator for pipelines and gates: rendering a
    * document fingerprint through this gives every text-dup an IDENTICAL
    * image, so image-dedup results are predictable without shipping real
    * media in testdata. */
  def renderBmpGray(width: Int, height: Int, gray: Array[Int]): Array[Byte] = {
    require(gray.length == width * height, "gray must be width*height values")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1
    while (y >= 0) { // bottom-up row order
      var x = 0
      while (x < width) {
        val v = (gray(y * width + x) & 0xff).toByte
        buf.put(v).put(v).put(v)
        x += 1
      }
      var pad = rowSize - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Iterative radix-2 Cooley–Tukey FFT, in place, from the textbook
    * definition (bit-reversal permutation + butterfly passes with a
    * recurrence-updated twiddle). Length must be a power of two.
    * Deterministic double arithmetic — the executor-retry contract every
    * codec shares. */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && n > 0 && (n & (n - 1)) == 0,
      "fft needs equal power-of-2 length arrays")
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val hi = base + k + len / 2
          val ur = re(base + k); val ui = im(base + k)
          val vr = re(hi) * cr - im(hi) * ci
          val vi = re(hi) * ci + im(hi) * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(hi) = ur - vr; im(hi) = ui - vi
          val ncr = cr * wr - ci * wi; ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Parse a 16-bit PCM WAV payload to (sampleRate, channels, samples) —
    * the same chunk walk as [[WavCodec]], kept as a separate total parser
    * so DSP operators can reach raw samples without re-deriving the
    * container format. Multi-channel payloads return interleaved
    * samples. */
  def wavSamples(b: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (!WavCodec.detect(b)) return None
    var off = 12
    var channels = -1; var sampleRate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= b.length && (channels < 0 || dataOff < 0)) {
      val id = new String(b, off, 4, "US-ASCII")
      val size = i32(b, off + 4)
      // Long bounds — see WavCodec.decode
      if (size < 0 || off.toLong + 8L + size > b.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          if (u16(b, off + 8) != 1) return None
          channels = u16(b, off + 10)
          sampleRate = i32(b, off + 12)
          bits = u16(b, off + 22)
        case "data" =>
          dataOff = off + 8; dataLen = size
        case _ =>
      }
      off += 8 + size + (size & 1)
    }
    if (channels <= 0 || sampleRate <= 0 || bits != 16 || dataOff < 0) return None
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((u16(b, dataOff + i * 2) << 16) >> 16).toShort
      i += 1
    }
    Some((sampleRate, channels, out))
  }

  /** Synthesize a mono 16-bit PCM WAV: `n` samples of a pure sinusoid at
    * DFT bin `bin` (i.e. `bin` full cycles over the n samples),
    * amplitude in [0, 32767]. Fixture/synthesis utility — the analysis
    * side is [[wavSpectralPeak]]. */
  def renderWavSine(n: Int, bin: Int, sampleRate: Int = 16000,
      amplitude: Int = 8191): Array[Byte] = {
    val samples = Array.tabulate(n)(i =>
      math.rint(amplitude * math.sin(2.0 * math.Pi * bin * i / n)).toShort)
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
      .putShort(1).putInt(sampleRate).putInt(sampleRate * 2).putShort(2)
      .putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** Dominant-frequency report of WAV payloads through the REAL
    * [[fft]]: first `nfft` mono samples (zero-padded; channel 0 of
    * interleaved audio), power per positive-frequency bin, argmax over
    * bins 1..nfft/2 (DC excluded, ties to the LOWEST bin), plus the
    * winning bin's share of positive-frequency power rounded to 3 — a
    * spectral-purity score (a pure tone scores 1.000, broadband noise
    * ~0). The per-partition batched scan every codec op uses; non-WAV
    * payloads are dropped. Output: (idCol, sample_rate, n_samples,
    * dominant_bin, purity). */
  def wavSpectralPeak(df: DataFrame, idCol: String,
      contentCol: String = "content", nfft: Int = 256): DataFrame = {
    require(nfft >= 4 && (nfft & (nfft - 1)) == 0, "nfft must be a power of 2 >= 4")
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("n_samples", LongType, nullable = false),
      StructField("dominant_bin", LongType, nullable = false),
      StructField("purity", DoubleType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        r.get(contentIdx) match {
          case b: Array[Byte] =>
            wavSamples(b).map { case (rate, channels, samples) =>
              val re = new Array[Double](nfft)
              val im = new Array[Double](nfft)
              var i = 0
              val nMono = samples.length / channels
              while (i < nfft && i < nMono) {
                re(i) = samples(i * channels).toDouble
                i += 1
              }
              fft(re, im)
              var best = 1; var bestP = -1.0; var tot = 0.0
              var k = 1
              while (k <= nfft / 2) {
                val p = re(k) * re(k) + im(k) * im(k)
                tot += p
                if (p > bestP) { bestP = p; best = k }
                k += 1
              }
              val purity = if (tot > 0.0) bestP / tot else 0.0
              Row(r.get(idIdx), rate, nMono.toLong, best.toLong,
                math.rint(purity * 1000.0) / 1000.0)
            }
          case _ => None
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Synthesize a mono 16-bit PCM WAV of `frames` fixed-length frames
    * where frame f carries a sinusoid iff bit f of `mask` is set and
    * silence otherwise — the burst fixture [[wavVadSegments]] is
    * exercised against (the audio twin of [[renderBmpHashEncoded]]'s
    * hash-encoded BMP: an engine that cannot decode PCM can still
    * predict the segmentation from the mask bits). The sinusoid runs
    * `cyclesPerFrame` full cycles per frame, so every active frame's
    * RMS is ~amplitude/√2 with an 8x margin over any threshold near
    * amplitude/4, and phase restarts per frame (no partial-cycle edge
    * frames). */
  def renderWavBursts(frames: Int, frameLen: Int, mask: Long,
      cyclesPerFrame: Int = 4, sampleRate: Int = 16000,
      amplitude: Int = 8191): Array[Byte] = {
    require(frames >= 1 && frames <= 64, s"frames must be in [1,64]: $frames")
    val n = frames * frameLen
    val samples = Array.tabulate(n) { i =>
      val f = i / frameLen
      if (((mask >> f) & 1L) == 0L) 0.toShort
      else math.rint(amplitude * math.sin(
        2.0 * math.Pi * cyclesPerFrame * (i % frameLen) / frameLen)).toShort
    }
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16).putShort(1)
      .putShort(1).putInt(sampleRate).putInt(sampleRate * 2).putShort(2)
      .putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => buf.putShort(s))
    buf.array()
  }

  /** Energy-based voice-activity segmentation of WAV payloads — the
    * "cut speech into utterances before transcription/feature
    * extraction" front door of every audio pipeline: frame the mono
    * samples (channel 0) into fixed `frameLen`-sample frames (trailing
    * partial frame dropped), score each frame by RMS energy, mark it
    * active when RMS > `threshold`, and merge contiguous active frames
    * into segments. Output per payload: frame count, active-frame
    * count, segment count, longest segment (frames), and the first
    * active frame index (NULL when silent throughout) — all integers,
    * so the report is oracle-exact for any fixture whose active-frame
    * pattern is predictable ([[renderWavBursts]]).
    *
    * The per-partition batched mapPartitions scan every codec op uses
    * (SURVEY §2.11: no UDF registry — this is imperative per-row DSP,
    * the documented RDD exception); non-WAV payloads drop. At 100 TB
    * the shape is embarrassingly parallel: no shuffle, state is one
    * frame's samples. */
  def wavVadSegments(df: DataFrame, idCol: String,
      contentCol: String = "content", frameLen: Int = 64,
      threshold: Double = 2000.0): DataFrame = {
    require(frameLen >= 8, s"frameLen must be >= 8: $frameLen")
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("n_frames", LongType, nullable = false),
      StructField("n_active", LongType, nullable = false),
      StructField("n_segments", LongType, nullable = false),
      StructField("longest_run", LongType, nullable = false),
      StructField("first_start", LongType, nullable = true)))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        r.get(contentIdx) match {
          case b: Array[Byte] =>
            wavSamples(b).map { case (_, channels, samples) =>
              val nMono = samples.length / channels
              val nFrames = nMono / frameLen
              var f = 0
              var active = 0L; var segments = 0L
              var run = 0L; var longest = 0L
              var firstStart = -1L
              while (f < nFrames) {
                var acc = 0.0
                var i = 0
                while (i < frameLen) {
                  val s = samples((f * frameLen + i) * channels).toDouble
                  acc += s * s
                  i += 1
                }
                val isActive = math.sqrt(acc / frameLen) > threshold
                if (isActive) {
                  active += 1L
                  if (run == 0L) {
                    segments += 1L
                    if (firstStart < 0L) firstStart = f.toLong
                  }
                  run += 1L
                  if (run > longest) longest = run
                } else run = 0L
                f += 1
              }
              Row(r.get(idIdx), nFrames.toLong, active, segments, longest,
                if (firstStart < 0L) null else java.lang.Long.valueOf(firstStart))
            }
          case _ => None
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Render a 36x32 gray BMP whose [[dHash64]] is EXACTLY the given 8
    * bytes (bits 8j..8j+7 of the hash = byte j): each of the 8 cell-rows
    * (4 pixel rows each) is a left-to-right walk over the 9 cell-columns
    * (4 pixel columns each) starting at gray 128, stepping -8 when the
    * corresponding hash bit is set (so cell > next-cell ⇒ bit reads back
    * 1) and +8 when clear. Cells are uniform and 4x4 with exact 36/9 and
    * 32/8 cell boundaries, so the box-average recovers the per-cell luma
    * exactly and every comparison has an 8-gray-level margin — decode +
    * dHash round-trips the bytes bit-for-bit, which is what makes an
    * image-pipeline query ORACLE-EXACT: a SQL engine that can't decode
    * pixels can still compute the expected bytes (e.g. from md5 hex
    * pairs) and replay the banded hamming join on them. */
  def renderBmpHashEncoded(hashBytes: Array[Byte]): Array[Byte] = {
    require(hashBytes.length == 8, "need exactly 8 hash bytes")
    val w = 36; val h = 32
    val gray = new Array[Int](w * h)
    var cy = 0
    while (cy < 8) {
      var v = 128
      var cx = 0
      while (cx < 9) {
        var py = 0
        while (py < 4) {
          var px = 0
          while (px < 4) {
            gray((cy * 4 + py) * w + (cx * 4 + px)) = v
            px += 1
          }
          py += 1
        }
        if (cx < 8)
          v += (if (((hashBytes(cy) >> cx) & 1) == 1) -8 else 8)
        cx += 1
      }
      cy += 1
    }
    renderBmpGray(w, h, gray)
  }

  /** Encode a gray pixel grid as baseline JPEG via the JDK's `javax.
    * imageio` writer (fixture/synthesis utility — the decode side is
    * [[JpegCodec]]). Quality in (0, 1]. */
  def encodeJpegGray(width: Int, height: Int, gray: Array[Int],
      quality: Float = 0.92f): Array[Byte] = {
    require(gray.length == width * height, "gray must be width*height values")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = gray(y * width + x) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    out.toByteArray
  }

  /** Row-major luma grid of an image payload (BMP/PNG/JPEG): the decoded
    * pixel grid collapsed to Rec. 601 luma floats in [0, 255]. */
  private def grayGrid(b: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (BmpCodec.detect(b)) {
      // re-walk the BMP pixel scan, keeping the grid this time
      val dataOff = i32(b, 10); val hdrSize = i32(b, 14)
      val width = i32(b, 18); val heightRaw = i32(b, 22)
      val bpp = u16(b, 28); val compression = i32(b, 30)
      if (hdrSize < 40 || bpp != 24 || compression != 0 ||
        width <= 0 || heightRaw == 0 || dataOff < 54) return None
      val height = math.abs(heightRaw)
      val rowSize = ((width * 3 + 3) / 4) * 4
      if (dataOff.toLong + rowSize.toLong * height > b.length) return None
      val g = new Array[Float](width * height)
      var y = 0
      while (y < height) {
        // BMP rows are bottom-up for positive heights: flip so the grid
        // is top-down like PNG (orientation matters for dHash, unlike
        // the channel means)
        val srcY = if (heightRaw > 0) height - 1 - y else y
        val ro = dataOff + srcY * rowSize
        var x = 0
        while (x < width) {
          val po = ro + x * 3
          g(y * width + x) = (0.114f * (b(po) & 0xff) +
            0.587f * (b(po + 1) & 0xff) + 0.299f * (b(po + 2) & 0xff))
          x += 1
        }
        y += 1
      }
      Some((width, height, g))
    } else if (JpegCodec.detect(b)) {
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
        if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
        else {
          val w = img.getWidth; val h = img.getHeight
          val g = new Array[Float](w * h)
          val row = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, row, 0, w)
            var x = 0
            while (x < w) {
              val p = row(x)
              g(y * w + x) = 0.299f * ((p >>> 16) & 0xff) +
                0.587f * ((p >>> 8) & 0xff) + 0.114f * (p & 0xff)
              x += 1
            }
            y += 1
          }
          Some((w, h, g))
        }
      } catch { case _: Exception => None }
    } else PngCodec.pixels(b).map { case (width, height, bpp, img) =>
      val g = new Array[Float](width * height)
      var p = 0
      var i = 0
      while (p < width * height) {
        g(p) =
          if (bpp == 1) (img(i) & 0xff).toFloat
          else 0.299f * (img(i) & 0xff) + 0.587f * (img(i + 1) & 0xff) +
            0.114f * (img(i + 2) & 0xff)
        p += 1
        i += bpp
      }
      (width, height, g)
    }
  }

  /** 64-bit perceptual difference hash (dHash): luma grid box-averaged
    * down to 9x8 cells, bit (y*8 + x) set iff cell(x,y) > cell(x+1,y) —
    * the horizontal-gradient sign pattern. Identical pixel content hashes
    * identically ACROSS formats (a BMP and a PNG of the same image get
    * the same hash — cross-format image dedup for free), small
    * pixel-level edits flip few bits, and hamming distance between
    * hashes approximates visual difference. None for non-image payloads
    * or images smaller than the 9x8 cell grid. */
  def dHash64(bytes: Array[Byte]): Option[Long] =
    grayGrid(bytes).flatMap { case (w, h, g) =>
      if (w < 9 || h < 8) None
      else {
        // box-average downscale to 9x8: cell (cx, cy) averages the pixel
        // rect [cx*w/9, (cx+1)*w/9) x [cy*h/8, (cy+1)*h/8)
        val cells = Array.ofDim[Double](8, 9)
        var cy = 0
        while (cy < 8) {
          val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
          var cx = 0
          while (cx < 9) {
            val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
            var s = 0.0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { s += g(y * w + x); x += 1 }
              y += 1
            }
            cells(cy)(cx) = s / ((y1 - y0).toLong * (x1 - x0))
            cx += 1
          }
          cy += 1
        }
        var hash = 0L
        var bit = 0
        cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) {
            if (cells(cy)(cx) > cells(cy)(cx + 1)) hash |= (1L << bit)
            bit += 1
            cx += 1
          }
          cy += 1
        }
        Some(hash)
      }
    }

  /** (idCol, phash long) for the image payloads of a binary column —
    * non-image rows are dropped. One per-partition batched pass (the
    * [[decode]] shape); at 100 TB this is the offline hash-build scan,
    * persisted next to the corpus like any fingerprint index. */
  def imageHashes(df: DataFrame, idCol: String,
      contentCol: String = "content"): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(idCol), StructField("phash", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        r.get(contentIdx) match {
          case b: Array[Byte] =>
            dHash64(b).map(h => Row(r.get(idIdx), h))
          case _ => None
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Image near-dup pairs by banded hamming over [[dHash64]] — the
    * [[Dedup.simhashPairs]] shape on the perceptual hash: 8 bands of 8
    * bits, candidates share a band value (pigeonhole: a pair within
    * `maxHamming` <= 7 differing bits has at least one clean band —
    * recall is EXACT, not probabilistic), verified by exact hamming.
    * Candidate volume is band-bucket-bounded, never all-pairs. Output:
    * (id_a, id_b, hamming), id_a < id_b. */
  def imageNearDupPairs(df: DataFrame, idCol: String,
      contentCol: String = "content", maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 7, "8x8-bit banding guarantees recall only for hamming <= 7")
    val hashed = imageHashes(df, idCol, contentCol)
    val chunks = (0 until 8).map(j =>
      struct(lit(j).as("chunk"),
        shiftright(col("phash"), j * 8).bitwiseAND(lit(0xffL)).as("ck")))
    val banded = hashed.select(col(idCol).as("id"), col("phash"),
      explode(array(chunks: _*)).as("cc"))
      .select(col("id"), col("phash"), col("cc.chunk"), col("cc.ck"))
    banded.toDF("id_a", "ph_a", "chunk", "ck")
      .join(banded.toDF("id_b", "ph_b", "chunk", "ck").hint("shuffle_hash"),
        Seq("chunk", "ck"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ph_a", "ph_b").distinct()
      .withColumn("hamming", bit_count(col("ph_a").bitwiseXOR(col("ph_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // ---- video frame sampling (the fourth multimodal verb:
  //      decode / feature-extract / resize / FRAME-SAMPLE) ----

  /** Synthesize a deterministic grayscale "video": a minimal container
    * (magic "GVID", u16 LE width/height/frame count, then raw
    * frame-major w*h gray planes) whose frame f is two horizontal
    * bands — top half (seed + 7f) % 256, bottom half +64 wrapped.
    * The moving-pattern fixture [[frameSample]] is exercised against
    * (the video twin of [[renderWavBursts]]); real decoders slot in at
    * the same seam, exactly like the image codecs. Height must be even
    * so per-frame mean luminance stays closed-form. */
  def renderVideoGray(width: Int, height: Int, nFrames: Int,
      seed: Long): Array[Byte] = {
    require(width >= 1 && height >= 2 && height % 2 == 0 && nFrames >= 1,
      "need width>=1, even height>=2, frames>=1")
    require(seed >= 0, "seed must be >= 0 (band values live on 0..255)")
    val buf = java.nio.ByteBuffer.allocate(10 + width * height * nFrames)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('G'.toByte).put('V'.toByte).put('I'.toByte).put('D'.toByte)
    buf.putShort(width.toShort).putShort(height.toShort)
      .putShort(nFrames.toShort)
    var f = 0
    while (f < nFrames) {
      val vTop = ((seed + 7L * f) % 256L).toInt
      val vBot = (vTop + 64) % 256
      var i = 0
      while (i < width * height) {
        buf.put((if (i < width * height / 2) vTop else vBot).toByte)
        i += 1
      }
      f += 1
    }
    buf.array()
  }

  /** A gray frame whose [[dHash64]] is EXACTLY the given 8 bytes, built
    * to survive JPEG compression: 72x64 pixels in 8x8 constant-gray
    * cells ALIGNED to the JPEG block grid (each block is DC-only, so
    * round-trip error is a couple of gray levels), consecutive cells in
    * a row stepped by ±12 per hash bit (the [[renderBmpHashEncoded]]
    * construction with a 12-level margin instead of 8) — the gradient
    * SIGN, which is all dHash packs, cannot flip. Bit (cy*8 + cx) of
    * the resulting dHash equals bit cx of hashBytes(cy), i.e. the hash
    * IS the little-endian long of the 8 bytes. */
  def renderJpegHashEncoded(hashBytes: Array[Byte],
      quality: Float = 0.92f): Array[Byte] = {
    require(hashBytes.length == 8, "need exactly 8 hash bytes")
    val w = 72; val h = 64
    val gray = new Array[Int](w * h)
    var cy = 0
    while (cy < 8) {
      var v = 128
      var cx = 0
      while (cx < 9) {
        var py = 0
        while (py < 8) {
          var px = 0
          while (px < 8) {
            gray((cy * 8 + py) * w + (cx * 8 + px)) = v
            px += 1
          }
          py += 1
        }
        if (cx < 8)
          v += (if (((hashBytes(cy) >> cx) & 1) == 1) -12 else 12)
        cx += 1
      }
      cy += 1
    }
    encodeJpegGray(w, h, gray, quality)
  }

  /** Wrap pre-encoded JPEG frames as an MJPEG-in-AVI file: the standard
    * RIFF('AVI ') layout — LIST('hdrl') with the 56-byte 'avih' main
    * header and one LIST('strl') video stream ('strh' fccType 'vids',
    * handler 'MJPG'; 'strf' BITMAPINFOHEADER with biCompression 'MJPG')
    * — then LIST('movi') carrying one word-aligned '00dc' chunk per
    * frame. Fixture/synthesis utility; the decode side is
    * [[aviMjpegFrameHashes]], and any standard player opens the
    * output. */
  def renderAviMjpeg(frames: Seq[Array[Byte]], width: Int,
      height: Int, fps: Int = 10): Array[Byte] = {
    require(frames.nonEmpty && width > 0 && height > 0 && fps > 0,
      "need frames and positive dims/fps")
    val bb = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit = {
      bb.write(v & 0xff); bb.write((v >> 8) & 0xff)
      bb.write((v >> 16) & 0xff); bb.write((v >> 24) & 0xff)
    }
    def fourcc(s: String): Unit = bb.write(s.getBytes("US-ASCII"))
    val maxFrame = frames.map(_.length).max
    // sizes, inside-out: strl = strh(8+56) + strf(8+40); hdrl = avih(8+56)
    // + LIST strl(12+strlBody); movi = per frame 8 + payload + pad
    val strlBody = 64 + 48
    val hdrlBody = 64 + 12 + strlBody
    val moviBody = frames.map(f => 8 + f.length + (f.length & 1)).sum + 4
    // 'AVI ' + hdrl LIST (8-byte header + 'hdrl' + body) + movi LIST
    // (8-byte header + body, the body already counting its 'movi' type)
    val riffBody = 4 + (12 + hdrlBody) + (8 + moviBody)
    fourcc("RIFF"); le32(riffBody); fourcc("AVI ")
    fourcc("LIST"); le32(4 + hdrlBody); fourcc("hdrl")
    fourcc("avih"); le32(56)
    le32(1000000 / fps); le32(maxFrame * fps); le32(0)
    le32(0x10) // AVIF_HASINDEX off, AVIF_WASCAPTUREFILE off, 0x10 = AVIF_ISINTERLEAVED
    le32(frames.length); le32(0); le32(1); le32(maxFrame)
    le32(width); le32(height); le32(0); le32(0); le32(0); le32(0)
    fourcc("LIST"); le32(4 + strlBody); fourcc("strl")
    fourcc("strh"); le32(56)
    fourcc("vids"); fourcc("MJPG")
    le32(0); le32(0); le32(0) // flags, prio+lang, initialFrames
    le32(1); le32(fps) // scale, rate -> rate/scale fps
    le32(0); le32(frames.length); le32(maxFrame) // start, length, bufSize
    le32(-1); le32(0) // quality, sampleSize
    le32(0); le32((height << 16) | width) // rcFrame (left,top), (right,bottom)
    fourcc("strf"); le32(40)
    le32(40); le32(width); le32(height)
    le32((24 << 16) | 1) // planes 1, bitcount 24
    fourcc("MJPG"); le32(width * height * 3)
    le32(0); le32(0); le32(0); le32(0)
    fourcc("LIST"); le32(moviBody); fourcc("movi")
    frames.foreach { f =>
      fourcc("00dc"); le32(f.length); bb.write(f)
      if ((f.length & 1) == 1) bb.write(0) // word alignment
    }
    bb.toByteArray
  }

  /** Frame-sample an MJPEG-in-AVI video column to per-frame perceptual
    * hashes: walk the RIFF chunk tree to LIST('movi'), take every
    * `everyK`-th video frame chunk ('##dc'/'##db'), decode the embedded
    * JPEG through the SAME [[JpegCodec]] path as still images and emit
    * its [[dHash64]] — a real-world container composed from codecs the
    * engine already has, vs [[frameSample]]'s synthetic raw-frame GVID
    * oracle path. Corrupt/truncated chunks and undecodable frames are
    * dropped, never thrown (the codec-op contract). Output: (idCol,
    * frame_idx, dhash).
    *
    * 100 TB shape: per-partition batched byte scan, no shuffle — the
    * [[frameSample]]/[[imageHashes]] shape exactly. */
  def aviMjpegFrameHashes(df: DataFrame, idCol: String,
      contentCol: String = "content", everyK: Int = 1): DataFrame = {
    require(everyK >= 1, "everyK must be >= 1")
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        r.get(contentIdx) match {
          case b: Array[Byte] if b.length >= 12 &&
              b(0) == 'R'.toByte && b(1) == 'I'.toByte &&
              b(2) == 'F'.toByte && b(3) == 'F'.toByte &&
              b(8) == 'A'.toByte && b(9) == 'V'.toByte &&
              b(10) == 'I'.toByte && b(11) == ' '.toByte =>
            // top-level walk to LIST('movi'); a truncated file keeps its
            // complete frames (moviEnd clamps to the payload) — salvage,
            // don't throw, is the codec-op contract. Bounds math is in
            // Long: a crafted declared size near 2^31 would overflow
            // `off + 8 + size` negative in Int, pass the check, and
            // drive a negative offset into copyOfRange — oversized
            // chunks are truncation, never an executor throw.
            var off = 12
            var moviOff = -1; var moviEnd = -1
            while (moviOff < 0 && off + 8 <= b.length) {
              val size = i32(b, off + 4)
              if (size < 0) { off = b.length }
              else if (off + 12 <= b.length &&
                  b(off) == 'L'.toByte && b(off + 1) == 'I'.toByte &&
                  b(off + 2) == 'S'.toByte && b(off + 3) == 'T'.toByte &&
                  size >= 4 && b(off + 8) == 'm'.toByte &&
                  b(off + 9) == 'o'.toByte && b(off + 10) == 'v'.toByte &&
                  b(off + 11) == 'i'.toByte) {
                moviOff = off + 12
                moviEnd = math.min(off.toLong + 8L + size,
                  b.length.toLong).toInt
              }
              else if (off.toLong + 8L + size > b.length) { off = b.length }
              else off += 8 + size + (size & 1)
            }
            if (moviOff < 0) Iterator.empty
            else {
              val out = scala.collection.mutable.ArrayBuffer
                .empty[org.apache.spark.sql.Row]
              var o = moviOff
              var frame = 0L
              while (o + 8 <= moviEnd) {
                val size = i32(b, o + 4)
                if (size < 0 || o.toLong + 8L + size > moviEnd) { o = moviEnd }
                else {
                  val isVid = (b(o + 2) == 'd'.toByte &&
                    (b(o + 3) == 'c'.toByte || b(o + 3) == 'b'.toByte))
                  if (isVid) {
                    if (frame % everyK == 0L) {
                      val payload = java.util.Arrays
                        .copyOfRange(b, o + 8, o + 8 + size)
                      dHash64(payload).foreach { hsh =>
                        out += org.apache.spark.sql.Row(
                          r.get(idIdx), frame, hsh)
                      }
                    }
                    frame += 1L
                  }
                  o += 8 + size + (size & 1)
                }
              }
              out.iterator
            }
          case _ => Iterator.empty
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Frame-sample a video column: parse the container header, decode
    * every `everyK`-th frame (0, k, 2k, ...) and emit its exact
    * per-frame mean luminance — the "thumbnail every N seconds"
    * pre-processing a multimodal training pipeline runs before
    * feature extraction, as a per-partition batched scan (the codec-op
    * shape: embarrassingly parallel, no shuffle, non-video payloads
    * dropped). Output: (idCol, frame_idx, width, height, mean_luma).
    *
    * 100 TB shape: one narrow scan; each row's cost is its own
    * payload; sampled frames fan out as emitted rows, never as
    * intermediate blobs. */
  def frameSample(df: DataFrame, idCol: String,
      contentCol: String = "content", everyK: Int = 2): DataFrame = {
    require(everyK >= 1, "everyK must be >= 1")
    val outSchema = StructType(Seq(
      df.schema(idCol),
      StructField("frame_idx", LongType, nullable = false),
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false),
      StructField("mean_luma", DoubleType, nullable = false)))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        r.get(contentIdx) match {
          case b: Array[Byte] if b.length >= 10 && b(0) == 'G'.toByte &&
              b(1) == 'V'.toByte && b(2) == 'I'.toByte &&
              b(3) == 'D'.toByte =>
            val w = u16(b, 4); val h = u16(b, 6); val nf = u16(b, 8)
            if (w < 1 || h < 1 || nf < 1 ||
              10L + w.toLong * h * nf > b.length) Iterator.empty
            else (0 until nf by everyK).iterator.map { f =>
              val off = 10 + w * h * f
              var s = 0L; var i = 0
              while (i < w * h) { s += (b(off + i) & 0xff); i += 1 }
              Row(r.get(idIdx), f.toLong, w, h,
                java.math.BigDecimal.valueOf(
                  s.toDouble / (w.toLong * h))
                  .setScale(6, java.math.RoundingMode.HALF_UP)
                  .doubleValue())
            }
          case _ => Iterator.empty
        }
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }
}
