package graft.operators

/** REAL pure-JVM codecs for two standard container formats — RIFF/WAVE
  * (PCM16) and BMP (BITMAPINFOHEADER, 24 bpp) — so the multimodal decode
  * stage is an actual byte-level parser rather than a stub: the container
  * has no media libraries, but these formats need none. Encoders exist so
  * tests and the synthetic corpus can round-trip: synth → bytes → parse
  * must recover the parameters and the content features exactly.
  *
  * Everything here is driver/executor-local byte work with no Spark
  * dependency; the Spark stage wrapping it lives in [[Multimodal]].
  */
object MediaCodec {

  // ---- RIFF/WAVE, PCM 16-bit little-endian --------------------------------

  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nSamples: Int, durationMs: Double,
                           rms: Double, peak: Int)

  private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
    b(off + 2) = (v >> 16).toByte; b(off + 3) = (v >> 24).toByte
  }
  private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >> 8).toByte
  }
  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def rdLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Encode mono PCM16 samples as a canonical 44-byte-header WAV file. */
  def wavBytes(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    le32(out, 16, 16) // fmt chunk size
    le16(out, 20, 1) // PCM
    le16(out, 22, 1) // mono
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * 2) // byte rate
    le16(out, 32, 2) // block align
    le16(out, 34, 16) // bits
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    le32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) { le16(out, 44 + 2 * i, samples(i) & 0xFFFF); i += 1 }
    out
  }

  // ---- G.711 µ-law (r7): companded telephony audio inside RIFF ----------

  final case class UlawInfo(sampleRate: Int, channels: Int, nSamples: Int,
                            meanAbs: Double, peak: Int)

  /** Expand one µ-law byte to its linear PCM16 value — the G.711 table
    * formula in exact integer arithmetic (ITU-T G.711, µ=255):
    * complement the byte, split sign/exponent/mantissa, rebuild the
    * magnitude with the 0x84 bias. Pure bit-math, reproducible in SQL. */
  def ulawExpand(b: Int): Int = {
    val u = ~b & 0xFF
    val sign = (u & 0x80) != 0
    val exp = (u >>> 4) & 7
    val mant = u & 0xF
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    if (sign) -mag else mag
  }

  /** Encode a mono µ-law WAV (format code 7, 8 bits/sample) from raw
    * µ-law bytes. */
  def ulawWavBytes(ulaw: Array[Byte], sampleRate: Int): Array[Byte] = {
    val dataLen = ulaw.length
    val out = new Array[Byte](44 + dataLen)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(out, 4, 36 + dataLen)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    le32(out, 16, 16)
    le16(out, 20, 7) // WAVE_FORMAT_MULAW
    le16(out, 22, 1) // mono
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate) // byte rate: 1 byte/sample
    le16(out, 32, 1) // block align
    le16(out, 34, 8) // bits per (companded) sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    le32(out, 40, dataLen)
    ulaw.copyToArray(out, 44)
    out
  }

  /** Parse a µ-law WAV (RIFF walk as [[parseWav]], format code 7), expand
    * every byte through [[ulawExpand]], fold mean |PCM| and peak — the
    * decoded-CONTENT features an oracle can predict exactly (the
    * expansion is integer bit-math, unlike PCM16's LCG synth). */
  def parseUlawWav(bytes: Array[Byte]): UlawInfo = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "not a RIFF/WAVE file")
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = tag(bytes, off); val len = rdLe32(bytes, off + 4)
      require(len >= 0 && off + 8 + len.toLong <= bytes.length,
        s"malformed '$id' chunk: len=$len at off=$off of ${bytes.length}")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short: $len")
          val fmt = rdLe16(bytes, off + 8)
          require(fmt == 7, s"not mu-law (format $fmt)")
          channels = rdLe16(bytes, off + 10)
          sampleRate = rdLe32(bytes, off + 12)
          bits = rdLe16(bytes, off + 22)
        case "data" => dataOff = off + 8; dataLen = len
        case _ => ()
      }
      off += 8 + len + (len & 1)
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt or data chunk")
    require(bits == 8, s"mu-law carries 8-bit bytes, got $bits-bit")
    var sumAbs = 0L; var peak = 0; var i = 0
    while (i < dataLen) {
      val pcm = ulawExpand(bytes(dataOff + i) & 0xFF)
      val a = math.abs(pcm)
      sumAbs += a; if (a > peak) peak = a
      i += 1
    }
    UlawInfo(sampleRate, channels, dataLen,
      if (dataLen == 0) 0.0 else sumAbs.toDouble / dataLen, peak)
  }

  /** Expand one A-law byte to linear PCM — G.711's other companding half
    * (ITU-T G.711, A=87.6): XOR the 0x55 toggle pattern, split fields,
    * rebuild with the segment-0 special case. Exact integer bit-math. */
  def alawExpand(b: Int): Int = {
    val a = (b ^ 0x55) & 0xFF
    val sign = (a & 0x80) != 0
    val exp = (a >>> 4) & 7
    val mant = a & 0xF
    val mag =
      if (exp == 0) (mant << 4) + 8
      else ((mant << 4) + 0x108) << (exp - 1)
    if (sign) mag else -mag
  }

  /** Encode a mono A-law WAV (format code 6, 8 bits/sample). */
  def alawWavBytes(alaw: Array[Byte], sampleRate: Int): Array[Byte] = {
    val out = ulawWavBytes(alaw, sampleRate)
    le16(out, 20, 6) // WAVE_FORMAT_ALAW over the same RIFF skeleton
    out
  }

  /** Parse an A-law WAV (format code 6), expand through [[alawExpand]],
    * fold decoded-content features like [[parseUlawWav]]. */
  def parseAlawWav(bytes: Array[Byte]): UlawInfo = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "not a RIFF/WAVE file")
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = tag(bytes, off); val len = rdLe32(bytes, off + 4)
      require(len >= 0 && off + 8 + len.toLong <= bytes.length,
        s"malformed '$id' chunk: len=$len at off=$off of ${bytes.length}")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short: $len")
          val fmt = rdLe16(bytes, off + 8)
          require(fmt == 6, s"not A-law (format $fmt)")
          channels = rdLe16(bytes, off + 10)
          sampleRate = rdLe32(bytes, off + 12)
          bits = rdLe16(bytes, off + 22)
        case "data" => dataOff = off + 8; dataLen = len
        case _ => ()
      }
      off += 8 + len + (len & 1)
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt or data chunk")
    require(bits == 8, s"A-law carries 8-bit bytes, got $bits-bit")
    var sumAbs = 0L; var peak = 0; var i = 0
    while (i < dataLen) {
      val pcm = alawExpand(bytes(dataOff + i) & 0xFF)
      val a = math.abs(pcm)
      sumAbs += a; if (a > peak) peak = a
      i += 1
    }
    UlawInfo(sampleRate, channels, dataLen,
      if (dataLen == 0) 0.0 else sumAbs.toDouble / dataLen, peak)
  }

  /** Parse a WAV file: walk the RIFF chunk list (not fixed offsets — files
    * with LIST/fact chunks parse too), validate PCM, and fold the sample
    * data into RMS / peak in one pass. Throws on malformed input. */
  def parseWav(bytes: Array[Byte]): WavInfo = {
    require(bytes.length >= 12 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "not a RIFF/WAVE file")
    var off = 12
    var sampleRate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = tag(bytes, off); val len = rdLe32(bytes, off + 4)
      // the 32-bit length field is UNTRUSTED input: a negative value would
      // stall the walk forever (off += 0) or smuggle a negative dataLen
      // past the truncation check, and a length past EOF would read wild —
      // executor tasks run this over arbitrary binary columns, so every
      // advance must be validated before use
      require(len >= 0 && off + 8 + len.toLong <= bytes.length,
        s"malformed '$id' chunk: len=$len at off=$off of ${bytes.length}")
      id match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short: $len")
          val fmt = rdLe16(bytes, off + 8)
          require(fmt == 1, s"not PCM (format $fmt)")
          channels = rdLe16(bytes, off + 10)
          sampleRate = rdLe32(bytes, off + 12)
          bits = rdLe16(bytes, off + 22)
        case "data" => dataOff = off + 8; dataLen = len
        case _ => () // skip LIST/fact/...
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt or data chunk")
    require(bits == 16, s"only PCM16 supported, got $bits-bit")
    require(dataOff + dataLen <= bytes.length, "truncated data chunk")
    val n = dataLen / 2
    var sumSq = 0.0; var peak = 0; var i = 0
    while (i < n) {
      val s = rdLe16(bytes, dataOff + 2 * i).toShort.toInt
      sumSq += s.toDouble * s; if (math.abs(s) > peak) peak = math.abs(s)
      i += 1
    }
    val frames = n / math.max(1, channels)
    WavInfo(sampleRate, channels, bits, n,
      frames * 1000.0 / sampleRate,
      if (n == 0) 0.0 else math.sqrt(sumSq / n), peak)
  }

  // ---- BMP, BITMAPINFOHEADER, 24 bpp bottom-up ----------------------------

  final case class BmpInfo(width: Int, height: Int, bitsPerPixel: Int,
                           meanR: Double, meanG: Double, meanB: Double)

  private def rowStride(w: Int): Int = (w * 3 + 3) & ~3 // rows pad to 4 bytes

  /** Encode a 24 bpp bottom-up BMP; `rgb(x, y)` returns 0xRRGGBB with
    * (0,0) the TOP-left pixel (the encoder handles the bottom-up flip). */
  def bmpBytes(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val stride = rowStride(w)
    val dataLen = stride * h
    val out = new Array[Byte](54 + dataLen)
    out(0) = 'B'; out(1) = 'M'
    le32(out, 2, 54 + dataLen); le32(out, 10, 54)
    le32(out, 14, 40) // BITMAPINFOHEADER
    le32(out, 18, w); le32(out, 22, h)
    le16(out, 26, 1); le16(out, 28, 24)
    le32(out, 34, dataLen)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * stride // bottom-up
      var x = 0
      while (x < w) {
        val c = rgb(x, y)
        out(rowOff + 3 * x) = (c & 0xFF).toByte // B
        out(rowOff + 3 * x + 1) = ((c >> 8) & 0xFF).toByte // G
        out(rowOff + 3 * x + 2) = ((c >> 16) & 0xFF).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a 24 bpp BMP: header fields + per-channel means in one pass. */
  def parseBmp(bytes: Array[Byte]): BmpInfo = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP file")
    val dataOff = rdLe32(bytes, 10)
    val w = rdLe32(bytes, 18); val h = rdLe32(bytes, 22)
    val bpp = rdLe16(bytes, 28)
    require(bpp == 24, s"only 24 bpp supported, got $bpp")
    require(w > 0 && h > 0, s"unsupported dimensions ${w}x$h")
    val stride = rowStride(w)
    // LONG math: a header claiming huge dimensions would int-overflow
    // stride*h negative, pass the check, and crash the scan loop with an
    // uncontrolled out-of-bounds instead of this clean error
    require(dataOff >= 0 &&
      dataOff.toLong + stride.toLong * h <= bytes.length,
      "truncated pixel data")
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      val rowOff = dataOff + y * stride
      var x = 0
      while (x < w) {
        sb += bytes(rowOff + 3 * x) & 0xFF
        sg += bytes(rowOff + 3 * x + 1) & 0xFF
        sr += bytes(rowOff + 3 * x + 2) & 0xFF
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    BmpInfo(w, h, bpp, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  // ---- PNG, 8-bit RGB/RGBA, non-interlaced --------------------------------
  //
  // PNG is the one mainstream image container that needs NO media library:
  // its only compression is zlib (java.util.zip ships Deflater/Inflater)
  // and its only transform is the five per-scanline byte filters. This is
  // a real codec, not a container walk: the encoder deflates filtered
  // scanlines (cycling through ALL five filter types so the decoder's
  // un-filtering is actually exercised), the decoder walks the chunk list
  // big-endian, verifies every CRC-32, inflates, un-filters, and folds
  // channel means. Spec: PNG (Second Edition), W3C/ISO 15948.

  final case class PngInfo(width: Int, height: Int, bitDepth: Int,
                           colorType: Int, meanR: Double, meanG: Double,
                           meanB: Double, meanA: Double)

  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  private def be32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }
  private def rdBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def crcOf(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(b, off, len)
    c.getValue.toInt
  }

  private def pngChunk(out: java.io.ByteArrayOutputStream, typ: String,
                       payload: Array[Byte]): Unit = {
    val buf = new Array[Byte](8 + payload.length + 4)
    be32(buf, 0, payload.length)
    typ.getBytes("US-ASCII").copyToArray(buf, 4)
    payload.copyToArray(buf, 8)
    be32(buf, 8 + payload.length, crcOf(buf, 4, 4 + payload.length))
    out.write(buf)
  }

  /** Paeth predictor (PNG spec §9.4) — exact integer form. */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode an 8-bit PNG; `rgba(x, y)` returns 0xAARRGGBB with (0,0) the
    * top-left pixel. `withAlpha` selects color type 6 (RGBA) vs 2 (RGB,
    * alpha byte ignored). Scanline `y` is written with filter type
    * `y % 5`, so every filter (None/Sub/Up/Average/Paeth) round-trips. */
  def pngBytes(w: Int, h: Int, rgba: (Int, Int) => Int,
               withAlpha: Boolean): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    val bpp = if (withAlpha) 4 else 3
    val stride = w * bpp
    // raw scanlines, top-down
    val raw = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = rgba(x, y)
        val o = y * stride + x * bpp
        raw(o) = ((c >>> 16) & 0xFF).toByte
        raw(o + 1) = ((c >>> 8) & 0xFF).toByte
        raw(o + 2) = (c & 0xFF).toByte
        if (withAlpha) raw(o + 3) = ((c >>> 24) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    // filtered stream: 1 filter byte + stride bytes per scanline
    val filtered = new Array[Byte](h * (stride + 1))
    y = 0
    while (y < h) {
      val f = y % 5
      filtered(y * (stride + 1)) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = raw(y * stride + i) & 0xFF
        val left = if (i >= bpp) raw(y * stride + i - bpp) & 0xFF else 0
        val up = if (y > 0) raw((y - 1) * stride + i) & 0xFF else 0
        val ul = if (y > 0 && i >= bpp) raw((y - 1) * stride + i - bpp) & 0xFF else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        filtered(y * (stride + 1) + 1 + i) = ((cur - pred) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    // zlib-deflate the filtered stream
    val defl = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, /* nowrap = */ false)
    defl.setInput(filtered); defl.finish()
    val comp = new java.io.ByteArrayOutputStream
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) comp.write(tmp, 0, defl.deflate(tmp))
    defl.end()

    val out = new java.io.ByteArrayOutputStream
    out.write(PngSig)
    val ihdr = new Array[Byte](13)
    be32(ihdr, 0, w); be32(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (withAlpha) 6 else 2).toByte // color type
    // compression 0, filter 0, interlace 0 already zero
    pngChunk(out, "IHDR", ihdr)
    pngChunk(out, "IDAT", comp.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode to raw top-down pixel bytes: walk chunks (CRC-verified),
    * inflate the concatenated IDAT stream, reverse the per-scanline
    * filters. Returns (w, h, colorType, pixels[h*w*bpp]). */
  private def pngDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Byte]) = {
    require(bytes.length >= 8 + 25 && // sig + IHDR at minimum
      java.util.Arrays.equals(bytes, 0, 8, PngSig, 0, 8), "not a PNG file")
    var off = 8
    var w = -1; var h = -1; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream
    var ended = false
    while (!ended) {
      // every field of the chunk header is UNTRUSTED: lengths are signed
      // reads of attacker bytes and must bound-check in LONG math before
      // any advance — executor tasks run this over arbitrary binary cells
      require(off + 8 <= bytes.length, "truncated chunk header")
      val len = rdBe32(bytes, off)
      val typ = tag(bytes, off + 4)
      require(len >= 0 && off + 12L + len <= bytes.length,
        s"malformed '$typ' chunk: len=$len at off=$off of ${bytes.length}")
      require(rdBe32(bytes, off + 8 + len) == crcOf(bytes, off + 4, 4 + len),
        s"CRC mismatch in '$typ' chunk")
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len")
          w = rdBe32(bytes, off + 8); h = rdBe32(bytes, off + 12)
          val depth = bytes(off + 16) & 0xFF
          colorType = bytes(off + 17) & 0xFF
          require(depth == 8, s"only 8-bit PNG supported, got depth $depth")
          require(colorType == 2 || colorType == 6,
            s"only RGB/RGBA PNG supported, got color type $colorType")
          require(bytes(off + 18) == 0 && bytes(off + 19) == 0 &&
            bytes(off + 20) == 0, "unsupported compression/filter/interlace")
          require(w > 0 && h > 0 && w.toLong * h <= 64000000L,
            s"unsupported dimensions ${w}x$h")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => ended = true
        case _ => () // ancillary chunks (tEXt/pHYs/...) skip
      }
      off += 12 + len
    }
    require(w > 0 && idat.size > 0, "missing IHDR or IDAT")
    val bpp = if (colorType == 6) 4 else 3
    val stride = w * bpp
    val expect = h.toLong * (stride + 1)
    require(expect <= Int.MaxValue, "image too large")
    val filtered = new Array[Byte](expect.toInt)
    val infl = new java.util.zip.Inflater(/* nowrap = */ false)
    infl.setInput(idat.toByteArray)
    var got = 0
    while (got < filtered.length && !infl.finished()) {
      val n = infl.inflate(filtered, got, filtered.length - got)
      // all input was supplied up front: a zero-byte round that is not
      // the end of the stream means truncated/corrupt data, not "feed me"
      require(n > 0 || infl.finished(), "truncated IDAT stream")
      got += n
    }
    infl.end()
    require(got == filtered.length, s"IDAT inflated to $got of $expect bytes")
    // un-filter scanlines in place into the raw buffer
    val raw = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = filtered(y * (stride + 1)) & 0xFF
      require(f <= 4, s"bad filter type $f on scanline $y")
      var i = 0
      while (i < stride) {
        val v = filtered(y * (stride + 1) + 1 + i) & 0xFF
        val left = if (i >= bpp) raw(y * stride + i - bpp) & 0xFF else 0
        val up = if (y > 0) raw((y - 1) * stride + i) & 0xFF else 0
        val ul = if (y > 0 && i >= bpp) raw((y - 1) * stride + i - bpp) & 0xFF else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 => paeth(left, up, ul)
        }
        raw(y * stride + i) = ((v + pred) & 0xFF).toByte
        i += 1
      }
      y += 1
    }
    (w, h, colorType, raw)
  }

  /** Parse an 8-bit RGB/RGBA PNG: header fields + per-channel means.
    * `meanA` is 255 for alpha-less images (the opaque convention). */
  def parsePng(bytes: Array[Byte]): PngInfo = {
    val (w, h, colorType, raw) = pngDecode(bytes)
    val bpp = if (colorType == 6) 4 else 3
    var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
    var o = 0
    while (o < raw.length) {
      sr += raw(o) & 0xFF; sg += raw(o + 1) & 0xFF; sb += raw(o + 2) & 0xFF
      if (bpp == 4) sa += raw(o + 3) & 0xFF
      o += bpp
    }
    val n = w.toLong * h
    PngInfo(w, h, 8, colorType, sr.toDouble / n, sg.toDouble / n,
      sb.toDouble / n, if (bpp == 4) sa.toDouble / n else 255.0)
  }

  /** REAL resize: nearest-neighbor downsample of an 8-bit PNG to an
    * `ow`×`oh` grayscale float array (row-major, luma = (R+G+B)/3/255). */
  def pngResizeGray(bytes: Array[Byte], ow: Int, oh: Int): Array[Float] = {
    require(ow > 0 && oh > 0)
    val (w, h, colorType, raw) = pngDecode(bytes)
    val bpp = if (colorType == 6) 4 else 3
    val stride = w * bpp
    val out = new Array[Float](ow * oh)
    var oy = 0
    while (oy < oh) {
      val sy = math.min(h - 1, oy * h / oh)
      var ox = 0
      while (ox < ow) {
        val sx = math.min(w - 1, ox * w / ow)
        val o = sy * stride + sx * bpp
        val r = raw(o) & 0xFF; val g = raw(o + 1) & 0xFF
        val b = raw(o + 2) & 0xFF
        out(oy * ow + ox) = (r + g + b) / 3.0f / 255.0f
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** REAL resize: nearest-neighbor downsample of a 24 bpp BMP to an
    * `ow`×`oh` grayscale float array (row-major, luma = (R+G+B)/3/255). */
  def bmpResizeGray(bytes: Array[Byte], ow: Int, oh: Int): Array[Float] = {
    require(ow > 0 && oh > 0)
    // same untrusted-header validation as parseBmp — this entry point was
    // reading header fields from arbitrary bytes unchecked
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP file")
    val dataOff = rdLe32(bytes, 10)
    val w = rdLe32(bytes, 18); val h = rdLe32(bytes, 22)
    require(rdLe16(bytes, 28) == 24, "only 24 bpp supported")
    require(w > 0 && h > 0, s"unsupported dimensions ${w}x$h")
    val stride = rowStride(w)
    require(dataOff >= 0 &&
      dataOff.toLong + stride.toLong * h <= bytes.length,
      "truncated pixel data")
    val out = new Array[Float](ow * oh)
    var oy = 0
    while (oy < oh) {
      val sy = math.min(h - 1, oy * h / oh)
      val rowOff = dataOff + (h - 1 - sy) * stride // bottom-up → top-down
      var ox = 0
      while (ox < ow) {
        val sx = math.min(w - 1, ox * w / ow)
        val b = bytes(rowOff + 3 * sx) & 0xFF
        val g = bytes(rowOff + 3 * sx + 1) & 0xFF
        val r = bytes(rowOff + 3 * sx + 2) & 0xFF
        out(oy * ow + ox) = (r + g + b) / 3.0f / 255.0f
        ox += 1
      }
      oy += 1
    }
    out
  }

  // ---- GIF (r7): indexed-color LZW — a third real compressed format ----
  // GIF89a with a 256-entry global color table and the full variable-width
  // LZW coder (9→12-bit codes, clear-code dictionary reset at 4096,
  // LSB-first bit packing, 255-byte sub-blocks). Spec: GIF89a (CompuServe
  // 1990) §§17-24, Appendix F.

  final case class GifInfo(width: Int, height: Int, gctSize: Int,
                           meanR: Double, meanG: Double, meanB: Double)

  private val GifSig: Array[Byte] = "GIF89a".getBytes("US-ASCII")

  /** Encode an indexed-color GIF89a: 256-entry palette `palette(i)` =
    * 0xRRGGBB, pixel indices from `idx(x, y)` with (0,0) top-left. */
  def gifBytes(w: Int, h: Int, palette: Int => Int,
               idx: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xFFFF && h <= 0xFFFF,
      s"bad dimensions ${w}x$h")
    val out = new java.io.ByteArrayOutputStream
    out.write(GifSig)
    // logical screen descriptor: GCT present, 8 bits/channel, 256 entries
    out.write(w & 0xFF); out.write(w >>> 8)
    out.write(h & 0xFF); out.write(h >>> 8)
    out.write(0xF7) // 1 111 0 111: GCT, color res 8, unsorted, 2^8 entries
    out.write(0); out.write(0) // background index, aspect ratio
    var i = 0
    while (i < 256) {
      val c = palette(i)
      out.write((c >>> 16) & 0xFF); out.write((c >>> 8) & 0xFF)
      out.write(c & 0xFF)
      i += 1
    }
    // image descriptor at (0,0), no local table, not interlaced
    out.write(0x2C)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(w & 0xFF); out.write(w >>> 8)
    out.write(h & 0xFF); out.write(h >>> 8)
    out.write(0)
    // LZW-compress the index stream
    val minCode = 8
    out.write(minCode)
    val clear = 1 << minCode; val eoi = clear + 1
    val dict = new java.util.HashMap[Integer, Integer]() // (prev<<8|k) → code
    var next = eoi + 1
    var width = minCode + 1
    var bitBuf = 0L; var bitCnt = 0
    val data = new java.io.ByteArrayOutputStream
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += width
      while (bitCnt >= 8) {
        data.write((bitBuf & 0xFF).toInt); bitBuf >>>= 8; bitCnt -= 8
      }
    }
    def resetDict(): Unit = { dict.clear(); next = eoi + 1; width = minCode + 1 }
    put(clear)
    var prev = -1
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val k = idx(x, y) & 0xFF
        if (prev < 0) prev = k
        else {
          val key: Integer = (prev << 8) | k
          val hit = dict.get(key)
          if (hit != null) prev = hit.intValue()
          else {
            put(prev)
            dict.put(key, next)
            // grow AFTER registering: the decoder mirrors this exactly
            // (it grows when its next-slot fills the current width)
            if (next == (1 << width) && width < 12) width += 1
            next += 1
            if (next == 4096) { put(clear); resetDict() }
            prev = k
          }
        }
        x += 1
      }
      y += 1
    }
    if (prev >= 0) put(prev)
    put(eoi)
    if (bitCnt > 0) data.write((bitBuf & 0xFF).toInt)
    // 255-byte sub-blocks + terminator
    val bytes = data.toByteArray
    var off = 0
    while (off < bytes.length) {
      val n = math.min(255, bytes.length - off)
      out.write(n); out.write(bytes, off, n)
      off += n
    }
    out.write(0)
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Decode a GIF written in the [[gifBytes]] profile (GCT, one image, no
    * extensions — extension blocks are SKIPPED so foreign single-frame
    * GIFs parse too). Returns (w, h, gctSize, palette, indices). */
  private def gifDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Int], Array[Byte]) = {
    require(bytes.length >= 13 &&
      (java.util.Arrays.equals(bytes, 0, 6, GifSig, 0, 6) ||
        bytes.startsWith("GIF87a".getBytes("US-ASCII"))), "not a GIF file")
    val sw = rdLe16(bytes, 6); val sh = rdLe16(bytes, 8)
    val packed = bytes(10) & 0xFF
    require((packed & 0x80) != 0, "global color table required")
    val gctSize = 2 << (packed & 7)
    var off = 13
    require(off + 3 * gctSize <= bytes.length, "truncated color table")
    val palette = new Array[Int](gctSize)
    var i = 0
    while (i < gctSize) {
      palette(i) = ((bytes(off) & 0xFF) << 16) | ((bytes(off + 1) & 0xFF) << 8) |
        (bytes(off + 2) & 0xFF)
      off += 3; i += 1
    }
    // skip extension blocks (0x21 label, sub-blocks) to the image
    // descriptor — every read bounds-checked so truncated input raises a
    // clean IllegalArgumentException, never an out-of-bounds crash
    while (off < bytes.length && (bytes(off) & 0xFF) == 0x21) {
      off += 2 // introducer + label
      require(off < bytes.length, "truncated extension block")
      while ((bytes(off) & 0xFF) != 0) {
        off += 1 + (bytes(off) & 0xFF)
        require(off < bytes.length, "truncated extension block")
      }
      off += 1
    }
    require(off < bytes.length && (bytes(off) & 0xFF) == 0x2C,
      "image descriptor not found")
    require(off + 11 <= bytes.length, "truncated image descriptor")
    val w = rdLe16(bytes, off + 5); val h = rdLe16(bytes, off + 7)
    require(w == sw && h == sh && ((bytes(off + 9) & 0x80) == 0),
      "only full-frame images with the global table are supported")
    off += 10
    val minCode = bytes(off) & 0xFF; off += 1
    // concatenate sub-blocks
    val data = new java.io.ByteArrayOutputStream
    require(off < bytes.length, "truncated image data")
    while ((bytes(off) & 0xFF) != 0) {
      val n = bytes(off) & 0xFF
      require(off + 1 + n < bytes.length, "truncated image data")
      data.write(bytes, off + 1, n); off += 1 + n
    }
    val stream = data.toByteArray
    // variable-width LZW decode
    val clear = 1 << minCode; val eoi = clear + 1
    val prefix = new Array[Int](4096); val suffix = new Array[Byte](4096)
    var next = eoi + 1; var width = minCode + 1
    i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i.toByte; i += 1 }
    val out = new Array[Byte](w * h)
    var outPos = 0
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    var prev = -1
    val seq = new Array[Byte](4096)
    def expand(code: Int): Int = { // write table entry, return first byte
      var c = code; var n = 0
      while (c >= 0) { seq(n) = suffix(c); c = prefix(c); n += 1 }
      val first = seq(n - 1) & 0xFF
      var j = n - 1
      while (j >= 0 && outPos < out.length) {
        out(outPos) = seq(j); outPos += 1; j -= 1
      }
      first
    }
    var done = false
    while (!done) {
      while (bitCnt < width && pos < stream.length) {
        bitBuf |= (stream(pos) & 0xFFL) << bitCnt; bitCnt += 8; pos += 1
      }
      require(bitCnt >= width, "truncated LZW stream")
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      if (code == clear) {
        next = eoi + 1; width = minCode + 1; prev = -1
      } else if (code == eoi) done = true
      else {
        require(code <= next, s"corrupt LZW code $code (table size $next)")
        if (prev < 0) { expand(code); prev = code }
        else {
          if (next < 4096) {
            prefix(next) = prev
            // the K of wKwK: first byte of THIS code's expansion
            suffix(next) = 0 // patched below
          }
          val first =
            if (code < next) expand(code)
            else { // code == next: wKw — expand prev then its first byte
              var c = prev; var n = 0
              while (c >= 0) { seq(n) = suffix(c); c = prefix(c); n += 1 }
              val f = seq(n - 1) & 0xFF
              var j = n - 1
              while (j >= 0 && outPos < out.length) {
                out(outPos) = seq(j); outPos += 1; j -= 1
              }
              if (outPos < out.length) { out(outPos) = f.toByte; outPos += 1 }
              f
            }
          if (next < 4096) {
            suffix(next) = first.toByte
            // grow when the just-filled slot saturates the current width
            // (mirrors the encoder's post-registration growth)
            if (next + 1 == (1 << width) && width < 12) width += 1
            next += 1
          }
          prev = code
        }
      }
      if (outPos >= out.length && !done) {
        // all pixels recovered; consume through EOI if present, else stop
        done = true
      }
    }
    require(outPos == w * h, s"decoded $outPos of ${w * h} pixels")
    (w, h, gctSize, palette, out)
  }

  /** Parse + per-channel means through the palette. */
  def parseGif(bytes: Array[Byte]): GifInfo = {
    val (w, h, gctSize, palette, px) = gifDecode(bytes)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    while (i < px.length) {
      val c = palette(px(i) & 0xFF)
      sr += (c >>> 16) & 0xFF; sg += (c >>> 8) & 0xFF; sb += c & 0xFF
      i += 1
    }
    val n = (w.toLong * h).toDouble
    GifInfo(w, h, gctSize, sr / n, sg / n, sb / n)
  }

  // ---- TIFF (r7): baseline little-endian truecolor — the IFD walk ----
  // Uncompressed 8-bit RGB, single strip, "II*\0" byte order. The work a
  // TIFF reader genuinely does is the Image File Directory: a tag table
  // of (tag, type, count, value-or-offset) entries with values inlined
  // when they fit 4 bytes and stored out-of-line otherwise — this parser
  // walks it for real (BitsPerSample lives out-of-line as 3 SHORTs).
  // Spec: TIFF 6.0 (Adobe, 1992) §2.

  final case class TiffInfo(width: Int, height: Int, samplesPerPixel: Int,
                            meanR: Double, meanG: Double, meanB: Double)

  /** Encode a baseline RGB TIFF; `rgb(x, y)` returns 0xRRGGBB, (0,0)
    * top-left. Layout: 8-byte header · pixel strip · BitsPerSample array ·
    * IFD. */
  def tiffBytes(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w.toLong * h * 3 < Int.MaxValue,
      s"bad dimensions ${w}x$h")
    val nPix = w * h * 3
    val pixOff = 8
    val bitsOff = pixOff + nPix
    val ifdOff = bitsOff + 6
    val nEntries = 9
    val out = new Array[Byte](ifdOff + 2 + nEntries * 12 + 4)
    out(0) = 'I'; out(1) = 'I'; le16(out, 2, 42); le32(out, 4, ifdOff)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val c = rgb(x, y)
        val o = pixOff + (y * w + x) * 3
        out(o) = ((c >>> 16) & 0xFF).toByte
        out(o + 1) = ((c >>> 8) & 0xFF).toByte
        out(o + 2) = (c & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    le16(out, bitsOff, 8); le16(out, bitsOff + 2, 8); le16(out, bitsOff + 4, 8)
    le16(out, ifdOff, nEntries)
    var e = ifdOff + 2
    def entry(tag: Int, typ: Int, count: Int, value: Int): Unit = {
      le16(out, e, tag); le16(out, e + 2, typ); le32(out, e + 4, count)
      if (typ == 3 && count == 1) le16(out, e + 8, value) // SHORT inline
      else le32(out, e + 8, value)
      e += 12
    }
    entry(256, 4, 1, w)        // ImageWidth LONG
    entry(257, 4, 1, h)        // ImageLength LONG
    entry(258, 3, 3, bitsOff)  // BitsPerSample: 3 SHORTs out-of-line
    entry(259, 3, 1, 1)        // Compression: none
    entry(262, 3, 1, 2)        // Photometric: RGB
    entry(273, 4, 1, pixOff)   // StripOffsets
    entry(277, 3, 1, 3)        // SamplesPerPixel
    entry(278, 4, 1, h)        // RowsPerStrip: one strip
    entry(279, 4, 1, nPix)     // StripByteCounts
    le32(out, e, 0)            // no next IFD
    out
  }

  /** Walk the IFD and return (w, h, spp, pixel strip offset). Every read
    * bounds-checked: truncation raises IllegalArgumentException. */
  private def tiffDecode(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    require(bytes.length >= 8 && bytes(0) == 'I' && bytes(1) == 'I' &&
      rdLe16(bytes, 2) == 42, "not a little-endian TIFF file")
    val ifdOff = rdLe32(bytes, 4)
    require(ifdOff >= 8 && ifdOff + 2 <= bytes.length, "truncated IFD offset")
    val n = rdLe16(bytes, ifdOff)
    require(ifdOff + 2 + n * 12 + 4 <= bytes.length, "truncated IFD")
    var tags = Map.empty[Int, (Int, Int, Int)] // tag → (type, count, raw value)
    var i = 0
    while (i < n) {
      val e = ifdOff + 2 + i * 12
      val tag = rdLe16(bytes, e); val typ = rdLe16(bytes, e + 2)
      val count = rdLe32(bytes, e + 4)
      val v = if (typ == 3 && count == 1) rdLe16(bytes, e + 8)
              else rdLe32(bytes, e + 8)
      tags += tag -> (typ, count, v)
      i += 1
    }
    def req(tag: Int, what: String): (Int, Int, Int) =
      tags.getOrElse(tag, throw new IllegalArgumentException(s"missing $what tag"))
    val w = req(256, "ImageWidth")._3; val h = req(257, "ImageLength")._3
    require(w > 0 && h > 0 && w.toLong * h * 3 < Int.MaxValue,
      s"unsupported dimensions ${w}x$h")
    require(req(259, "Compression")._3 == 1, "only uncompressed TIFF supported")
    require(req(262, "Photometric")._3 == 2, "only RGB TIFF supported")
    val spp = req(277, "SamplesPerPixel")._3
    require(spp == 3, "only 3 samples per pixel supported")
    val (bTyp, bCount, bOff) = req(258, "BitsPerSample")
    require(bTyp == 3 && bCount == 3 && bOff + 6 <= bytes.length,
      "unsupported BitsPerSample layout")
    require((0 until 3).forall(j => rdLe16(bytes, bOff + 2 * j) == 8),
      "only 8-bit samples supported")
    val strip = req(273, "StripOffsets")._3
    val nBytes = req(279, "StripByteCounts")._3
    require(nBytes == w * h * 3 && strip >= 0 &&
      strip.toLong + nBytes <= bytes.length, "truncated pixel strip")
    (w, h, spp, strip)
  }

  /** Parse + per-channel means from the pixel strip. */
  def parseTiff(bytes: Array[Byte]): TiffInfo = {
    val (w, h, spp, strip) = tiffDecode(bytes)
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    val n = w * h
    while (i < n) {
      sr += bytes(strip + i * 3) & 0xFF
      sg += bytes(strip + i * 3 + 1) & 0xFF
      sb += bytes(strip + i * 3 + 2) & 0xFF
      i += 1
    }
    TiffInfo(w, h, spp, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** Nearest-neighbor grayscale thumbnail straight off the strip. */
  def tiffResizeGray(bytes: Array[Byte], ow: Int, oh: Int): Array[Float] = {
    val (w, h, _, strip) = tiffDecode(bytes)
    val out = new Array[Float](ow * oh)
    var oy = 0
    while (oy < oh) {
      val sy = math.min(h - 1, oy * h / oh)
      var ox = 0
      while (ox < ow) {
        val sx = math.min(w - 1, ox * w / ow)
        val o = strip + (sy * w + sx) * 3
        out(oy * ow + ox) = ((bytes(o) & 0xFF) + (bytes(o + 1) & 0xFF) +
          (bytes(o + 2) & 0xFF)) / 3.0f / 255.0f
        ox += 1
      }
      oy += 1
    }
    out
  }

  // ====================================================================
  // Baseline JPEG (SOF0) — the eighth pure-JVM format, and the last image
  // modality that usually hides behind a native library. Real byte-level
  // machinery on BOTH sides: the encoder writes JFIF/DQT/SOF0/DHT/SOS
  // segments, canonical Huffman DC categories, byte-stuffed entropy data;
  // the decoder walks markers, rebuilds canonical Huffman tables from the
  // DHT payload, entropy-decodes DC diffs + run-length AC, dezigzags,
  // dequantizes, runs a REAL 2-D IDCT, and converts YCbCr→RGB in exact
  // integer fixed point. Exactness contract (the G.711 "decoded content"
  // oracle discipline): the synthesizer emits blockwise-constant images
  // (DC-only coefficients, q₀₀ = 8), where the IDCT's float path is
  // integral up to ~1e-13 — absorbed by rounding — so decoded pixels are
  // bit-exact in any conforming engine and the oracle PREDICTS them
  // analytically. Limits (disclosed): 8-bit precision, 4:4:4 (all
  // sampling factors 1×1), no DRI/progressive/arithmetic coding.
  // Reference for structure: ITU-T T.81 (public standard).
  // ====================================================================

  final case class JpegInfo(width: Int, height: Int, nComponents: Int,
                            meanR: Double, meanG: Double, meanB: Double)

  /** Natural-order index visited at each zigzag position (T.81 Figure 5). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K luminance DC table: category codes 0..11. */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(i => i)
  /** Minimal AC table: the single EOB symbol (the encoder never writes
    * AC coefficients — blocks are DC-only by construction). A one-entry
    * canonical table is a perfectly legal DHT. */
  private val AcBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcVals = Array(0x00)

  /** value → (code, length) for a canonical (BITS, HUFFVAL) table. */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        out += vals(k) -> (code, len); code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    out.result()
  }

  private final class JpegBitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >> i) & 1); n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit = while (n != 0) put(1, 1)
  }

  /** Encode a baseline JFIF JPEG whose 8×8 blocks are each CONSTANT:
    * `blockYCbCr(bx, by)` returns the (Y, Cb, Cr) triple of block
    * (bx, by), each in 0..255. `gray = true` emits a 1-component frame
    * (Cb/Cr ignored). Dimensions need not be block-aligned — edge blocks
    * are simply cropped by the decoder, exactly as the standard says. */
  def jpegBytes(w: Int, h: Int, blockYCbCr: (Int, Int) => (Int, Int, Int),
                gray: Boolean = false): Array[Byte] = {
    require(w >= 1 && w <= 0xFFFF && h >= 1 && h <= 0xFFFF, "bad jpeg dims")
    val out = new java.io.ByteArrayOutputStream()
    def m(marker: Int): Unit = { out.write(0xFF); out.write(marker) }
    def be16(v: Int): Unit = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF) }
    m(0xD8) // SOI
    m(0xE0); be16(16) // APP0 JFIF
    out.write("JFIF".getBytes("US-ASCII")); out.write(0)
    out.write(1); out.write(1); out.write(0); be16(1); be16(1)
    out.write(0); out.write(0)
    val nComp = if (gray) 1 else 3
    // DQT: q₀₀ = 8 (the exactness pivot: dequantized DC = 8·(v−128) and
    // the IDCT divides by 8), the other 63 entries 16 — never used, the
    // encoder emits no AC
    def dqt(tq: Int): Unit = {
      m(0xDB); be16(2 + 65); out.write(tq)
      out.write(8); (1 until 64).foreach(_ => out.write(16))
    }
    dqt(0); if (!gray) dqt(1)
    m(0xC0); be16(2 + 6 + 3 * nComp) // SOF0
    out.write(8); be16(h); be16(w); out.write(nComp)
    for (ci <- 0 until nComp) {
      out.write(ci + 1); out.write(0x11); out.write(if (ci == 0) 0 else 1)
    }
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      m(0xC4); be16(2 + 1 + 16 + vals.length)
      out.write((tc << 4) | th); bits.foreach(out.write); vals.foreach(out.write)
    }
    dht(0, 0, DcBits, DcVals); dht(1, 0, AcBits, AcVals)
    m(0xDA); be16(2 + 1 + 2 * nComp + 3) // SOS
    out.write(nComp)
    for (ci <- 0 until nComp) { out.write(ci + 1); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    val dcCodes = canonicalCodes(DcBits, DcVals)
    val acCodes = canonicalCodes(AcBits, AcVals)
    val bw = new JpegBitWriter(out)
    val mx = (w + 7) / 8; val my = (h + 7) / 8
    val pred = new Array[Int](nComp)
    var by = 0
    while (by < my) {
      var bx = 0
      while (bx < mx) {
        val (y, cb, cr) = blockYCbCr(bx, by)
        val comps = if (gray) Seq(y) else Seq(y, cb, cr)
        for (ci <- comps.indices) {
          val dc = comps(ci) - 128 // with q₀₀=8 the DC coefficient IS v−128
          val diff = dc - pred(ci); pred(ci) = dc
          val cat = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
          val (code, len) = dcCodes(cat)
          bw.put(code, len)
          if (cat > 0)
            bw.put(if (diff >= 0) diff else diff + (1 << cat) - 1, cat)
          val (eob, eobLen) = acCodes(0x00)
          bw.put(eob, eobLen)
        }
        bx += 1
      }
      by += 1
    }
    bw.flushWithOnes()
    m(0xD9) // EOI
    out.toByteArray
  }

  private final class JpegBitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0; private var n = 0
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length)
          throw new IllegalArgumentException("jpeg: truncated entropy stream")
        val v = b(pos) & 0xFF; pos += 1
        if (v == 0xFF) {
          if (pos >= b.length)
            throw new IllegalArgumentException("jpeg: truncated after 0xFF")
          val mk = b(pos) & 0xFF
          if (mk == 0x00) pos += 1 // stuffed byte
          else throw new IllegalArgumentException(
            f"jpeg: unexpected marker 0xFF$mk%02X inside entropy data " +
              "(restart intervals are not supported)")
        }
        acc = v; n = 8
      }
      n -= 1; (acc >> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0; var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
  }

  /** length-indexed canonical decode tables: (firstCode, firstIndex) per
    * bit length, plus the value list. */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    private val codes = canonicalCodes(bits, vals) // value → (code, len)
    private val byLen: Map[Int, Map[Int, Int]] = // len → code → value
      codes.toSeq.groupBy(_._2._2).map { case (len, s) =>
        len -> s.map { case (v, (c, _)) => c -> v }.toMap
      }
    def decode(br: JpegBitReader): Int = {
      var code = 0
      var len = 0
      while (len < 16) {
        code = (code << 1) | br.bit(); len += 1
        byLen.get(len).flatMap(_.get(code)) match {
          case Some(v) => return v
          case None    =>
        }
      }
      throw new IllegalArgumentException("jpeg: invalid Huffman code")
    }
  }

  private def jpegExtend(v: Int, cat: Int): Int =
    if (cat == 0) 0
    else if (v < (1 << (cat - 1))) v - (1 << cat) + 1
    else v

  private val IdctCos: Array[Double] =
    Array.tabulate(64)(i => math.cos((2 * (i / 8) + 1) * (i % 8) * math.Pi / 16))
  private val InvSqrt2 = 1.0 / math.sqrt(2.0)

  /** Direct 2-D IDCT (T.81 A.3.3) + level shift + clamp. Real float
    * implementation — DC-only blocks land within ~1e-13 of the integer
    * answer, absorbed by the rounding, which is what makes the corpus
    * oracle exact. */
  private[operators] def jpegIdct(coef: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val f = coef(v * 8 + u)
            if (f != 0) {
              val cu = if (u == 0) InvSqrt2 else 1.0
              val cv = if (v == 0) InvSqrt2 else 1.0
              s += cu * cv * f * IdctCos(x * 8 + u) * IdctCos(y * 8 + v)
            }
            v += 1
          }
          u += 1
        }
        val px = math.floor(s / 4.0 + 128.0 + 0.5).toInt
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
    out
  }

  /** Exact integer YCbCr→RGB (JFIF constants in 16.16 fixed point; >> is
    * an arithmetic shift = floor division, which the oracle mirrors with
    * floor(x / 65536)). */
  private def ycc2rgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def clamp(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    val r = clamp(y + ((91881 * (cr - 128)) >> 16))
    val g = clamp(y - ((22554 * (cb - 128) + 46802 * (cr - 128)) >> 16))
    val b = clamp(y + ((116130 * (cb - 128)) >> 16))
    (r, g, b)
  }

  /** Full baseline decode → (w, h, nComp, per-pixel packed RGB). */
  private def jpegDecode(bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
    require(bytes.length >= 4 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8, "not a JPEG (missing SOI)")
    var pos = 2
    def u8(i: Int): Int = {
      if (i >= bytes.length) throw new IllegalArgumentException("jpeg: truncated")
      bytes(i) & 0xFF
    }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    val quant = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var w = 0; var h = 0; var nComp = 0
    var compTq: Array[Int] = null
    var compIds: Array[Int] = null
    var sosOrder: Array[Int] = null // component indices in scan order
    var compTd: Array[Int] = null; var compTa: Array[Int] = null
    var scanStart = -1
    while (scanStart < 0) {
      if (u8(pos) != 0xFF)
        throw new IllegalArgumentException("jpeg: expected marker")
      // r9 (ADVICE): legal FILL BYTES — any run of extra 0xFF before the
      // marker id (B.1.1.2) — must be skipped, and the standalone markers
      // TEM (0x01) / RST0–7 (0xD0–D7) carry NO length segment: treating
      // either as length-bearing misparses conforming foreign baseline
      // files (the in-repo encoder emits neither)
      var mpos = pos + 1
      while (u8(mpos) == 0xFF) mpos += 1
      val marker = u8(mpos); pos = mpos + 1
      if (marker == 0x00)
        throw new IllegalArgumentException(
          "jpeg: 0xFF00 in the marker stream (stuffing outside entropy data)")
      if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) {
        // standalone: nothing to skip
      } else {
      // every marker handled below carries a 2-byte length; a corrupt
      // length < 2 would stall the walk forever
      if (marker != 0xD9)
        require(u16(pos) >= 2, "jpeg: bad segment length")
      marker match {
        case 0xD9 => throw new IllegalArgumentException("jpeg: EOI before SOS")
        case 0xDB => // DQT (possibly several tables per segment)
          val len = u16(pos); val end = pos + len
          var p = pos + 2
          while (p < end) {
            val pq = u8(p) >> 4; val tq = u8(p) & 0x0F
            require(pq == 0, "jpeg: only 8-bit quantization tables supported")
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(Zigzag(i)) = u8(p + 1 + i); i += 1 }
            quant(tq) = t; p += 65
          }
          pos = end
        case 0xC4 => // DHT (possibly several tables per segment)
          val len = u16(pos); val end = pos + len
          var p = pos + 2
          while (p < end) {
            val tc = u8(p) >> 4; val th = u8(p) & 0x0F
            val bits = Array.tabulate(16)(i => u8(p + 1 + i))
            val nv = bits.sum
            val vals = Array.tabulate(nv)(i => u8(p + 17 + i))
            val table = new HuffTable(bits, vals)
            if (tc == 0) dcTables(th) = table else acTables(th) = table
            p += 17 + nv
          }
          pos = end
        case 0xC0 => // SOF0 baseline
          val len = u16(pos)
          require(u8(pos + 2) == 8, "jpeg: only 8-bit precision supported")
          h = u16(pos + 3); w = u16(pos + 5); nComp = u8(pos + 7)
          require(nComp == 1 || nComp == 3, s"jpeg: $nComp components unsupported")
          compTq = new Array[Int](nComp)
          compIds = new Array[Int](nComp)
          for (ci <- 0 until nComp) {
            compIds(ci) = u8(pos + 8 + 3 * ci)
            val sampling = u8(pos + 9 + 3 * ci)
            require(sampling == 0x11,
              "jpeg: only 4:4:4 (1x1 sampling) supported")
            compTq(ci) = u8(pos + 10 + 3 * ci)
          }
          pos += len
        case 0xC1 | 0xC2 | 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
             0xCD | 0xCE | 0xCF =>
          throw new IllegalArgumentException(
            f"jpeg: SOF marker 0xFF$marker%02X — only baseline SOF0 supported")
        case 0xDD =>
          throw new IllegalArgumentException("jpeg: DRI/restart not supported")
        case 0xDA => // SOS
          require(compIds != null, "jpeg: SOS before SOF0")
          val ns = u8(pos + 2)
          require(ns == nComp, "jpeg: partial scans not supported")
          sosOrder = new Array[Int](ns)
          compTd = new Array[Int](ns); compTa = new Array[Int](ns)
          for (i <- 0 until ns) {
            val cid = u8(pos + 3 + 2 * i)
            sosOrder(i) = compIds.indexOf(cid)
            require(sosOrder(i) >= 0, s"jpeg: scan component $cid not in frame")
            compTd(i) = u8(pos + 4 + 2 * i) >> 4
            compTa(i) = u8(pos + 4 + 2 * i) & 0x0F
          }
          scanStart = pos + u16(pos)
        case _ => // APPn / COM / others: length-skip
          pos += u16(pos)
      }
      }
    }
    require(w > 0 && h > 0, "jpeg: SOS before SOF0")
    val br = new JpegBitReader(bytes, scanStart)
    val mx = (w + 7) / 8; val my = (h + 7) / 8
    val planes = Array.fill(nComp)(new Array[Int](mx * 8 * my * 8))
    val pred = new Array[Int](nComp)
    var by = 0
    while (by < my) {
      var bx = 0
      while (bx < mx) {
        var si = 0
        while (si < nComp) {
          val ci = sosOrder(si)
          val dcT = dcTables(compTd(si)); val acT = acTables(compTa(si))
          require(dcT != null && acT != null, "jpeg: scan references missing DHT")
          val q = quant(compTq(ci))
          require(q != null, "jpeg: frame references missing DQT")
          val coef = new Array[Int](64)
          val cat = dcT.decode(br)
          require(cat <= 15, "jpeg: bad DC category")
          pred(ci) += jpegExtend(br.receive(cat), cat)
          coef(0) = pred(ci) * q(0)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val rs = acT.decode(br)
            if (rs == 0x00) eob = true
            else if (rs == 0xF0) k += 16 // ZRL
            else {
              k += rs >> 4
              val s = rs & 0x0F
              require(k < 64, "jpeg: AC run past block end")
              coef(Zigzag(k)) = jpegExtend(br.receive(s), s) * q(Zigzag(k))
              k += 1
            }
          }
          val px = jpegIdct(coef)
          val plane = planes(ci)
          var yy = 0
          while (yy < 8) {
            var xx = 0
            while (xx < 8) {
              plane((by * 8 + yy) * mx * 8 + bx * 8 + xx) = px(yy * 8 + xx)
              xx += 1
            }
            yy += 1
          }
          si += 1
        }
        bx += 1
      }
      by += 1
    }
    // trailing bits flushed; the next marker must be EOI
    val rgb = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * mx * 8 + x
        val (r, g, b) =
          if (nComp == 1) { val v = planes(0)(i); (v, v, v) }
          else ycc2rgb(planes(0)(i), planes(1)(i), planes(2)(i))
        rgb(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    (w, h, nComp, rgb)
  }

  def parseJpeg(bytes: Array[Byte]): JpegInfo = {
    val (w, h, nComp, rgb) = jpegDecode(bytes)
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < rgb.length) {
      sr += (rgb(i) >>> 16) & 0xFF; sg += (rgb(i) >>> 8) & 0xFF
      sb += rgb(i) & 0xFF
      i += 1
    }
    val n = rgb.length.toDouble
    JpegInfo(w, h, nComp, sr / n, sg / n, sb / n)
  }

  /** Nearest-neighbor grayscale thumbnail from the decoded pixels. */
  def jpegResizeGray(bytes: Array[Byte], ow: Int, oh: Int): Array[Float] = {
    val (w, h, _, rgb) = jpegDecode(bytes)
    val out = new Array[Float](ow * oh)
    var oy = 0
    while (oy < oh) {
      val sy = math.min(h - 1, oy * h / oh)
      var ox = 0
      while (ox < ow) {
        val sx = math.min(w - 1, ox * w / ow)
        val c = rgb(sy * w + sx)
        out(oy * ow + ox) = (((c >>> 16) & 0xFF) + ((c >>> 8) & 0xFF) +
          (c & 0xFF)) / 3.0f / 255.0f
        ox += 1
      }
      oy += 1
    }
    out
  }

  // ---- FLAC (r9): lossless Rice-coded audio — the ninth real format ----
  //
  // The one remaining pure-JVM-achievable audio codec. FLAC is LOSSLESS,
  // so — like G.711 but unlike JPEG — the decode must recover the PCM
  // samples bit-exactly, and the corpus oracle can predict the decoded
  // CONTENT (mean |pcm|, peak) from the synthesis formula alone. The
  // encoder emits the real coding machinery (UTF-8 frame numbers, CRC-8
  // frame headers, CRC-16 frame footers, CONSTANT and FIXED-predictor
  // subframes with zigzag Rice-coded residuals incl. the 5-bit raw
  // escape); the decoder additionally handles VERBATIM and LPC subframes,
  // all fixed orders 0-4, any Rice partition order, and wasted bits —
  // the full mono/independent-channel subset of the format.

  final case class FlacInfo(sampleRate: Int, channels: Int,
                            bitsPerSample: Int, nSamples: Int,
                            meanAbs: Double, peak: Int)

  /** CRC-8, poly 0x07, init 0 — the FLAC frame-header checksum. */
  private def flacCrc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0; var i = from
    while (i < until) {
      crc ^= b(i) & 0xFF
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xFF
              else (crc << 1) & 0xFF
        k += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, poly 0x8005, init 0 — the FLAC whole-frame checksum. */
  private def flacCrc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0; var i = from
    while (i < until) {
      crc ^= (b(i) & 0xFF) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xFFFF
              else (crc << 1) & 0xFFFF
        k += 1
      }
      i += 1
    }
    crc
  }

  private final class FlacBitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def put(v: Long, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >>> i) & 1L).toInt; n += 1
        if (n == 8) { out.write(acc); acc = 0; n = 0 }
        i -= 1
      }
    }
    /** q zero bits then a one — FLAC unary. */
    def unary(q: Int): Unit = { var i = 0; while (i < q) { put(0, 1); i += 1 }; put(1, 1) }
    def align(): Unit = while (n != 0) put(0, 1)
  }

  private final class FlacBitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0; private var n = 0
    def aligned: Boolean = n == 0
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length)
          throw new IllegalArgumentException("flac: truncated bitstream")
        acc = b(pos) & 0xFF; pos += 1; n = 8
      }
      n -= 1; (acc >> n) & 1
    }
    def bits(len: Int): Long = {
      var v = 0L; var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def sbits(len: Int): Int = { // signed two's-complement
      val v = bits(len)
      if (len > 0 && (v & (1L << (len - 1))) != 0) (v - (1L << len)).toInt
      else v.toInt
    }
    def unary(): Int = {
      var q = 0
      while (bit() == 0) {
        q += 1
        if (q > (1 << 24)) throw new IllegalArgumentException(
          "flac: runaway unary code")
      }
      q
    }
    def align(): Unit = { n = 0 }
  }

  /** UTF-8-style coded number (the frame-number coding, RFC-2279 pattern
    * extended to 36 bits). */
  private def flacUtf8(w: FlacBitWriter, v: Long): Unit = {
    require(v >= 0, "frame number must be non-negative")
    if (v < 0x80) w.put(v, 8)
    else {
      // with c continuation bytes the lead byte holds 6 − c value bits,
      // total capacity 6c + (6 − c) = 5c + 6 bits
      var cont = 1
      while (cont < 6 && v >= (1L << (5 * cont + 6))) cont += 1
      val leadBits = 6 - cont
      w.put((0xFF << (leadBits + 1)) & 0xFF | (v >>> (6 * cont)).toInt, 8)
      var i = cont - 1
      while (i >= 0) { w.put(0x80 | ((v >>> (6 * i)) & 0x3F).toInt, 8); i -= 1 }
    }
  }

  private def flacReadUtf8(r: FlacBitReader): Long = {
    val lead = r.bits(8).toInt
    if ((lead & 0x80) == 0) lead.toLong
    else {
      var cont = 0; var mask = 0x40
      while ((lead & mask) != 0) { cont += 1; mask >>= 1 }
      require(cont >= 1 && cont <= 6, s"flac: bad utf8 lead byte $lead")
      var v = (lead & (mask - 1)).toLong
      var i = 0
      while (i < cont) {
        val c = r.bits(8).toInt
        require((c & 0xC0) == 0x80, s"flac: bad utf8 continuation $c")
        v = (v << 6) | (c & 0x3F)
        i += 1
      }
      v
    }
  }

  /** Residuals for fixed predictor order `o` (0-4, the FLAC polynomial
    * family) over `s`, starting at index `o`. */
  private def fixedResiduals(s: Array[Int], o: Int): Array[Long] = {
    val out = new Array[Long](s.length - o)
    var i = o
    while (i < s.length) {
      out(i - o) = o match {
        case 0 => s(i).toLong
        case 1 => s(i).toLong - s(i - 1)
        case 2 => s(i).toLong - 2L * s(i - 1) + s(i - 2)
        case 3 => s(i).toLong - 3L * s(i - 1) + 3L * s(i - 2) - s(i - 3)
        case _ => s(i).toLong - 4L * s(i - 1) + 6L * s(i - 2) -
          4L * s(i - 3) + s(i - 4)
      }
      i += 1
    }
    out
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Encode mono PCM as a real FLAC stream: fLaC magic + STREAMINFO, then
    * fixed-blocksize frames. Per block the cheapest of CONSTANT /
    * FIXED(0..2) by exact bit cost; residuals zigzag-Rice-coded in one
    * partition (partition order 0) with the parameter chosen by exact
    * cost, escaping to raw n-bit storage when Rice loses. */
  def flacBytes(samples: Array[Int], sampleRate: Int,
                blockSize: Int = 1024, bits: Int = 16): Array[Byte] = {
    require(bits == 16, "encoder emits 16-bit streams")
    require(blockSize >= 16, "flac minimum block size is 16")
    samples.foreach(s => require(s >= -32768 && s <= 32767,
      s"sample $s out of 16-bit range"))
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO: last-metadata flag + type 0, 24-bit length 34
    val si = new FlacBitWriter(out)
    si.put(1, 1); si.put(0, 7); si.put(34, 24)
    si.put(blockSize, 16); si.put(blockSize, 16) // min/max blocksize
    si.put(0, 24); si.put(0, 24) // min/max framesize unknown
    si.put(sampleRate, 20)
    si.put(0, 3) // channels - 1 (mono)
    si.put(bits - 1, 5)
    si.put(samples.length.toLong, 36)
    si.put(0L, 64); si.put(0L, 64) // MD5 unset (16 zero bytes)

    var frameNo = 0L
    var off = 0
    while (off < samples.length || (samples.isEmpty && frameNo == 0L)) {
      val n = math.min(blockSize, samples.length - off)
      if (n > 0) {
        val block = java.util.Arrays.copyOfRange(samples, off, off + n)
        val frame = new java.io.ByteArrayOutputStream()
        val w = new FlacBitWriter(frame)
        w.put(0x3FFE, 14) // sync
        w.put(0, 1) // reserved
        w.put(0, 1) // fixed-blocksize stream
        w.put(7, 4) // blocksize: 16-bit value - 1 at header end
        w.put(0, 4) // sample rate: from STREAMINFO
        w.put(0, 4) // channel assignment: mono
        w.put(4, 3) // sample size: 16 bits
        w.put(0, 1) // reserved
        flacUtf8(w, frameNo)
        w.put(n - 1L, 16)
        w.align()
        val headerBytes = frame.toByteArray
        w.put(flacCrc8(headerBytes, 0, headerBytes.length), 8)

        // choose the subframe: CONSTANT if the block is flat, else the
        // fixed order 0..2 with the smallest exact residual bit cost
        val allEqual = block.forall(_ == block(0))
        if (allEqual) {
          w.put(0, 1); w.put(0, 6); w.put(0, 1) // CONSTANT, no wasted bits
          w.put(block(0).toLong & 0xFFFFL, 16)
        } else {
          def riceCost(res: Array[Long]): (Int, Long) = { // (param, bits)
            var bestP = 0; var bestBits = Long.MaxValue
            var p = 0
            while (p <= 14) {
              var total = 0L; var i = 0
              while (i < res.length) {
                total += (zigzag(res(i)) >>> p) + 1 + p; i += 1
              }
              if (total < bestBits) { bestBits = total; bestP = p }
              p += 1
            }
            (bestP, bestBits)
          }
          def rawBitsNeeded(res: Array[Long]): Int = {
            var m = 1L // at least 1 bit
            res.foreach { r => val u = if (r < 0) -(r + 1) else r
              var b = 1; while (u >= (1L << (b - 1)) && b < 32) b += 1
              if (b > m) m = b }
            m.toInt
          }
          val costs = (0 to 2).map { o =>
            val res = fixedResiduals(block, o)
            val (p, rb) = riceCost(res)
            val raw = rawBitsNeeded(res)
            val rawB = res.length.toLong * raw
            val useEsc = rawB < rb
            (o, res, p, useEsc, raw, 16L * o + math.min(rb, rawB))
          }
          val (o, res, p, useEsc, raw, _) = costs.minBy(_._6)
          w.put(0, 1); w.put(8 + o, 6); w.put(0, 1) // FIXED(o), no wasted
          var i = 0
          while (i < o) { w.put(block(i).toLong & 0xFFFFL, 16); i += 1 }
          w.put(0, 2) // residual method: 4-bit Rice
          w.put(0, 4) // partition order 0
          if (useEsc) {
            w.put(0xF, 4); w.put(raw, 5)
            res.foreach(r => w.put(r & ((1L << raw) - 1), raw))
          } else {
            w.put(p, 4)
            res.foreach { r =>
              val u = zigzag(r)
              w.unary((u >>> p).toInt)
              w.put(u & ((1L << p) - 1), p)
            }
          }
        }
        w.align()
        val body = frame.toByteArray
        w.put(flacCrc16(body, 0, body.length), 16)
        frame.writeTo(out)
      }
      off += math.max(n, 1)
      frameNo += 1
      if (n <= 0) off = samples.length + 1 // defensive: exit on empty tail
    }
    out.toByteArray
  }

  private val FlacBlockSizes =
    Array(-1, 192, 576, 1152, 2304, 4608, -6, -7, 256, 512, 1024, 2048,
      4096, 8192, 16384, 32768)
  private val FlacSampleRates =
    Array(-1, 88200, 176400, 192000, 8000, 16000, 22050, 24000, 32000,
      44100, 48000, 96000, -12, -13, -14, 0)
  private val FlacSampleSizes = Array(-1, 8, 12, 0, 16, 20, 24, 32)

  /** Decode a FLAC stream (mono; CONSTANT, VERBATIM, FIXED 0-4 and LPC
    * subframes; any Rice partition order; wasted bits; both CRCs
    * verified) and fold the content features. */
  def parseFlac(bytes: Array[Byte]): FlacInfo = {
    val (sampleRate, channels, bits, s) = flacDecode(bytes)
    var sumAbs = 0L; var peak = 0; var i = 0
    while (i < s.length) {
      val a = math.abs(s(i)); sumAbs += a; if (a > peak) peak = a
      i += 1
    }
    FlacInfo(sampleRate, channels, bits, s.length,
      if (s.isEmpty) 0.0 else sumAbs.toDouble / s.length, peak)
  }

  /** Full decode returning the PCM samples — FLAC is lossless, so these
    * must equal the encoder's input bit-for-bit (spec-pinned). */
  private[operators] def flacDecode(
      bytes: Array[Byte]): (Int, Int, Int, Array[Int]) = {
    require(bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
      bytes(2) == 'a' && bytes(3) == 'C', "not a FLAC stream")
    var pos = 4
    // metadata block walk
    var last = false
    var sampleRate = -1; var channels = -1; var bits = -1
    var totalSamples = -1L
    while (!last) {
      require(pos + 4 <= bytes.length, "flac: truncated metadata header")
      val h = bytes(pos) & 0xFF
      last = (h & 0x80) != 0
      val typ = h & 0x7F
      val len = ((bytes(pos + 1) & 0xFF) << 16) |
        ((bytes(pos + 2) & 0xFF) << 8) | (bytes(pos + 3) & 0xFF)
      pos += 4
      require(pos + len <= bytes.length, "flac: truncated metadata block")
      if (typ == 0) {
        require(len == 34, s"flac: STREAMINFO must be 34 bytes, got $len")
        val r = new FlacBitReader(bytes, pos)
        r.bits(16); r.bits(16); r.bits(24); r.bits(24)
        sampleRate = r.bits(20).toInt
        channels = r.bits(3).toInt + 1
        bits = r.bits(5).toInt + 1
        totalSamples = r.bits(36)
      }
      pos += len
    }
    require(sampleRate > 0, "flac: missing STREAMINFO")
    require(channels == 1, s"flac: only mono decode supported, " +
      s"got $channels channels")

    val outBuf = new scala.collection.mutable.ArrayBuffer[Int](
      if (totalSamples >= 0 && totalSamples <= Int.MaxValue)
        totalSamples.toInt else 16)
    while (pos < bytes.length) {
      val frameStart = pos
      val r = new FlacBitReader(bytes, pos)
      require(r.bits(14) == 0x3FFE, "flac: lost frame sync")
      r.bits(1) // reserved
      r.bits(1) // blocking strategy
      val bsCode = r.bits(4).toInt
      val srCode = r.bits(4).toInt
      val chanAsg = r.bits(4).toInt
      val ssCode = r.bits(3).toInt
      r.bits(1) // reserved
      require(chanAsg < 8, "flac: stereo decorrelation modes unsupported")
      require(chanAsg + 1 == channels, "flac: channel count mismatch")
      flacReadUtf8(r)
      val blockSize = bsCode match {
        case 0 => throw new IllegalArgumentException("flac: reserved blocksize")
        case 6 => r.bits(8).toInt + 1
        case 7 => r.bits(16).toInt + 1
        case c => FlacBlockSizes(c)
      }
      srCode match { // trailing sample-rate forms, value unused (STREAMINFO)
        case 12 => r.bits(8)
        case 13 | 14 => r.bits(16)
        case 15 => throw new IllegalArgumentException("flac: invalid sr code")
        case _ => ()
      }
      val sampleBits = if (ssCode == 0) bits else FlacSampleSizes(ssCode)
      require(sampleBits > 0, "flac: reserved sample size code")
      r.align() // header is byte-aligned before the CRC by construction
      val headerEnd = r.pos
      val crc8 = r.bits(8).toInt
      require(crc8 == flacCrc8(bytes, frameStart, headerEnd),
        "flac: frame header CRC-8 mismatch")

      // one subframe per channel (mono: one)
      val s = new Array[Int](blockSize)
      require(r.bits(1) == 0, "flac: subframe padding bit must be 0")
      val sfType = r.bits(6).toInt
      val wasted =
        if (r.bits(1) == 1) { var k = 1; while (r.bit() == 0) k += 1; k }
        else 0
      val effBits = sampleBits - wasted
      if (sfType == 0) { // CONSTANT
        val v = r.sbits(effBits)
        java.util.Arrays.fill(s, v)
      } else if (sfType == 1) { // VERBATIM
        var i = 0
        while (i < blockSize) { s(i) = r.sbits(effBits); i += 1 }
      } else if (sfType >= 8 && sfType <= 12) { // FIXED order 0-4
        val o = sfType - 8
        var i = 0
        while (i < o) { s(i) = r.sbits(effBits); i += 1 }
        val res = flacReadResiduals(r, blockSize, o)
        i = o
        while (i < blockSize) {
          val pred = o match {
            case 0 => 0L
            case 1 => s(i - 1).toLong
            case 2 => 2L * s(i - 1) - s(i - 2)
            case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
            case _ => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) -
              s(i - 4)
          }
          s(i) = (pred + res(i - o)).toInt
          i += 1
        }
      } else if (sfType >= 32) { // LPC, order (type & 31) + 1
        val o = (sfType & 31) + 1
        var i = 0
        while (i < o) { s(i) = r.sbits(effBits); i += 1 }
        val precision = r.bits(4).toInt + 1
        require(precision <= 15, "flac: invalid LPC precision")
        val shift = r.sbits(5)
        require(shift >= 0, "flac: negative LPC shift")
        val coefs = Array.fill(o)(r.sbits(precision))
        val res = flacReadResiduals(r, blockSize, o)
        i = o
        while (i < blockSize) {
          var acc = 0L; var j = 0
          while (j < o) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
          s(i) = ((acc >> shift) + res(i - o)).toInt
          i += 1
        }
      } else throw new IllegalArgumentException(
        s"flac: reserved subframe type $sfType")
      if (wasted > 0) { var i = 0; while (i < blockSize) { s(i) <<= wasted; i += 1 } }

      r.align()
      val bodyEnd = r.pos
      val crc16 = r.bits(16).toInt
      require(crc16 == flacCrc16(bytes, frameStart, bodyEnd),
        "flac: frame CRC-16 mismatch")
      pos = r.pos
      outBuf ++= s
    }
    require(totalSamples < 0 || outBuf.length == totalSamples,
      s"flac: STREAMINFO promises $totalSamples samples, " +
        s"decoded ${outBuf.length}")
    (sampleRate, channels, bits, outBuf.toArray)
  }

  /** Rice-coded residual section: 2-bit method, 4-bit partition order,
    * 2^order partitions with per-partition parameter (5-bit escape to raw
    * storage). Returns blockSize − predictorOrder residuals. */
  private def flacReadResiduals(r: FlacBitReader, blockSize: Int,
                                predOrder: Int): Array[Long] = {
    val method = r.bits(2).toInt
    require(method <= 1, s"flac: reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 0xF else 0x1F
    val partOrder = r.bits(4).toInt
    val nParts = 1 << partOrder
    require(blockSize % nParts == 0,
      "flac: block size not divisible by partition count")
    require((blockSize >> partOrder) >= predOrder,
      "flac: first partition smaller than the predictor order")
    val out = new Array[Long](blockSize - predOrder)
    var idx = 0
    var part = 0
    while (part < nParts) {
      val count = (blockSize >> partOrder) -
        (if (part == 0) predOrder else 0)
      val p = r.bits(pBits).toInt
      if (p == escape) {
        val raw = r.bits(5).toInt
        var i = 0
        while (i < count) {
          out(idx) = if (raw == 0) 0L else r.sbits(raw).toLong
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary().toLong
          val u = (q << p) | r.bits(p)
          out(idx) = (u >>> 1) ^ -(u & 1L) // un-zigzag
          idx += 1; i += 1
        }
      }
      part += 1
    }
    out
  }

  /** Nearest-neighbor grayscale thumbnail from the decoded indices. */
  def gifResizeGray(bytes: Array[Byte], ow: Int, oh: Int): Array[Float] = {
    val (w, h, _, palette, px) = gifDecode(bytes)
    val out = new Array[Float](ow * oh)
    var oy = 0
    while (oy < oh) {
      val sy = math.min(h - 1, oy * h / oh)
      var ox = 0
      while (ox < ow) {
        val sx = math.min(w - 1, ox * w / ow)
        val c = palette(px(sy * w + sx) & 0xFF)
        val r = (c >>> 16) & 0xFF; val g = (c >>> 8) & 0xFF; val b = c & 0xFF
        out(oy * ow + ox) = (r + g + b) / 3.0f / 255.0f
        ox += 1
      }
      oy += 1
    }
    out
  }
}
