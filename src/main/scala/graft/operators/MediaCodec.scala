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
