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
}
