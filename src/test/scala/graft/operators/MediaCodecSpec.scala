package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[MediaCodec]] — real RIFF/WAVE + BMP byte-level codecs (r6: the
  * multimodal decode stage is no longer a stub for these formats). */
class MediaCodecSpec extends SparkSpec {

  test("WAV roundtrip: synth → parse recovers format and content features") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 0, 500, -500)
    val bytes = MediaCodec.wavBytes(samples, 22050)
    val info = MediaCodec.parseWav(bytes)
    assert(info.sampleRate == 22050 && info.channels == 1 &&
      info.bitsPerSample == 16 && info.nSamples == 8)
    assert(info.peak == 32768)
    val expectedRms = math.sqrt(samples.map(s => s.toDouble * s).sum / 8)
    assert(math.abs(info.rms - expectedRms) < 1e-9)
    assert(math.abs(info.durationMs - 8000.0 / 22050) < 1e-9)
  }

  test("WAV parser walks chunk lists (extra chunk before data) and rejects junk") {
    // splice a LIST chunk between fmt and data: still parses
    val base = MediaCodec.wavBytes(Array[Short](100, -100), 8000)
    val extra = Array[Byte]('L', 'I', 'S', 'T', 4, 0, 0, 0, 'I', 'N', 'F', 'O')
    val spliced = base.take(36) ++ extra ++ base.drop(36)
    // fix the RIFF size field
    val riffLen = spliced.length - 8
    spliced(4) = riffLen.toByte; spliced(5) = (riffLen >> 8).toByte
    spliced(6) = (riffLen >> 16).toByte; spliced(7) = (riffLen >> 24).toByte
    val info = MediaCodec.parseWav(spliced)
    assert(info.nSamples == 2 && info.sampleRate == 8000)
    intercept[IllegalArgumentException](
      MediaCodec.parseWav("not audio at all".getBytes))
  }

  test("BMP roundtrip: header, means and the 4-byte row padding are exact") {
    // 3x2 image (stride pads 9 → 12): distinct per-pixel colors
    val px = Map((0, 0) -> 0xFF0000, (1, 0) -> 0x00FF00, (2, 0) -> 0x0000FF,
      (0, 1) -> 0x808080, (1, 1) -> 0x000000, (2, 1) -> 0xFFFFFF)
    val bytes = MediaCodec.bmpBytes(3, 2, (x, y) => px((x, y)))
    val info = MediaCodec.parseBmp(bytes)
    assert(info.width == 3 && info.height == 2 && info.bitsPerPixel == 24)
    assert(math.abs(info.meanR - (255 + 0 + 0 + 128 + 0 + 255) / 6.0) < 1e-9)
    assert(math.abs(info.meanG - (0 + 255 + 0 + 128 + 0 + 255) / 6.0) < 1e-9)
    assert(math.abs(info.meanB - (0 + 0 + 255 + 128 + 0 + 255) / 6.0) < 1e-9)
    intercept[IllegalArgumentException](MediaCodec.parseBmp(Array[Byte](1, 2, 3)))
  }

  test("BMP resize is a real nearest-neighbor downsample with the right luma") {
    // 4x4 image, left half black, right half white → 2x2 thumb [0,1,0,1]
    val bytes = MediaCodec.bmpBytes(4, 4,
      (x, _) => if (x < 2) 0x000000 else 0xFFFFFF)
    val thumb = MediaCodec.bmpResizeGray(bytes, 2, 2)
    assert(thumb.toSeq == Seq(0.0f, 1.0f, 0.0f, 1.0f))
  }

  test("PNG roundtrip: zlib + every scanline filter recover pixels exactly") {
    // tall enough that filters 0..4 each cover at least one scanline
    // (encoder writes filter y % 5); asymmetric gradient catches x/y swaps
    def px(x: Int, y: Int): Int =
      (((x + 2 * y + 9) % 256) << 24) | (((x * 37) % 256) << 16) |
        (((y * 11) % 256) << 8) | ((x * y) % 256)
    for (alpha <- Seq(true, false)) {
      val w = 7; val h = 11
      val bytes = MediaCodec.pngBytes(w, h, px, alpha)
      val info = MediaCodec.parsePng(bytes)
      assert(info.width == w && info.height == h && info.bitDepth == 8)
      assert(info.colorType == (if (alpha) 6 else 2))
      val n = (w * h).toDouble
      def mean(f: (Int, Int) => Int): Double =
        (for (y <- 0 until h; x <- 0 until w) yield f(x, y)).sum / n
      assert(math.abs(info.meanR - mean((x, y) => (px(x, y) >>> 16) & 0xFF)) < 1e-9)
      assert(math.abs(info.meanG - mean((x, y) => (px(x, y) >>> 8) & 0xFF)) < 1e-9)
      assert(math.abs(info.meanB - mean((x, y) => px(x, y) & 0xFF)) < 1e-9)
      val wantA = if (alpha) mean((x, y) => (px(x, y) >>> 24) & 0xFF) else 255.0
      assert(math.abs(info.meanA - wantA) < 1e-9)
    }
  }

  test("PNG parser verifies CRCs and rejects malformed input") {
    val bytes = MediaCodec.pngBytes(5, 4, (x, y) => (x * 40) << 16 | (y * 60), withAlpha = false)
    // flip one bit inside the IDAT payload: CRC check must catch it
    val corrupt = bytes.clone()
    corrupt(8 + 25 + 20) = (corrupt(8 + 25 + 20) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](MediaCodec.parsePng(corrupt))
    assert(e.getMessage.contains("CRC"))
    // truncation and junk both fail with clean errors
    intercept[IllegalArgumentException](MediaCodec.parsePng(bytes.take(40)))
    intercept[IllegalArgumentException](
      MediaCodec.parsePng("definitely not a png".getBytes))
  }

  test("PNG resize is a real nearest-neighbor downsample with the right luma") {
    val bytes = MediaCodec.pngBytes(4, 4,
      (x, _) => if (x < 2) 0x000000 else 0xFFFFFF, withAlpha = false)
    val thumb = MediaCodec.pngResizeGray(bytes, 2, 2)
    assert(thumb.toSeq == Seq(0.0f, 1.0f, 0.0f, 1.0f))
  }

  test("GIF roundtrip: variable-width LZW recovers every pixel exactly") {
    def pal(i: Int): Int = (i << 16) | (((5 * i) % 256) << 8) | ((255 - i))
    def idx(x: Int, y: Int): Int = (x * 13 + y * 29) % 256
    // 40×30 = 1200 pixels: the dictionary passes 512 entries, so 10-bit
    // codes are read and written; asymmetric indices catch x/y swaps
    val w = 40; val h = 30
    val bytes = MediaCodec.gifBytes(w, h, pal, idx)
    val info = MediaCodec.parseGif(bytes)
    assert(info.width == w && info.height == h && info.gctSize == 256)
    val n = (w * h).toDouble
    def mean(f: Int => Int): Double =
      (for (y <- 0 until h; x <- 0 until w) yield f(idx(x, y))).sum / n
    assert(math.abs(info.meanR - mean(i => (pal(i) >>> 16) & 0xFF)) < 1e-9)
    assert(math.abs(info.meanG - mean(i => (pal(i) >>> 8) & 0xFF)) < 1e-9)
    assert(math.abs(info.meanB - mean(i => pal(i) & 0xFF)) < 1e-9)
  }

  test("GIF LZW survives a mid-stream dictionary reset (4096-entry clear)") {
    // 256 distinct index values in a non-repeating-enough pattern push
    // the dictionary to 4096 on a large image, forcing the encoder's
    // mid-stream clear code and the decoder's reset handling
    def idx(x: Int, y: Int): Int = (x * x * 3 + y * y * 7 + x * y) % 256
    val w = 120; val h = 90 // 10,800 pixels
    val bytes = MediaCodec.gifBytes(w, h, i => i * 0x010101, idx)
    val info = MediaCodec.parseGif(bytes)
    assert(info.width == w && info.height == h)
    val n = (w * h).toDouble
    val want = (for (y <- 0 until h; x <- 0 until w) yield idx(x, y)).sum / n
    assert(math.abs(info.meanR - want) < 1e-9) // gray palette: r = index
    assert(math.abs(info.meanG - want) < 1e-9)
  }

  test("GIF wKwK special case and single-color runs decode correctly") {
    // constant image: immediate wKwK chains (code == next) every step
    val flat = MediaCodec.gifBytes(16, 16, i => i << 16, (_, _) => 7)
    val fi = MediaCodec.parseGif(flat)
    assert(fi.meanR == 7.0 && fi.meanG == 0.0 && fi.meanB == 0.0)
    // 1×1 minimal image
    val one = MediaCodec.gifBytes(1, 1, i => i, (_, _) => 200)
    assert(MediaCodec.parseGif(one).meanB == 200.0)
    // junk rejects cleanly
    intercept[IllegalArgumentException](
      MediaCodec.parseGif("definitely not a gif".getBytes))
  }

  test("GIF decoder fails CLEANLY on truncation and corruption, never OOB") {
    val good = MediaCodec.gifBytes(20, 15, i => i * 0x010101,
      (x, y) => (x * 3 + y * 5) % 256)
    // EVERY truncation point must raise IllegalArgumentException (a
    // require) — never ArrayIndexOutOfBounds or an infinite loop. The
    // last byte is the trailer, which the parser tolerates missing (all
    // pixels are already recovered), hence length − 1.
    for (len <- 1 until good.length - 1) {
      val e = intercept[Exception](MediaCodec.parseGif(good.take(len)))
      assert(e.isInstanceOf[IllegalArgumentException],
        s"truncation at $len threw ${e.getClass}: ${e.getMessage}")
    }
    // bit flips inside the LZW stream: either a clean reject or a decode
    // to SOME pixel matrix (sum fingerprints no longer match, which the
    // oracle would catch) — never a crash class
    for (off <- Seq(800, 850, 900)) {
      if (off < good.length - 2) {
        val c = good.clone(); c(off) = (c(off) ^ 0x40).toByte
        try { MediaCodec.parseGif(c); () }
        catch { case _: IllegalArgumentException => () }
      }
    }
  }

  test("GIF resize is a real nearest-neighbor downsample with the right luma") {
    val bytes = MediaCodec.gifBytes(4, 4, i => i * 0x010101,
      (x, _) => if (x < 2) 0 else 255)
    val thumb = MediaCodec.gifResizeGray(bytes, 2, 2)
    assert(thumb.toSeq == Seq(0.0f, 1.0f, 0.0f, 1.0f))
  }

  test("TIFF roundtrip: IFD walk, out-of-line BitsPerSample, strip means") {
    def px(x: Int, y: Int): Int =
      (((x * 11) % 256) << 16) | (((y * 17) % 256) << 8) | ((x + 3 * y) % 256)
    val w = 13; val h = 9
    val bytes = MediaCodec.tiffBytes(w, h, px)
    val info = MediaCodec.parseTiff(bytes)
    assert(info.width == w && info.height == h && info.samplesPerPixel == 3)
    val n = (w * h).toDouble
    def mean(f: (Int, Int) => Int): Double =
      (for (y <- 0 until h; x <- 0 until w) yield f(x, y)).sum / n
    assert(math.abs(info.meanR - mean((x, y) => (px(x, y) >>> 16) & 0xFF)) < 1e-9)
    assert(math.abs(info.meanG - mean((x, y) => (px(x, y) >>> 8) & 0xFF)) < 1e-9)
    assert(math.abs(info.meanB - mean((x, y) => px(x, y) & 0xFF)) < 1e-9)
  }

  test("TIFF decoder rejects unsupported profiles and truncation cleanly") {
    val good = MediaCodec.tiffBytes(6, 4, (x, y) => (x * 40) << 16 | (y * 60))
    // big-endian, wrong magic, junk: clean rejects
    val be = good.clone(); be(0) = 'M'; be(1) = 'M'
    intercept[IllegalArgumentException](MediaCodec.parseTiff(be))
    intercept[IllegalArgumentException](
      MediaCodec.parseTiff("not a tiff at all!!".getBytes))
    // every truncation point raises IllegalArgumentException, never OOB
    for (len <- 1 until good.length) {
      val e = intercept[Exception](MediaCodec.parseTiff(good.take(len)))
      assert(e.isInstanceOf[IllegalArgumentException],
        s"truncation at $len threw ${e.getClass}: ${e.getMessage}")
    }
    // a flipped Compression tag value must be refused, not mis-decoded
    val comp = good.clone()
    // entry order: Compression is the 4th entry; value at +8 of its slot
    val ifdOff = comp(4) & 0xFF | (comp(5) & 0xFF) << 8 |
      (comp(6) & 0xFF) << 16 | (comp(7) & 0xFF) << 24
    comp(ifdOff + 2 + 3 * 12 + 8) = 5 // LZW
    val e = intercept[IllegalArgumentException](MediaCodec.parseTiff(comp))
    assert(e.getMessage.contains("uncompressed"))
  }

  test("TIFF resize is a real nearest-neighbor downsample with the right luma") {
    val bytes = MediaCodec.tiffBytes(4, 4,
      (x, _) => if (x < 2) 0x000000 else 0xFFFFFF)
    val thumb = MediaCodec.tiffResizeGray(bytes, 2, 2)
    assert(thumb.toSeq == Seq(0.0f, 1.0f, 0.0f, 1.0f))
  }

  test("mu-law expansion matches the G.711 reference table points") {
    // ITU-T G.711 landmark values: 0xFF → 0, 0x7F → −0? (sign byte),
    // spot-check the closed form against hand-computed expansions
    assert(MediaCodec.ulawExpand(0xFF) == 0)     // u=0: (132<<0)−132
    assert(MediaCodec.ulawExpand(0x7F) == 0)     // sign bit only
    assert(MediaCodec.ulawExpand(0xFE) == 8)     // u=1: (140<<0)−132
    assert(MediaCodec.ulawExpand(0x7E) == -8)
    assert(MediaCodec.ulawExpand(0x80) == 32124) // u=127: max magnitude
    assert(MediaCodec.ulawExpand(0x00) == -32124)
    // monotone decreasing magnitude as the byte increases within a sign
    val mags = (0x80 to 0xFF).map(MediaCodec.ulawExpand)
    assert(mags.zip(mags.tail).forall { case (a, b) => a >= b })
  }

  test("mu-law WAV roundtrip: RIFF walk + expansion recover content features") {
    val n = 300
    val ulaw = Array.tabulate(n)(i => ((i * 11 + 5) % 256).toByte)
    val bytes = MediaCodec.ulawWavBytes(ulaw, 8000)
    val info = MediaCodec.parseUlawWav(bytes)
    assert(info.sampleRate == 8000 && info.channels == 1 && info.nSamples == n)
    val pcm = ulaw.map(b => MediaCodec.ulawExpand(b & 0xFF))
    assert(info.peak == pcm.map(math.abs).max)
    assert(math.abs(info.meanAbs -
      pcm.map(math.abs(_).toLong).sum.toDouble / n) < 1e-9)
    // a PCM16 file must be refused by the mu-law parser and vice versa
    val pcm16 = MediaCodec.wavBytes(Array[Short](1, 2, 3), 8000)
    intercept[IllegalArgumentException](MediaCodec.parseUlawWav(pcm16))
    intercept[IllegalArgumentException](MediaCodec.parseWav(bytes))
  }

  test("A-law expansion and WAV roundtrip (G.711's other half)") {
    // landmark values: 0x55 → segment 0, mant 0 → +8; 0xD5 → −8? sign
    // convention: a-law sign bit SET means positive after the XOR
    assert(MediaCodec.alawExpand(0xD5) == 8)   // a=0x80: sign+seg0+mant0
    assert(MediaCodec.alawExpand(0x55) == -8)  // a=0x00
    assert(MediaCodec.alawExpand(0xAA) == 32256) // a=0xFF: max magnitude
    assert(MediaCodec.alawExpand(0x2A) == -32256)
    val n = 250
    val alaw = Array.tabulate(n)(i => ((i * 13 + 7) % 256).toByte)
    val bytes = MediaCodec.alawWavBytes(alaw, 8000)
    val info = MediaCodec.parseAlawWav(bytes)
    assert(info.nSamples == n && info.sampleRate == 8000)
    val pcm = alaw.map(b => MediaCodec.alawExpand(b & 0xFF))
    assert(info.peak == pcm.map(math.abs).max)
    assert(math.abs(info.meanAbs -
      pcm.map(math.abs(_).toLong).sum.toDouble / n) < 1e-9)
    // mu-law and A-law parsers reject each other's format codes
    intercept[IllegalArgumentException](MediaCodec.parseUlawWav(bytes))
  }

  test("JPEG marker walk: fill bytes and standalone TEM/RST markers (r9)") {
    // conforming foreign encoders may pad with 0xFF fill bytes before a
    // marker id and emit standalone TEM (FF01) — neither carries a length
    // segment, and the old walk misparsed both as length-bearing
    val bytes = MediaCodec.jpegBytes(16, 8,
      (bx, by) => ((bx * 50 + by * 9 + 1) % 256, 0, 0), gray = true)
    val clean = MediaCodec.parseJpeg(bytes)
    // inject after SOI (FF D8): two fill bytes + a TEM + a RST3 marker
    val inject = Array(0xFF, 0xFF, 0xFF, 0x01, 0xFF, 0xD3).map(_.toByte)
    val padded = bytes.take(2) ++ inject ++ bytes.drop(2)
    val info = MediaCodec.parseJpeg(padded)
    assert(info.width == clean.width && info.height == clean.height &&
      info.meanR == clean.meanR,
      "fill bytes / standalone markers must not change the decode")
  }

  test("JPEG roundtrip: Huffman DC diffs, IDCT and fixed-point color are exact") {
    // blockwise-constant color image: decoded pixels must be the exact
    // fixed-point transform of the synthesized (Y, Cb, Cr)
    def yCbCr(bx: Int, by: Int): (Int, Int, Int) =
      ((bx * 31 + by * 7 + 3) % 256, (bx * 13 + 40) % 256, (by * 17 + 90) % 256)
    val bytes = MediaCodec.jpegBytes(24, 16, yCbCr)
    val info = MediaCodec.parseJpeg(bytes)
    assert(info.width == 24 && info.height == 16 && info.nComponents == 3)
    def clamp(v: Int) = math.max(0, math.min(255, v))
    val blocks = for (by <- 0 until 2; bx <- 0 until 3) yield yCbCr(bx, by)
    val expR = blocks.map { case (y, _, cr) =>
      clamp(y + ((91881 * (cr - 128)) >> 16)) }.sum / 6.0
    val expG = blocks.map { case (y, cb, cr) =>
      clamp(y - ((22554 * (cb - 128) + 46802 * (cr - 128)) >> 16)) }.sum / 6.0
    val expB = blocks.map { case (y, cb, _) =>
      clamp(y + ((116130 * (cb - 128)) >> 16)) }.sum / 6.0
    assert(info.meanR == expR, s"${info.meanR} vs $expR")
    assert(info.meanG == expG && info.meanB == expB)
    // grayscale: decoded value IS the synthesized Y
    val g = MediaCodec.parseJpeg(
      MediaCodec.jpegBytes(16, 8, (bx, by) => ((bx * 100 + by * 9) % 256, 0, 0),
        gray = true))
    assert(g.nComponents == 1)
    val expY = (0 until 2).map(bx => (bx * 100) % 256).sum / 2.0
    assert(g.meanR == expY && g.meanG == expY && g.meanB == expY)
  }

  test("JPEG AC path: hand-built scan with runs, ZRL and a custom DHT") {
    // a single 8×8 grayscale block with REAL AC coefficients, assembled
    // by hand against a custom canonical AC table, checked against an
    // independent textbook IDCT — exercises run-length skips, ZRL,
    // extend() sign decoding, dezigzag and dequant
    val out = new java.io.ByteArrayOutputStream()
    def m(x: Int) = { out.write(0xFF); out.write(x) }
    def be16(v: Int) = { out.write(v >> 8); out.write(v & 0xFF) }
    m(0xD8)
    m(0xDB); be16(67); out.write(0); (0 until 64).foreach(_ => out.write(1))
    m(0xC0); be16(11); out.write(8); be16(8); be16(8); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    // standard DC table (cat 3 → code 100); custom AC: four 2-bit codes
    // 00→EOB, 01→(r0,s1), 10→(r1,s1), 11→ZRL
    val dcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    m(0xC4); be16(2 + 1 + 16 + 12); out.write(0x00)
    dcBits.foreach(out.write); (0 until 12).foreach(out.write)
    m(0xC4); be16(2 + 1 + 16 + 4); out.write(0x10)
    Array(0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    Array(0x00, 0x01, 0x11, 0xF0).foreach(out.write)
    m(0xDA); be16(8); out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    // bits: DC cat3=100, diff=5 → 101 | AC 01,+1 | ZRL 11 | 10, bit 0=−1
    // | EOB 00  ⇒ 10010101 11100100 wait — recompute below as bytes
    // "100101" "01" "1" "11" "10" "0" "00" = 1001 0101 1111 0000
    out.write(0x95); out.write(0xF0)
    m(0xD9)
    val bytes = out.toByteArray
    // natural-order coefficients the scan encodes (quant all-1s):
    // F(0,0)=5, zigzag[1]=natural 1 → +1, ZRL skips 16, then run 1 →
    // k=19, zigzag[19]=natural 33 → −1
    val coef = new Array[Int](64)
    coef(0) = 5; coef(1) = 1; coef(33) = -1
    // independent textbook IDCT reference
    val ref = Array.tabulate(64) { i =>
      val x = i % 8; val y = i / 8
      var s = 0.0
      for (u <- 0 until 8; v <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2) else 1.0
        s += cu * cv * coef(v * 8 + u) *
          math.cos((2 * x + 1) * u * math.Pi / 16) *
          math.cos((2 * y + 1) * v * math.Pi / 16)
      }
      math.max(0, math.min(255, math.floor(s / 4.0 + 128.0 + 0.5).toInt))
    }
    val thumb = MediaCodec.jpegResizeGray(bytes, 8, 8)
    for (i <- 0 until 64)
      assert(math.abs(thumb(i) - ref(i) / 255.0f) < 1e-6,
        s"pixel $i: ${thumb(i)} vs ${ref(i) / 255.0f}")
  }

  test("JPEG decoder fails CLEANLY on truncation; rejects unsupported profiles") {
    val good = MediaCodec.jpegBytes(24, 16,
      (bx, by) => ((bx * 31 + by * 7) % 256, 128, 128))
    for (len <- 1 until good.length - 2) {
      val e = intercept[Exception](MediaCodec.parseJpeg(good.take(len)))
      assert(e.isInstanceOf[IllegalArgumentException],
        s"truncation at $len threw ${e.getClass}: ${e.getMessage}")
    }
    // progressive (SOF2) and subsampling must be rejected with clear errors
    val sof = {
      var i = 2
      var at = -1
      while (at < 0) {
        if ((good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xC0) at = i
        else i += 1
      }
      at
    }
    val prog = good.clone(); prog(sof + 1) = 0xC2.toByte
    val e1 = intercept[IllegalArgumentException](MediaCodec.parseJpeg(prog))
    assert(e1.getMessage.contains("SOF0"), e1.getMessage)
    val sub = good.clone(); sub(sof + 11) = 0x22.toByte // luma sampling 2x2
    val e2 = intercept[IllegalArgumentException](MediaCodec.parseJpeg(sub))
    assert(e2.getMessage.contains("4:4:4"), e2.getMessage)
    assert(e2.getMessage.contains("1x1"), e2.getMessage)
  }

  test("JPEG byte stuffing: 0xFF entropy bytes are stuffed and unstuffed") {
    // blocks [0, 0, 255, 255]: the streams bit-lengths are 15 (diff −128)
    // + 3 (diff 0) = 18 ≡ 2 (mod 8), so the following diff +255 (code
    // 111110, 6 bits) puts its EIGHT all-ones value bits exactly at bits
    // 24..31 — a guaranteed 0xFF entropy byte that MUST be stuffed with
    // 0x00 and decode back exactly
    val b = MediaCodec.jpegBytes(8 * 4, 8,
      (bx, _) => (if (bx < 2) 0 else 255, 0, 0), gray = true)
    val hasStuffed = (0 until b.length - 1).exists(i =>
      (b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0x00)
    assert(hasStuffed, "expected a stuffed 0xFF00 in the entropy data")
    val info = MediaCodec.parseJpeg(b)
    assert(info.meanR == 127.5, s"${info.meanR}") // 2 black + 2 white blocks
  }

  test("FLAC roundtrip is LOSSLESS: every subframe/residual shape bit-exact") {
    val shapes = Seq[Array[Int]](
      Array.fill(100)(1234),                    // CONSTANT subframe
      Array.fill(64)(-32768),                   // constant at the range edge
      Array.tabulate(1024)(i => ((i * 7) % 256 - 128) * 64), // order-1 friendly
      Array.tabulate(2500)(i => (i % 300) - 150), // multi-frame + short tail
      Array.tabulate(40)(i => if (i % 2 == 0) 32767 else -32768), // escape-ish
      Array.tabulate(333)(i => (i * i) % 20000 - 10000), // order-2 friendly
      Array[Int](0),                            // single sample (< min block
                                                // is legal in the LAST frame)
      Array.tabulate(1024)(_ => 0))             // all-zero block
    for (s <- shapes) {
      val bytes = MediaCodec.flacBytes(s, 8000)
      val (sr, ch, bits, got) = MediaCodec.flacDecode(bytes)
      assert(sr == 8000 && ch == 1 && bits == 16)
      assert(got.toSeq == s.toSeq,
        s"lossless violated for shape of length ${s.length}")
    }
    // content features match a driver-side fold exactly
    val s = Array.tabulate(777)(i => ((i * 13) % 512) - 256)
    val info = MediaCodec.parseFlac(MediaCodec.flacBytes(s, 16000))
    assert(info.nSamples == 777 && info.sampleRate == 16000)
    assert(info.peak == s.map(math.abs).max)
    assert(math.abs(info.meanAbs -
      s.map(v => math.abs(v).toLong).sum.toDouble / 777) < 1e-12)
  }

  test("FLAC decoder fails CLEANLY on truncation and CRC corruption") {
    val good = MediaCodec.flacBytes(
      Array.tabulate(600)(i => ((i * 7) % 256 - 128) * 64), 8000)
    for (len <- 1 until good.length) {
      val e = intercept[Exception](MediaCodec.parseFlac(good.take(len)))
      assert(e.isInstanceOf[IllegalArgumentException],
        s"truncation at $len threw ${e.getClass}: ${e.getMessage}")
    }
    // flip one bit in the subframe payload: the frame CRC-16 must catch it
    val corrupt = good.clone()
    corrupt(good.length - 10) = (corrupt(good.length - 10) ^ 0x40).toByte
    val e = intercept[IllegalArgumentException](MediaCodec.parseFlac(corrupt))
    assert(e.getMessage.contains("CRC"), e.getMessage)
    // flip a frame-header bit: the header CRC-8 must catch it (the header
    // starts right after fLaC + 4-byte block header + 34-byte STREAMINFO)
    val hdr = good.clone()
    hdr(4 + 4 + 34 + 2) = (hdr(4 + 4 + 34 + 2) ^ 0x01).toByte
    val e2 = intercept[IllegalArgumentException](MediaCodec.parseFlac(hdr))
    assert(e2.getMessage.contains("CRC") || e2.getMessage.contains("sync") ||
      e2.getMessage.contains("reserved"), e2.getMessage)
  }

  test("FLAC frame numbering: multi-byte UTF-8 frame numbers decode") {
    // 200 frames of the minimum block size 16 → frame numbers past 127
    // exercise the 2-byte UTF-8 form
    val s = Array.tabulate(200 * 16)(i => (i % 100) - 50)
    val bytes = MediaCodec.flacBytes(s, 8000, blockSize = 16)
    val (_, _, _, got) = MediaCodec.flacDecode(bytes)
    assert(got.toSeq == s.toSeq)
  }

  test("Spark stages: synth tables decode end-to-end on the corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val nDocs = docs.count()
    val wav = Multimodal.decodeWav(Multimodal.asWavTable(docs))
    val w = wav.agg(count(lit(1)), min(col("sample_rate")), max(col("channels")),
      min(col("rms")), max(col("peak"))).head()
    assert(w.getLong(0) == nDocs)
    assert(w.getInt(1) == 16000 && w.getInt(2) == 1)
    assert(w.getDouble(3) > 0.0 && w.getInt(4) <= 32768)
    val bmp = Multimodal.decodeBmp(Multimodal.asBmpTable(docs))
    val b = bmp.agg(count(lit(1)), min(col("width")), max(col("width")),
      min(col("mean_r")), max(col("mean_r"))).head()
    assert(b.getLong(0) == nDocs)
    assert(b.getInt(1) >= 16 && b.getInt(2) <= 32)
    assert(b.getDouble(3) >= 0.0 && b.getDouble(4) <= 255.0)
    val png = Multimodal.decodePng(Multimodal.asPngTable(docs))
    val p = png.agg(count(lit(1)), min(col("width")), max(col("width")),
      min(col("mean_a")), max(col("mean_a")),
      countDistinct(col("color_type"))).head()
    assert(p.getLong(0) == nDocs)
    assert(p.getInt(1) >= 8 && p.getInt(2) <= 20)
    assert(p.getDouble(3) >= 0.0 && p.getDouble(4) <= 255.0)
    assert(p.getLong(5) == 2) // both RGB and RGBA synthesized
    // determinism: same id → identical decoded features across runs
    val twice = Multimodal.decodeWav(Multimodal.asWavTable(docs))
      .select("media_id", "rms")
    val joinedCnt = wav.select(col("media_id"), col("rms").as("r1"))
      .join(twice.withColumnRenamed("rms", "r2"), "media_id")
      .filter(col("r1") === col("r2")).count()
    assert(joinedCnt == nDocs)
  }
}
