package graft.operators

import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property round-trips for the GIF LZW coder: random palettes, random
  * index patterns (incl. long constant runs — the wKwK stress), random
  * dimensions spanning the 9→10-bit width growth. The decoder must
  * recover EVERY pixel of every encoded image. */
object GifPropSpec extends Properties("GifCodec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val genDims: Gen[(Int, Int)] =
    Gen.zip(Gen.choose(1, 48), Gen.choose(1, 36))

  // index generators of very different entropy: constant runs, small
  // alphabets (deep dictionary chains), and full-range mixes
  private val genPattern: Gen[(Int, Int, Long) => Int] = Gen.oneOf(
    Gen.choose(0, 255).map(c => (_: Int, _: Int, _: Long) => c),
    Gen.choose(2, 5).map(m => (x: Int, y: Int, _: Long) => (x + y) % m),
    Gen.choose(1L, Long.MaxValue / 4).map(seed =>
      (x: Int, y: Int, _: Long) =>
        (((x * 2654435761L + y * 40503L + seed) >>> 7) % 256).toInt))

  property("encode → decode recovers every pixel") =
    Prop.forAll(genDims, genPattern, Gen.choose(0L, 1000L)) {
      case ((w, h), pat, salt) =>
        val idx = (x: Int, y: Int) => pat(x, y, salt) & 0xFF
        // gray identity palette: channel mean == index mean, and the
        // per-pixel check below goes through the thumbnail at full size
        val bytes = MediaCodec.gifBytes(w, h, i => i * 0x010101, idx)
        val full = MediaCodec.gifResizeGray(bytes, w, h) // 1:1 = raw pixels
        (0 until h).forall { y =>
          (0 until w).forall { x =>
            math.abs(full(y * w + x) - idx(x, y) / 255.0f) < 1e-6
          }
        }
    }
}
