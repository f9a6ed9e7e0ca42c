package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Mp3

/** r17 seam closures: ASYMMETRIC-blocktype intensity (the stereo
  * reconstruction keyed entirely off ch1's layout, ch0 contributing
  * linewise whatever its own block type) and MIXED-block intensity (the
  * per-window value-scan over short bands 3..12 in the mixed slot order,
  * plus the long-head pass that is eligible only when ch1's entire short
  * part is zero). Every expectation is computed in the spec from the
  * published layout rules — the decoder never checks itself. */
class Mp3MixedStereoSpec extends AnyFunSuite {

  // 44.1 kHz band edges (Annex B Table B.8), duplicated here so the
  // spec's expected layouts are independent of the decoder's tables
  private val sbE44 = Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192)
  private val sfbL44 = Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62,
    74, 90, 110, 134, 162, 196, 238, 288, 342, 418, 576)

  /** Band-major Huffman order → frequency-interleaved xr(3f+w); with
    * `mixed` the first 36 lines stay linear and short starts at band 3. */
  private def interleave(huff: Array[Int], mixed: Boolean = false): Array[Int] = {
    val out = new Array[Int](576)
    var src = 0
    if (mixed) { (0 until 36).foreach { i => out(i) = huff(src); src += 1 } }
    for (b <- (if (mixed) 3 else 0) until 13; w <- 0 until 3;
         f <- sbE44(b) until sbE44(b + 1)) {
      out(3 * f + w) = huff(src); src += 1
    }
    out
  }

  private def bandOf(i: Int): Int = {
    var b = 0
    while (b < 21 && i >= sfbL44(b + 1)) b += 1
    b
  }

  test("asymmetric intensity: SHORT left, LONG right — ch1's long layout rules") {
    val rnd = new scala.util.Random(71)
    // ch0 short, nonzero everywhere; ch1 long, coded through line 109
    // (bv1 = 55) — rzero starts at 110 = sfb(14)... the spec scan puts
    // the intensity bound at the first band edge >= 110, which IS 110,
    // so long bands 14.. reconstruct from ch0's value at the same line
    val ch0h = Array.fill(576)(if (rnd.nextBoolean()) 1 else -1)
    val ch1 = Array.tabulate(576)(i => if (i < 110) (if (rnd.nextBoolean()) 1 else -1) else 0)
    val boundBand = sfbL44.indexOf(110) // = 14
    val isPos = Array.tabulate(21)(b => if (b < boundBand) 0 else (b % 6) + 1)
    val d = Mp3.decode(Mp3.encodeStereoFlex(ch0h, ch1,
        bt0 = 2, mixed0 = false, bt1 = 0, mixed1 = false,
        intensity = true, bv1 = 55, isPosL = isPos))
      .getOrElse(fail("decode None"))
    assert(d.nChannels == 2)
    val m = interleave(ch0h) // ch0's xr IS in its own reordered layout
    for (i <- 0 until 576) {
      if (i < 110) {
        assert(d.spectral(i) == m(i).toDouble, s"below-bound L at $i")
        assert(d.spectralRight(i) == ch1(i).toDouble, s"below-bound R at $i")
      } else {
        val pos = isPos(math.min(bandOf(i), 20))
        val ratio = math.tan(pos * math.Pi / 12.0)
        assert(d.spectral(i) == m(i) * (ratio / (1.0 + ratio)), s"IS L at $i")
        assert(d.spectralRight(i) == m(i) * (1.0 / (1.0 + ratio)), s"IS R at $i")
      }
    }
  }

  test("asymmetric intensity: LONG left, SHORT right — ch1's per-window value scan") {
    val rnd = new scala.util.Random(72)
    // ch0 long (no reorder); ch1 short coded through band 5 in every
    // window (bv1 = 45 → 90 band-major values = 3·sbE(6))
    val ch0 = Array.fill(576)(if (rnd.nextBoolean()) 1 else -1)
    val ch1h = Array.tabulate(576)(i => if (i < 90) (if (rnd.nextBoolean()) 1 else -1) else 0)
    val isPos = Array.tabulate(12, 3)((b, w) => if (b < 6) 0 else (b + w) % 7)
    val d = Mp3.decode(Mp3.encodeStereoFlex(ch0, ch1h,
        bt0 = 0, mixed0 = false, bt1 = 2, mixed1 = false,
        intensity = true, bv1 = 45, isPosS = isPos))
      .getOrElse(fail("decode None"))
    val r1 = interleave(ch1h)
    for (b <- 0 until 13; w <- 0 until 3; f <- sbE44(b) until sbE44(b + 1)) {
      val i = 3 * f + w
      if (b <= 5) {
        assert(d.spectral(i) == ch0(i).toDouble, s"below-bound L at b=$b w=$w f=$f")
        assert(d.spectralRight(i) == r1(i).toDouble, s"below-bound R at b=$b w=$w f=$f")
      } else {
        val pos = isPos(math.min(b, 11))(w)
        val ratio = math.tan(pos * math.Pi / 12.0)
        assert(d.spectral(i) == ch0(i) * (ratio / (1.0 + ratio)), s"IS L at b=$b w=$w f=$f")
        assert(d.spectralRight(i) == ch0(i) * (1.0 / (1.0 + ratio)), s"IS R at b=$b w=$w f=$f")
      }
    }
  }

  test("mixed intensity: short part per-window, head NOT eligible while short content exists") {
    val rnd = new scala.util.Random(73)
    // both channels mixed. ch1's head is coded in long bands 0..3 only
    // (lines 0..15) and its short part through band 5 per window — in
    // the MIXED Huffman order that is 36 head lines + 3·(sbE(6)−sbE(3))
    // = 54 short values, so bv1 = 45. Short bands >= 6 go intensity;
    // head bands 4..7 do NOT (the short part is nonzero), even though
    // their is_pos slots carry values
    val ch0h = Array.fill(576)(if (rnd.nextBoolean()) 1 else -1)
    val ch1h = new Array[Int](576)
    for (i <- 0 until 16) ch1h(i) = if (rnd.nextBoolean()) 1 else -1
    for (i <- 36 until 90) ch1h(i) = if (rnd.nextBoolean()) 1 else -1
    val isPosL = Array.tabulate(21)(b => if (b >= 4 && b < 8) 3 else 0)
    // band 7 window 1 carries the ILLEGAL marker → pass-through
    val isPosS = Array.tabulate(12, 3)((b, w) =>
      if (b < 6) 0 else if (b == 7 && w == 1) 7 else (b + w) % 7)
    val d = Mp3.decode(Mp3.encodeStereoFlex(ch0h, ch1h,
        bt0 = 2, mixed0 = true, bt1 = 2, mixed1 = true,
        intensity = true, bv1 = 45, isPosL = isPosL, isPosS = isPosS))
      .getOrElse(fail("decode None"))
    val m = interleave(ch0h, mixed = true)
    val r1 = interleave(ch1h, mixed = true)
    // head lines 0..35: pass-through everywhere (no head intensity)
    for (i <- 0 until 36) {
      assert(d.spectral(i) == m(i).toDouble, s"head L at $i")
      assert(d.spectralRight(i) == r1(i).toDouble, s"head R at $i")
    }
    for (b <- 3 until 13; w <- 0 until 3; f <- sbE44(b) until sbE44(b + 1)) {
      val i = 3 * f + w
      if (b <= 5 || (b == 7 && w == 1)) {
        assert(d.spectral(i) == m(i).toDouble, s"pass L at b=$b w=$w f=$f")
        assert(d.spectralRight(i) == r1(i).toDouble, s"pass R at b=$b w=$w f=$f")
      } else {
        val pos = isPosS(math.min(b, 11))(w)
        val ratio = math.tan(pos * math.Pi / 12.0)
        assert(d.spectral(i) == m(i) * (ratio / (1.0 + ratio)), s"IS L at b=$b w=$w f=$f")
        assert(d.spectralRight(i) == m(i) * (1.0 / (1.0 + ratio)), s"IS R at b=$b w=$w f=$f")
      }
    }
  }

  test("mixed intensity: zero short part makes the LONG head eligible above its last band") {
    val rnd = new scala.util.Random(74)
    // ch1: head coded in long bands 0..3 (lines 0..15), short part
    // entirely zero → head bands 4..7 intensity (bound = last nonzero
    // long band 3), and every short band in every window is intensity
    val ch0h = Array.fill(576)(if (rnd.nextBoolean()) 1 else -1)
    val ch1h = Array.tabulate(576)(i => if (i < 16) (if (rnd.nextBoolean()) 1 else -1) else 0)
    val isPosL = Array.tabulate(21)(b => if (b >= 4 && b < 8) b - 3 else 0)
    val isPosS = Array.tabulate(12, 3)((b, w) => if (b < 3) 0 else (b + w) % 7)
    val d = Mp3.decode(Mp3.encodeStereoFlex(ch0h, ch1h,
        bt0 = 2, mixed0 = true, bt1 = 2, mixed1 = true,
        intensity = true, bv1 = 8, isPosL = isPosL, isPosS = isPosS))
      .getOrElse(fail("decode None"))
    val m = interleave(ch0h, mixed = true)
    for (i <- 0 until 36) {
      val b = bandOf(i)
      if (b <= 3) {
        assert(d.spectral(i) == m(i).toDouble, s"head below-bound L at $i")
        assert(d.spectralRight(i) == ch1h(i).toDouble, s"head below-bound R at $i")
      } else {
        val ratio = math.tan(isPosL(b) * math.Pi / 12.0)
        assert(d.spectral(i) == m(i) * (ratio / (1.0 + ratio)), s"head IS L at $i")
        assert(d.spectralRight(i) == m(i) * (1.0 / (1.0 + ratio)), s"head IS R at $i")
      }
    }
    for (b <- 3 until 13; w <- 0 until 3; f <- sbE44(b) until sbE44(b + 1)) {
      val i = 3 * f + w
      val pos = isPosS(math.min(b, 11))(w)
      val ratio = math.tan(pos * math.Pi / 12.0)
      assert(d.spectral(i) == m(i) * (ratio / (1.0 + ratio)), s"IS L at b=$b w=$w f=$f")
      assert(d.spectralRight(i) == m(i) * (1.0 / (1.0 + ratio)), s"IS R at b=$b w=$w f=$f")
    }
  }

  test("LSF mixed intensity: 6-slot long head + 13818-3 short scaling, head ineligible") {
    val rnd = new scala.util.Random(76)
    // 22.05 kHz LSF: head = 6 long bands of width 6 (edges 0,6,..,36),
    // short edges sbE22. ch1: head coded in long bands 0..2 (lines
    // 0..17), short part through band 5 per window — the head occupies
    // 36 Huffman positions regardless (zeros included), so the coded
    // span is 36 + 3·(sbE22(6)−sbE22(3)) = 96 lines, bv1 = 48. Short bands >= 6 go
    // intensity under the 13818-3 io^((is_pos+1)/2) scheme at
    // intensity_scale = 1 (io = 2^-1/2); head bands 3..5 carry is_pos
    // slots but stay pass-through (short content exists)
    val sbE22 = Array(0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192)
    val ch0h = Array.fill(576)(if (rnd.nextBoolean()) 1 else -1)
    val ch1h = new Array[Int](576)
    for (i <- 0 until 18) ch1h(i) = if (rnd.nextBoolean()) 1 else -1
    for (i <- 36 until 96) ch1h(i) = if (rnd.nextBoolean()) 1 else -1
    val isPosL = Array.tabulate(21)(b => if (b >= 3 && b < 6) 4 else 0)
    // band 7 window 1 = 7 (the LSF all-ones ILLEGAL marker at slen 3)
    val isPosS = Array.tabulate(12, 3)((b, w) =>
      if (b < 6) 0 else if (b == 7 && w == 1) 7 else (b + w) % 7)
    val d = Mp3.decode(Mp3.encodeStereoFlex(ch0h, ch1h,
        bt0 = 2, mixed0 = true, bt1 = 2, mixed1 = true,
        intensity = true, bv1 = 48, isPosL = isPosL, isPosS = isPosS,
        lsf = true, isScale = 1))
      .getOrElse(fail("decode None"))
    assert(d.sampleRate == 22050 && d.nSamples == 576)
    def interleave22(huff: Array[Int]): Array[Int] = {
      val out = new Array[Int](576)
      var src = 0
      (0 until 36).foreach { i => out(i) = huff(src); src += 1 }
      for (b <- 3 until 13; w <- 0 until 3; f <- sbE22(b) until sbE22(b + 1)) {
        out(3 * f + w) = huff(src); src += 1
      }
      out
    }
    val m = interleave22(ch0h)
    val r1 = interleave22(ch1h)
    for (i <- 0 until 36) {
      assert(d.spectral(i) == m(i).toDouble, s"head L at $i")
      assert(d.spectralRight(i) == r1(i).toDouble, s"head R at $i")
    }
    val io = math.pow(2.0, -0.5)
    for (b <- 3 until 13; w <- 0 until 3; f <- sbE22(b) until sbE22(b + 1)) {
      val i = 3 * f + w
      if (b <= 5 || (b == 7 && w == 1)) {
        assert(d.spectral(i) == m(i).toDouble, s"pass L at b=$b w=$w f=$f")
        assert(d.spectralRight(i) == r1(i).toDouble, s"pass R at b=$b w=$w f=$f")
      } else {
        val pos = isPosS(math.min(b, 11))(w)
        val f2 = math.pow(io, ((pos + 1) / 2).toDouble)
        val (kl, kr) =
          if (pos == 0) (1.0, 1.0)
          else if ((pos & 1) == 1) (f2, 1.0) else (1.0, f2)
        assert(d.spectral(i) == m(i) * kl, s"IS L at b=$b w=$w f=$f")
        assert(d.spectralRight(i) == m(i) * kr, s"IS R at b=$b w=$w f=$f")
      }
    }
  }

  test("flex encoder round-trips symmetric shapes against the existing encoders' decode") {
    val rnd = new scala.util.Random(75)
    // regression guard for the shared paths: a flex-encoded plain-stereo
    // long frame and a mixed (non-intensity) frame decode exactly
    val a = Array.fill(576)(rnd.nextInt(3) - 1)
    val b = Array.fill(576)(rnd.nextInt(3) - 1)
    val dLong = Mp3.decode(Mp3.encodeStereoFlex(a, b, 0, false, 0, false))
      .getOrElse(fail("long decode None"))
    (0 until 576).foreach { i =>
      assert(dLong.spectral(i) == a(i).toDouble)
      assert(dLong.spectralRight(i) == b(i).toDouble)
    }
    val dMix = Mp3.decode(Mp3.encodeStereoFlex(a, b, 2, true, 2, true))
      .getOrElse(fail("mixed decode None"))
    val ma = interleave(a, mixed = true)
    val mb = interleave(b, mixed = true)
    (0 until 576).foreach { i =>
      assert(dMix.spectral(i) == ma(i).toDouble, s"mixed L at $i")
      assert(dMix.spectralRight(i) == mb(i).toDouble, s"mixed R at $i")
    }
  }
}
