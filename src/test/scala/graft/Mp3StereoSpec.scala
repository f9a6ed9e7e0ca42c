package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Mp3

/** Stereo decode: dual-channel side info (32 bytes, gr/ch granule
  * order), per-channel granule decode, MS joint-stereo reconstruction,
  * and the mono-downmix API contract. */
class Mp3StereoSpec extends AnyFunSuite {

  test("plain stereo (mode 0) round-trips both channels' spectra exactly") {
    val rnd = new scala.util.Random(41)
    val ch0 = Array.fill(576)(rnd.nextInt(3) - 1)
    val ch1 = Array.fill(576)(rnd.nextInt(3) - 1)
    val d = Mp3.decode(Mp3.encodeStereo(ch0, ch1)).getOrElse(fail("decode None"))
    assert(d.nChannels == 2 && d.nSamples == 1152)
    assert(d.spectral.map(_.toInt).sameElements(ch0), "left spectra differ")
    assert(d.spectralRight.map(_.toInt).sameElements(ch1), "right spectra differ")
    assert(d.pcm.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("MS joint stereo reconstructs L = (M+S)/sqrt2, R = (M-S)/sqrt2") {
    val rnd = new scala.util.Random(42)
    val m = Array.fill(576)(rnd.nextInt(3) - 1)
    val sArr = Array.fill(576)(rnd.nextInt(3) - 1)
    val d = Mp3.decode(Mp3.encodeStereo(m, sArr, msJoint = true))
      .getOrElse(fail("decode None"))
    val inv = 1.0 / math.sqrt(2.0)
    (0 until 576).foreach { i =>
      assert(d.spectral(i) == (m(i) + sArr(i)) * inv, s"L mismatch at $i")
      assert(d.spectralRight(i) == (m(i) - sArr(i)) * inv, s"R mismatch at $i")
    }
  }

  test("identical channels downmix to the mono frame's PCM") {
    // L == R ⇒ the stereo downmix must equal the mono decode of the
    // same lines (same synthesis chain per channel, averaged)
    val rnd = new scala.util.Random(43)
    val lines = Array.fill(576)(rnd.nextInt(3) - 1)
    val stereo = Mp3.decode(Mp3.encodeStereo(lines, lines)).getOrElse(fail("None"))
    val mono = Mp3.decode(Mp3.encode(lines)).getOrElse(fail("None"))
    // mono gate frames use table 1 vs stereo's table 7 — spectra equal,
    // so PCM must match to float identity
    assert(stereo.spectral.sameElements(mono.spectral))
    (0 until 1152).foreach { i =>
      assert(math.abs(stereo.pcm(i) - mono.pcm(i)) < 1e-12, s"pcm differs at $i")
    }
  }

  test("intensity stereo reconstructs bands above the right channel's rzero bound") {
    // ch1 coded only to line 100 (bv1 = 50) → rzero = 100 → the
    // intensity region starts at the next band edge, line 110 (44.1 kHz
    // long band 14). is_pos lives in ch1's scalefactors: band 14 → 3
    // (ratio = tan(π/4) = 1 → l = r = m/2), bands 15+ → 2.
    val rnd = new scala.util.Random(44)
    val ch0 = Array.fill(576)(rnd.nextInt(3) - 1)
    val ch1 = Array.tabulate(576)(i => if (i < 100) rnd.nextInt(3) - 1 else 0)
    val isPos = Array.tabulate(21)(b => if (b < 14) 0 else if (b == 14) 3 else 2)
    val d = Mp3.decode(Mp3.encodeStereo(ch0, ch1, msJoint = false,
        intensity = true, bv1 = 50, isPosSf = isPos))
      .getOrElse(fail("decode None"))
    val edges = Mp3.SfbLong44
    (0 until 576).foreach { i =>
      val band = edges.lastIndexWhere(_ <= i)
      if (i < 110) {
        assert(d.spectral(i) == ch0(i).toDouble, s"below-bound L at $i")
        assert(d.spectralRight(i) == ch1(i).toDouble, s"below-bound R at $i")
      } else {
        val pos = isPos(math.min(band, 20)) // sfb21 inherits band 20
        val ratio = math.tan(pos * math.Pi / 12.0)
        assert(d.spectral(i) == ch0(i) * (ratio / (1.0 + ratio)), s"IS L at $i")
        assert(d.spectralRight(i) == ch0(i) * (1.0 / (1.0 + ratio)), s"IS R at $i")
      }
    }
  }

  test("rzero inside band 21 means NO intensity: right lines 418..575 survive") {
    // bv1 = 250 → ch1's rzero = 500, inside the last scalefactor band
    // (418..576). The intensity bound is then sfb(22) = 576 — no band is
    // intensity-processed — NOT a clamp to sfb(21) = 418 that would
    // overwrite genuinely coded right-channel lines (advice r15).
    val rnd = new scala.util.Random(46)
    val ch0 = Array.fill(576)(rnd.nextInt(3) - 1)
    // nonzero right-channel content only below band 20 (ch1 scalefactors
    // double as REAL scalefactors below the bound, so they stay 0 there);
    // band 20 carries is_pos = 3 — the value band 21 would inherit if the
    // old 418 clamp (wrongly) intensity-processed it
    val ch1 = Array.tabulate(576)(i => if (i < 342) rnd.nextInt(3) - 1 else 0)
    val isPos = Array.tabulate(21)(b => if (b == 20) 3 else 0)
    val d = Mp3.decode(Mp3.encodeStereo(ch0, ch1, msJoint = false,
        intensity = true, bv1 = 250, isPosSf = isPos))
      .getOrElse(fail("decode None"))
    (0 until 576).foreach { i =>
      assert(d.spectral(i) == ch0(i).toDouble, s"L pass-through at $i")
      assert(d.spectralRight(i) == ch1(i).toDouble, s"R pass-through at $i")
    }
  }

  test("is_pos = 7 is illegal: the band passes through unprocessed") {
    val ch0 = Array.fill(576)(1)
    val ch1 = Array.tabulate(576)(i => if (i < 100) 1 else 0)
    val isPos = Array.tabulate(21)(b => if (b >= 14) 7 else 0)
    val d = Mp3.decode(Mp3.encodeStereo(ch0, ch1, msJoint = false,
        intensity = true, bv1 = 50, isPosSf = isPos))
      .getOrElse(fail("decode None"))
    // with MS off and every intensity band at the illegal position, the
    // spectra must be exactly the per-channel decodes (L = ch0, R = 0
    // in the rzero tail)
    (110 until 576).foreach { i =>
      assert(d.spectral(i) == 1.0, s"L at $i")
      assert(d.spectralRight(i) == 0.0, s"R at $i")
    }
  }
}
