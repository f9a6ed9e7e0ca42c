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

  test("intensity stereo stays a declared seam (None, no throw)") {
    val frame = Mp3.encodeStereo(Array.fill(576)(0), Array.fill(576)(0), msJoint = true)
    // set mode_ext bit 0 (intensity): header byte 3, bits 4-5 = mode_ext
    val tampered = frame.clone()
    tampered(3) = (tampered(3) | 0x10).toByte
    assert(Mp3.decode(tampered).isEmpty, "intensity stereo must return None")
  }
}
