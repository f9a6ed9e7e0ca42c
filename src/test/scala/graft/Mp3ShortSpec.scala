package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Mp3

/** Short-block (window_switching) decode path: reorder + per-window
  * requantization + the 12-point IMDCT triplets, plus the start/stop
  * hybrid windows. */
class Mp3ShortSpec extends AnyFunSuite {

  /** Independent band-major → frequency-interleaved reorder (the spec's
    * short-block layout), mirroring what the decoder must produce. */
  private def reorder(huffOrder: Array[Int]): Array[Int] = {
    val edges = Mp3.SfbShort44
    val out = new Array[Int](576)
    var src = 0
    for (b <- 0 until 13; w <- 0 until 3; f <- edges(b) until edges(b + 1)) {
      out(3 * f + w) = huffOrder(src)
      src += 1
    }
    out
  }

  test("short-block frame round-trips through reorder + requantization exactly") {
    val rnd = new scala.util.Random(31)
    val lines = Array.fill(576)(rnd.nextInt(3) - 1)
    val d = Mp3.decode(Mp3.encodeShort(lines)).getOrElse(fail("decode returned None"))
    val expect = reorder(lines).map(_.toDouble)
    assert(d.spectral.sameElements(expect),
      "short-block spectral lines differ from the reference reorder")
    assert(d.pcm.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("start/stop window frames (block_type 1/3) round-trip the long layout") {
    val rnd = new scala.util.Random(32)
    for (bt <- Seq(1, 3)) {
      val lines = Array.fill(576)(rnd.nextInt(3) - 1)
      val d = Mp3.decode(Mp3.encodeShort(lines, blockType = bt))
        .getOrElse(fail(s"decode failed for block_type $bt"))
      // long spectral layout: no reorder
      assert(d.spectral.map(_.toInt).sameElements(lines),
        s"block_type $bt spectral mismatch")
      assert(d.pcm.forall(x => !x.isNaN && !x.isInfinite))
    }
  }

  test("a tone in one short band lands its PCM energy in the right subband") {
    // all three windows carry the same frequencies 36..39 (short band 6)
    // → subband 6 of 32; the three 12-point IMDCTs must place the energy
    // near normalized frequency [6/64, 7/64)
    val edges = Mp3.SfbShort44
    val lines = new Array[Int](576)
    var src = 0
    for (b <- 0 until 13; w <- 0 until 3; f <- edges(b) until edges(b + 1)) {
      if (f >= 36 && f < 40) lines(src) = if (f % 2 == 0) 1 else -1
      src += 1
    }
    val d = Mp3.decode(Mp3.encodeShort(lines)).getOrElse(fail("decode failed"))
    val n = d.pcm.length
    val mags = (1 until n / 2).map { k =>
      var re = 0.0; var im = 0.0; var t = 0
      while (t < n) {
        val a = 2.0 * math.Pi * k * t / n
        re += d.pcm(t) * math.cos(a); im -= d.pcm(t) * math.sin(a)
        t += 1
      }
      (k, re * re + im * im)
    }
    val total = mags.map(_._2).sum
    assert(total > 0, "tone produced an all-zero PCM signal")
    // subband 6 spans [6/64, 7/64); short windows smear, allow ±1 band
    val inBand = mags.filter { case (k, _) =>
      k >= n * 5 / 128 && k < n * 15 / 128
    }.map(_._2).sum
    assert(inBand / total > 0.5, s"only ${inBand / total} of energy near subband 6")
  }

  test("mixed blocks and LSF short blocks stay declared seams (None, no throw)") {
    val frame = Mp3.encodeShort(Array.fill(576)(0))
    // flip mixed_block_flag: granule0 side info starts at bit 32+18; the
    // wsf bit sits after part23(12)+bv(9)+gg(8)+sfc(4) → mixed is at
    // +34 bits (12+9+8+4+1[wsf]+2[bt] = 36 ... position 36)
    val t0 = 32 + 18 + 36
    val tampered = frame.clone()
    tampered(t0 >> 3) = (tampered(t0 >> 3) | (1 << (7 - (t0 & 7)))).toByte
    assert(Mp3.decode(tampered).isEmpty, "mixed blocks must return None")
  }
}
