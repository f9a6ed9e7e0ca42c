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

  test("MIXED blocks round-trip: long head (lines 0..35) + short tail from band 3") {
    // huffman order for mixed: 36 long lines in natural order, then
    // short bands 3..12 band-major; the decoder must keep the head
    // unreordered and interleave the tail at 3f+w from freq 12
    val rnd = new scala.util.Random(33)
    val lines = Array.fill(576)(rnd.nextInt(3) - 1)
    val d = Mp3.decode(Mp3.encodeShort(lines, mixed = true))
      .getOrElse(fail("mixed decode returned None"))
    val edges = Mp3.SfbShort44
    val expect = new Array[Int](576)
    var src = 0
    (0 until 36).foreach { i => expect(i) = lines(src); src += 1 }
    for (b <- 3 until 13; w <- 0 until 3; f <- edges(b) until edges(b + 1)) {
      expect(3 * f + w) = lines(src); src += 1
    }
    assert(src == 576)
    assert(d.spectral.map(_.toInt).sameElements(expect),
      "mixed-block spectra differ from the reference layout")
    assert(d.pcm.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("a tone in the mixed long head lands in the bottom subbands") {
    val lines = new Array[Int](576)
    (18 until 36).foreach(i => lines(i) = if (i % 2 == 0) 1 else -1) // subband 1
    val d = Mp3.decode(Mp3.encodeShort(lines, mixed = true)).getOrElse(fail("None"))
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
    assert(total > 0)
    val inBand = mags.filter { case (k, _) => k >= n / 128 && k < n * 5 / 128 }
      .map(_._2).sum
    assert(inBand / total > 0.5, s"only ${inBand / total} near subband 1")
  }

  test("LSF short blocks stay declared seams (None, no throw)") {
    // a mixed flag on a NON-short block type (start) is undefined → None
    val frame = Mp3.encodeShort(Array.fill(576)(0), blockType = 1)
    val t0 = 32 + 18 + 36
    val tampered = frame.clone()
    tampered(t0 >> 3) = (tampered(t0 >> 3) | (1 << (7 - (t0 & 7)))).toByte
    assert(Mp3.decode(tampered).isEmpty, "mixed on a long block type must return None")
  }
}
