package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Mp3

/** r16 seam closures: LSF short/mixed blocks, LSF start/stop region
  * boundaries, MPEG-2.5 headers/band tables, and MPEG-1 short-block
  * intensity stereo (per-window bounds). Every expectation is computed
  * in the spec from the published layout rules — the decoder's reorder
  * is never trusted to check itself. */
class Mp3LsfSpec extends AnyFunSuite {

  // short-block band edges (Table B.8), duplicated here so the spec's
  // expected reorder is independent of the decoder's tables
  private val sbE44 = Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192)
  private val sbE22 = Array(0, 4, 8, 12, 18, 24, 32, 42, 56, 74, 100, 132, 174, 192)
  private val sbE8 = Array(0, 8, 16, 24, 36, 52, 72, 96, 124, 160, 162, 164, 166, 192)

  /** Band-major Huffman order → frequency-interleaved xr(3f+w); with
    * `mixed` the first `headLines` lines stay linear (36 = the 6-band
    * LSF head everywhere but 8 kHz, whose 12-wide bands make it 72)
    * and short starts at band 3. */
  private def interleave(huff: Array[Int], sbE: Array[Int],
                         mixed: Boolean = false,
                         headLines: Int = 36): Array[Int] = {
    val out = new Array[Int](576)
    var src = 0
    if (mixed) { (0 until headLines).foreach { i => out(i) = huff(src); src += 1 } }
    for (b <- (if (mixed) 3 else 0) until 13; w <- 0 until 3;
         f <- sbE(b) until sbE(b + 1)) {
      out(3 * f + w) = huff(src); src += 1
    }
    out
  }

  test("LSF short blocks round-trip through the band-major reorder (22.05 kHz)") {
    val rnd = new scala.util.Random(51)
    val huff = Array.fill(576)(rnd.nextInt(3) - 1)
    val d = Mp3.decode(Mp3.encodeLsfFrame(huff, blockType = 2))
      .getOrElse(fail("decode None"))
    assert(d.sampleRate == 22050 && d.nSamples == 576)
    val exp = interleave(huff, sbE22)
    (0 until 576).foreach { i =>
      assert(d.spectral(i) == exp(i).toDouble, s"xr mismatch at $i")
    }
  }

  test("LSF mixed blocks keep the 6-long-band head and reorder the short tail") {
    val rnd = new scala.util.Random(52)
    val huff = Array.fill(576)(rnd.nextInt(3) - 1)
    val d = Mp3.decode(Mp3.encodeLsfFrame(huff, blockType = 2, mixed = true))
      .getOrElse(fail("decode None"))
    val exp = interleave(huff, sbE22, mixed = true)
    (0 until 576).foreach { i =>
      assert(d.spectral(i) == exp(i).toDouble, s"xr mismatch at $i")
    }
  }

  test("LSF start/stop blocks split big-values regions at sfb(8) = 54, not 36") {
    // region0 through table 1 (capacity 1), region1 through table 7: a
    // decoder using the MPEG-1 literal 36 would decode lines 36..53 with
    // the wrong codebook and desync (advice r15)
    val rnd = new scala.util.Random(53)
    for (bt <- Seq(1, 3)) {
      val lines = Array.fill(576)(rnd.nextInt(3) - 1)
      val d = Mp3.decode(Mp3.encodeLsfFrame(lines, tables = (1, 7, 0),
          blockType = bt))
        .getOrElse(fail(s"decode None at blockType $bt"))
      (0 until 576).foreach { i =>
        assert(d.spectral(i) == lines(i).toDouble, s"bt $bt xr mismatch at $i")
      }
    }
  }

  test("MPEG-2.5 frames decode: 11.025 kHz long and 8 kHz short (region0 = 72)") {
    val rnd = new scala.util.Random(54)
    val lines = Array.fill(576)(rnd.nextInt(3) - 1)
    val d1 = Mp3.decode(Mp3.encodeLsfFrame(lines, mpeg25 = true, srIdx = 0))
      .getOrElse(fail("11.025 kHz decode None"))
    assert(d1.sampleRate == 11025 && d1.nSamples == 576)
    (0 until 576).foreach { i =>
      assert(d1.spectral(i) == lines(i).toDouble, s"11k xr mismatch at $i")
    }
    // 8 kHz long: the five 2-wide top bands are in the edge table
    val d8 = Mp3.decode(Mp3.encodeLsfFrame(lines, mpeg25 = true, srIdx = 2))
      .getOrElse(fail("8 kHz decode None"))
    assert(d8.sampleRate == 8000)
    (0 until 576).foreach { i =>
      assert(d8.spectral(i) == lines(i).toDouble, s"8k xr mismatch at $i")
    }
    // 8 kHz short: region0 is 3·sfbShort(3) = 72 lines
    val huff = Array.fill(576)(rnd.nextInt(3) - 1)
    val ds = Mp3.decode(Mp3.encodeLsfFrame(huff, blockType = 2,
        mpeg25 = true, srIdx = 2))
      .getOrElse(fail("8 kHz short decode None"))
    val exp = interleave(huff, sbE8)
    (0 until 576).foreach { i =>
      assert(ds.spectral(i) == exp(i).toDouble, s"8k short xr mismatch at $i")
    }
  }

  test("8 kHz mixed blocks: the 72-line head composes with short band 3 (former seam, r17)") {
    // at 8 kHz the 6-band LSF long head spans 6×12 = 72 lines — exactly
    // 3·sfbShort(3), so the long head and the short region tile 576
    // lines with no gap. Pre-fix the decoder refused the combination.
    val rnd = new scala.util.Random(56)
    val huff = Array.fill(576)(rnd.nextInt(3) - 1)
    val d = Mp3.decode(Mp3.encodeLsfFrame(huff, blockType = 2, mixed = true,
        mpeg25 = true, srIdx = 2))
      .getOrElse(fail("8 kHz mixed decode None"))
    assert(d.sampleRate == 8000 && d.nSamples == 576)
    val exp = interleave(huff, sbE8, mixed = true, headLines = 72)
    (0 until 576).foreach { i =>
      assert(d.spectral(i) == exp(i).toDouble, s"8k mixed xr mismatch at $i")
    }
  }

  test("8 kHz mixed head uses the LONG window: a subband-3 tone matches the pure-long frame") {
    // a single +1 at line 60 lies in subband 3 — inside the 72-line
    // head, OUTSIDE a 36-line one — and clear of the subband-4 alias
    // boundary (butterflies reach lines 64..79), so the mixed frame's
    // synthesis chain (alias inside the head, long IMDCT on subbands
    // 0..3) must produce PCM identical to a plain long-block frame;
    // a 36-line head would route the line through a short-window IMDCT
    val tone = new Array[Int](576)
    tone(60) = 1
    val dMixed = Mp3.decode(Mp3.encodeLsfFrame(tone, blockType = 2,
        mixed = true, mpeg25 = true, srIdx = 2))
      .getOrElse(fail("8 kHz mixed tone decode None"))
    val dLong = Mp3.decode(Mp3.encodeLsfFrame(tone, mpeg25 = true, srIdx = 2))
      .getOrElse(fail("8 kHz long tone decode None"))
    assert(dMixed.pcm.exists(_ != 0.0), "tone must reach the PCM")
    (0 until dMixed.nSamples).foreach { i =>
      assert(dMixed.pcm(i) == dLong.pcm(i), s"head-window pcm mismatch at $i")
    }
  }

  test("MPEG-2.5 stream frames sync-scan and decode in decodeStream") {
    val rnd = new scala.util.Random(55)
    val f1 = Mp3.encodeLsfFrame(Array.fill(576)(rnd.nextInt(3) - 1), mpeg25 = true)
    val f2 = Mp3.encodeLsfFrame(Array.fill(576)(rnd.nextInt(3) - 1), mpeg25 = true)
    val frames = Mp3.decodeStream(f1 ++ f2)
    assert(frames.length == 2)
    assert(frames.forall(d => d.sampleRate == 11025 && d.nSamples == 576))
  }

  test("short-block intensity: bands above each window's bound reconstruct from ch0") {
    val rnd = new scala.util.Random(56)
    // ch0: nonzero everywhere; ch1 coded through band 5 in every window
    // (bv1 = 45 → 90 band-major values = 3·sbE(6)), all nonzero → the
    // per-window bound is band 5; is_pos lives in bands 6..11 (slots for
    // bands <= 5 stay 0 — they double as real scalefactors there)
    val ch0h = Array.fill(576)(if (rnd.nextBoolean()) 1 else -1)
    val ch1h = Array.tabulate(576)(i => if (i < 90) (if (rnd.nextBoolean()) 1 else -1) else 0)
    val isPos = Array.tabulate(12, 3)((b, w) => if (b < 6) 0 else (b + w) % 7)
    val d = Mp3.decode(Mp3.encodeStereoShort(ch0h, ch1h,
        intensity = true, bv1 = 45, isPosSfS = isPos))
      .getOrElse(fail("decode None"))
    val m = interleave(ch0h, sbE44)
    val r1 = interleave(ch1h, sbE44)
    for (b <- 0 until 13; w <- 0 until 3; f <- sbE44(b) until sbE44(b + 1)) {
      val i = 3 * f + w
      if (b <= 5) {
        assert(d.spectral(i) == m(i).toDouble, s"below-bound L at b=$b w=$w f=$f")
        assert(d.spectralRight(i) == r1(i).toDouble, s"below-bound R at b=$b w=$w f=$f")
      } else {
        val pos = isPos(math.min(b, 11))(w) // remainder band 12 inherits 11
        val ratio = math.tan(pos * math.Pi / 12.0)
        assert(d.spectral(i) == m(i) * (ratio / (1.0 + ratio)), s"IS L at b=$b w=$w f=$f")
        assert(d.spectralRight(i) == m(i) * (1.0 / (1.0 + ratio)), s"IS R at b=$b w=$w f=$f")
      }
    }
  }

  test("short-block intensity bounds are PER WINDOW: an empty window band goes intensity") {
    // ch1's window 2 carries nothing in band 5 (its last coded band is
    // 4) while windows 0/1 fill band 5 — so (band 5, window 2) must be
    // intensity-processed while (band 5, windows 0/1) pass through
    val ch0h = Array.fill(576)(1)
    val ch1h = new Array[Int](576)
    // band-major fill: bands 0..5, skip band 5's window-2 values
    var src = 0
    for (b <- 0 until 6; w <- 0 until 3; f <- sbE44(b) until sbE44(b + 1)) {
      ch1h(src) = if (b == 5 && w == 2) 0 else 1
      src += 1
    }
    val isPos = Array.tabulate(12, 3)((b, w) =>
      if (b < 5) 0 else if (b == 5) (if (w == 2) 3 else 0) else 2)
    val d = Mp3.decode(Mp3.encodeStereoShort(ch0h, ch1h,
        intensity = true, bv1 = 45, isPosSfS = isPos))
      .getOrElse(fail("decode None"))
    val ratio = math.tan(3 * math.Pi / 12.0) // ≈ 1 (IEEE: 0.999…)
    for (f <- sbE44(5) until sbE44(6)) {
      // windows 0/1: pass-through (bound = 5)
      assert(d.spectral(3 * f + 0) == 1.0 && d.spectralRight(3 * f + 0) == 1.0)
      assert(d.spectral(3 * f + 1) == 1.0 && d.spectralRight(3 * f + 1) == 1.0)
      // window 2: intensity at is_pos 3 → the decoder's exact IEEE split
      assert(d.spectral(3 * f + 2) == ratio / (1.0 + ratio), s"w2 L at f=$f")
      assert(d.spectralRight(3 * f + 2) == 1.0 / (1.0 + ratio), s"w2 R at f=$f")
    }
  }

  test("short-block intensity: is_pos = 7 passes the band through") {
    val ch0h = Array.fill(576)(1)
    val ch1h = Array.tabulate(576)(i => if (i < 90) 1 else 0)
    val isPos = Array.tabulate(12, 3)((b, _) => if (b < 6) 0 else 7)
    val d = Mp3.decode(Mp3.encodeStereoShort(ch0h, ch1h,
        intensity = true, bv1 = 45, isPosSfS = isPos))
      .getOrElse(fail("decode None"))
    for (b <- 6 until 13; w <- 0 until 3; f <- sbE44(b) until sbE44(b + 1)) {
      val i = 3 * f + w
      assert(d.spectral(i) == 1.0, s"L at $i")
      assert(d.spectralRight(i) == 0.0, s"R at $i")
    }
  }

  // LSF long-block band edges at 22.05 kHz (Table B.8), duplicated so
  // the intensity expectations are independent of the decoder's tables
  private val lfE22 = Array(0, 6, 12, 18, 24, 30, 36, 44, 54, 66, 80, 96,
    116, 140, 168, 200, 238, 284, 336, 396, 464, 522, 576)

  test("LSF long-block intensity: the 13818-3 io^((is_pos+1)/2) scheme (former seam, r17)") {
    // ch1 coded to line 100 (bv1 = 50) → rzero = 100 → bound = first LSF
    // band edge > 100 = 116 (band 12). is_pos per band: odd scales the
    // LEFT channel by io^((is_pos+1)/2), even scales the RIGHT by
    // io^(is_pos/2), 0 passes m to both, 7 (all-ones at slen 3) is the
    // illegal marker → pass-through. Both intensity_scale values.
    val rnd = new scala.util.Random(71)
    val ch0 = Array.fill(576)(rnd.nextInt(3) - 1)
    val ch1 = Array.tabulate(576)(i => if (i < 100) rnd.nextInt(3) - 1 else 0)
    val isPos = Array.tabulate(21) { b =>
      if (b < 12) 0
      else if (b == 12) 1 else if (b == 13) 2 else if (b == 14) 3
      else if (b == 15) 0 else if (b == 16) 7 else 4
    }
    for (isScale <- 0 to 1) {
      val d = Mp3.decode(Mp3.encodeLsfStereo(ch0, ch1, msJoint = false,
          intensity = true, bv1 = 50, isPosSf = isPos, isScale = isScale))
        .getOrElse(fail(s"decode None at isScale=$isScale"))
      assert(d.sampleRate == 22050 && d.nChannels == 2)
      val io = if (isScale == 1) math.pow(2.0, -0.5) else math.pow(2.0, -0.25)
      (0 until 576).foreach { i =>
        val band = lfE22.lastIndexWhere(_ <= i)
        if (i < 116) {
          assert(d.spectral(i) == ch0(i).toDouble, s"below-bound L at $i")
          assert(d.spectralRight(i) == ch1(i).toDouble, s"below-bound R at $i")
        } else {
          val pos = isPos(math.min(band, 20)) // sfb21 inherits band 20
          val (kl, kr) =
            if (pos == 7) (-1.0, -1.0) // illegal: pass-through
            else if (pos == 0) (1.0, 1.0)
            else {
              val f = math.pow(io, ((pos + 1) / 2).toDouble)
              if (pos % 2 == 1) (f, 1.0) else (1.0, f)
            }
          if (pos == 7) {
            assert(d.spectral(i) == ch0(i).toDouble, s"illegal L at $i")
            assert(d.spectralRight(i) == 0.0, s"illegal R at $i")
          } else {
            assert(math.abs(d.spectral(i) - ch0(i) * kl) < 1e-12, s"IS L at $i")
            assert(math.abs(d.spectralRight(i) - ch0(i) * kr) < 1e-12, s"IS R at $i")
          }
        }
      }
    }
  }

  test("LSF intensity illegal is_pos falls back to MS when MS is on") {
    val ch0 = Array.fill(576)(1)
    val ch1 = Array.tabulate(576)(i => if (i < 100) 1 else 0)
    val isPos = Array.tabulate(21)(b => if (b >= 12) 7 else 0)
    val d = Mp3.decode(Mp3.encodeLsfStereo(ch0, ch1, msJoint = true,
        intensity = true, bv1 = 50, isPosSf = isPos))
      .getOrElse(fail("decode None"))
    val inv = 1.0 / math.sqrt(2.0)
    (0 until 576).foreach { i =>
      if (i < 116) { // MS region: l = (m+s)/√2, r = (m−s)/√2
        assert(math.abs(d.spectral(i) - (ch0(i) + ch1(i)) * inv) < 1e-12, s"MS L at $i")
        assert(math.abs(d.spectralRight(i) - (ch0(i) - ch1(i)) * inv) < 1e-12, s"MS R at $i")
      } else { // illegal is_pos + MS on → the band is MS (s = 0)
        assert(math.abs(d.spectral(i) - inv) < 1e-12, s"fallback L at $i")
        assert(math.abs(d.spectralRight(i) - inv) < 1e-12, s"fallback R at $i")
      }
    }
  }

  test("LSF SHORT-block intensity: per-window bounds with the 13818-3 scaling") {
    // ch1's short windows coded to different extents via bv1; window
    // bounds are per-window (the value-scan rule). ch1 carries data only
    // in windows 0..2 of bands 0..5 → every window's bound is band 5;
    // bands 6..12 are intensity with is_pos from ch1's short
    // scalefactors (band-major slots, slens (3,3,3) from the i-stereo
    // {12,12,12} partition).
    val rnd = new scala.util.Random(72)
    // band-major Huffman order: ch1 nonzero only in bands 0..5
    val bv1Lines = 3 * sbE22(6) // lines through band 5 in every window
    val huff0 = Array.fill(576)(rnd.nextInt(3) - 1)
    val huff1 = Array.tabulate(576)(i => if (i < bv1Lines) rnd.nextInt(3) - 1 else 0)
    val isPosS = Array.tabulate(12, 3)((b, w) =>
      if (b < 6) 0 else ((b + w) % 6) + 1) // 1..6, never 7
    val d = Mp3.decode(Mp3.encodeStereoShort(huff0, huff1,
        intensity = true, bv1 = bv1Lines / 2, isPosSfS = isPosS,
        lsf = true, isScale = 1))
      .getOrElse(fail("decode None"))
    assert(d.sampleRate == 22050)
    val io = math.pow(2.0, -0.5)
    val exp0 = interleave(huff0, sbE22)
    val exp1 = interleave(huff1, sbE22)
    // per-window last nonzero ch1 band (the decoder's value-scan bound)
    val maxBand = Array(-1, -1, -1)
    for (b <- 0 until 13; w <- 0 until 3; f <- sbE22(b) until sbE22(b + 1))
      if (exp1(3 * f + w) != 0 && b > maxBand(w)) maxBand(w) = b
    for (b <- 0 until 13; w <- 0 until 3; f <- sbE22(b) until sbE22(b + 1)) {
      val i = 3 * f + w
      if (b <= maxBand(w)) {
        assert(d.spectral(i) == exp0(i).toDouble, s"below-bound L at $i")
        assert(d.spectralRight(i) == exp1(i).toDouble, s"below-bound R at $i")
      } else {
        val pos = isPosS(math.min(b, 11))(w)
        val f2 = math.pow(io, ((pos + 1) / 2).toDouble)
        val (kl, kr) = if (pos == 0) (1.0, 1.0)
          else if (pos % 2 == 1) (f2, 1.0) else (1.0, f2)
        assert(math.abs(d.spectral(i) - exp0(i) * kl) < 1e-12, s"IS L at $i win $w band $b")
        assert(math.abs(d.spectralRight(i) - exp0(i) * kr) < 1e-12, s"IS R at $i win $w band $b")
      }
    }
  }
}
