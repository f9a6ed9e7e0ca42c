package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Vorbis

/** Vorbis I + Ogg gates (r16). Every expectation here is computed by
  * the spec from the published layout rules — the byte→entry mapping,
  * the partition layout, the square-polar coupling rule, and an
  * independently-written IMDCT/window/overlap chain — never by trusting
  * the decoder to check itself. */
class VorbisSpec extends AnyFunSuite {

  private val n2 = 128 // blocksize 256

  /** Expected channel-interleaved residue vector of packet `p` (size
    * `size`): partition 0 zero, partitions 1+ carry the VQ entry pairs
    * in transmission order. */
  private def expectedVector(data: Array[Byte], p: Int, size: Int,
                             per: Int): Array[Int] = {
    val out = new Array[Int](size)
    var src = p * per
    var part = 1
    while (part < size / 8) {
      var t = 0
      while (t < 4) {
        val e = (data(src % data.length) & 0xff) % 8
        src += 1
        out(part * 8 + 2 * t) = Vorbis.EntryA(e)
        out(part * 8 + 2 * t + 1) = Vorbis.EntryB(e)
        t += 1
      }
      part += 1
    }
    out
  }

  test("canonical codeword assignment: lowest prefix-free code per entry, in order") {
    // lengths (1,3,2,3): e0 -> 0; e1 len3 -> 100; e2 len2 -> 11 (10 is
    // 100's prefix); e3 -> 101. Kraft sum exactly 1.
    val codes = Vorbis.assignCodewords(Array(1, 3, 2, 3))
    assert(codes.toSeq == Seq(0, 4, 3, 5))
    // sparse entries (length 0) get no codeword
    val sp = Vorbis.assignCodewords(Array(1, 0, 1))
    assert(sp(0) == 0 && sp(1) == -1 && sp(2) == 1)
    // overpopulated tree is rejected
    assert(Vorbis.assignCodewords(Array(1, 1, 1)) == null)
  }

  test("Ogg page round trip, CRC, and continued-packet reassembly") {
    import Vorbis.Ogg
    val p1 = Array.tabulate(100)(_.toByte)
    val p2 = Array.tabulate(600)(i => (i * 7).toByte) // needs 255+255+90 lacing
    val page = Ogg.page(Seq(p1, p2), serial = 9, seq = 0, granule = 5L, htype = 2)
    val back = Ogg.packets(page)
    assert(back.length == 2)
    assert(back(0).sameElements(p1) && back(1).sameElements(p2))
    // CRC: flipping one body byte must reject the page (raw packets()
    // throws the internal Malformed; decode() maps it to None)
    val bad = page.clone(); bad(page.length - 1) = (bad(page.length - 1) ^ 1).toByte
    assertThrows[RuntimeException](Ogg.packets(bad))
    // continued packet across two pages, hand-rolled lacing: page A ends
    // open (all-255 lacing), page B starts with the continuation flag
    val long = Array.tabulate(300)(i => (i * 3).toByte)
    val segA = long.take(255); val segB = long.drop(255) // 45 bytes
    def manual(htype: Int, seq: Int, lacing: Seq[Int], body: Array[Byte]): Array[Byte] = {
      val head = java.nio.ByteBuffer.allocate(27 + lacing.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      head.put("OggS".getBytes("US-ASCII")); head.put(0.toByte); head.put(htype.toByte)
      head.putLong(0L); head.putInt(9); head.putInt(seq); head.putInt(0)
      head.put(lacing.length.toByte); lacing.foreach(l => head.put(l.toByte))
      val pg = head.array() ++ body
      val c = Ogg.crc(pg)
      pg(22) = (c & 0xff).toByte; pg(23) = ((c >> 8) & 0xff).toByte
      pg(24) = ((c >> 16) & 0xff).toByte; pg(25) = ((c >> 24) & 0xff).toByte
      pg
    }
    val pgA = manual(0, 1, Seq(255), segA)       // open packet (no terminator)
    val pgB = manual(1, 2, Seq(45), segB)        // continued
    val re = Ogg.packets(pgA ++ pgB)
    assert(re.length == 1 && re(0).sameElements(long))
  }

  test("mono stream: spectral = the transmitted VQ integers (flat floor is exactly 1.0)") {
    val rnd = new scala.util.Random(61)
    val data = Array.fill(200)(rnd.nextInt(256).toByte)
    val d = Vorbis.decode(Vorbis.encode(data, nPackets = 2))
      .getOrElse(fail("decode None"))
    assert(d.sampleRate == 8000 && d.channels == 1 && d.nPackets == 2)
    val exp = expectedVector(data, 0, n2, Vorbis.entriesPerPacket(stereo = false))
    (0 until n2).foreach { i =>
      assert(d.spectral(i) == exp(i).toDouble, s"spectral mismatch at $i")
    }
    // 2 packets, first primes: one lapped block of output
    assert(d.nSamples == n2)
    assert(d.pcm.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("PCM equals an independently computed IMDCT/window/overlap chain") {
    val rnd = new scala.util.Random(62)
    val data = Array.fill(300)(rnd.nextInt(256).toByte)
    val nPk = 3
    val d = Vorbis.decode(Vorbis.encode(data, nPackets = nPk))
      .getOrElse(fail("decode None"))
    assert(d.nSamples == (nPk - 1) * n2)
    val n = 2 * n2
    val win = Array.tabulate(n) { i =>
      val s = math.sin(math.Pi / n * (i + 0.5))
      math.sin(math.Pi / 2 * s * s)
    }
    // TDAC (Princen-Bradley): w(i)^2 + w(i + n/2)^2 = 1
    (0 until n2).foreach { i =>
      assert(math.abs(win(i) * win(i) + win(n2 + i) * win(n2 + i) - 1.0) < 1e-12)
    }
    val per = Vorbis.entriesPerPacket(stereo = false)
    def imdctWin(x: Array[Int]): Array[Double] =
      Array.tabulate(n) { j =>
        var s = 0.0
        var k = 0
        while (k < n2) {
          s += x(k) * math.cos(2.0 * math.Pi / n * (j + 0.5 + n / 4.0) * (k + 0.5))
          k += 1
        }
        s * win(j)
      }
    var prevRight: Array[Double] = null
    val expected = scala.collection.mutable.ArrayBuffer.empty[Double]
    (0 until nPk).foreach { p =>
      val y = imdctWin(expectedVector(data, p, n2, per))
      if (prevRight != null)
        (0 until n2).foreach(i => expected += prevRight(i) + y(i))
      prevRight = y.drop(n2)
    }
    (0 until d.nSamples).foreach { i =>
      assert(math.abs(d.pcm(i) - expected(i)) < 1e-9, s"pcm mismatch at $i")
    }
  }

  test("stereo: residue type 2 deinterleave + square-polar inverse coupling") {
    val rnd = new scala.util.Random(63)
    val data = Array.fill(400)(rnd.nextInt(256).toByte)
    val d = Vorbis.decode(Vorbis.encode(data, nPackets = 2, stereo = true))
      .getOrElse(fail("decode None"))
    assert(d.channels == 2 && d.nPackets == 2)
    val combined = expectedVector(data, 0, 2 * n2,
      Vorbis.entriesPerPacket(stereo = true))
    // spec square-polar: M = combined(2i), A = combined(2i+1)
    val expCh0 = Array.tabulate(n2) { i =>
      val m = combined(2 * i).toDouble; val a = combined(2 * i + 1).toDouble
      if (m > 0) { if (a > 0) m else m + a }
      else { if (a > 0) m else m - a }
    }
    (0 until n2).foreach { i =>
      assert(d.spectral(i) == expCh0(i), s"ch0 spectral mismatch at $i")
    }
    assert(d.pcm.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("floor1 renders a non-flat curve through the Bresenham line (library path)") {
    // drive the floor machinery off the flat pin: hand-build a stream
    // whose floor differs per spec? The public encoder pins the floor;
    // the non-flat path is covered through the inverse-dB table shape:
    // the table is geometric with ratio exp(0.0629717) and endpoint
    // exactly 1.0 (entry 255) / 1.0649863e-07 (entry 0, the published
    // landmark rounded to float32).
    assert(Vorbis.InverseDb(255) == 1.0)
    assert(math.abs(Vorbis.InverseDb(0) - 1.0649863e-07) < 1e-13)
    val step = -math.log(1.0649863e-07) / 255.0
    val ratio = Vorbis.InverseDb(100) / Vorbis.InverseDb(99)
    assert(math.abs(ratio - math.exp(step)) < 1e-6)
    (1 until 256).foreach(i => assert(Vorbis.InverseDb(i) > Vorbis.InverseDb(i - 1)))
  }

  test("non-flat floor: decoded spectrum = independently rendered curve × residue") {
    // posts (200, 100, 13): the interior post at x = 64 is predicted from
    // the endpoints and moved by the transmitted 13 per the spec's
    // even/odd offset rule; the spec renders the two Bresenham segments
    // itself and multiplies the expected residue integers
    val rnd = new scala.util.Random(65)
    val data = Array.fill(150)(rnd.nextInt(256).toByte)
    val (y0, y1, v) = (200, 100, 13)
    val d = Vorbis.decode(Vorbis.encode(data, nPackets = 2,
        floorPosts = (y0, y1, v)))
      .getOrElse(fail("decode None"))
    // spec-side floor synthesis (multiplier 1, range 256, X = [0,128,64])
    def renderPoint(x0: Int, yy0: Int, x1: Int, yy1: Int, x: Int): Int = {
      val dy = yy1 - yy0
      val off = math.abs(dy) * (x - x0) / (x1 - x0)
      if (dy < 0) yy0 - off else yy0 + off
    }
    val pred = renderPoint(0, y0, 128, y1, 64)
    val room = 2 * math.min(256 - pred, pred)
    val fy2 =
      if (v >= room) { if (256 - pred > pred) v - pred + pred else pred - (v - (256 - pred)) - 1 }
      else if (v % 2 == 1) pred - ((v + 1) / 2)
      else pred + v / 2
    val floorCurve = new Array[Double](n2)
    def renderLine(x0: Int, yy0: Int, x1: Int, yy1: Int): Unit = {
      val dy = yy1 - yy0; val adx = x1 - x0; var ady = math.abs(dy)
      val base = dy / adx; var y = yy0; var err = 0
      val sy = if (dy < 0) base - 1 else base + 1
      ady -= math.abs(base) * adx
      if (x0 < n2) floorCurve(x0) = Vorbis.InverseDb(y & 255)
      var x = x0 + 1
      while (x < math.min(x1, n2)) {
        err += ady
        if (err >= adx) { err -= adx; y += sy } else y += base
        floorCurve(x) = Vorbis.InverseDb(y & 255)
        x += 1
      }
    }
    renderLine(0, y0, 64, fy2)
    renderLine(64, fy2, 128, y1)
    val res = expectedVector(data, 0, n2, Vorbis.entriesPerPacket(stereo = false))
    (0 until n2).foreach { i =>
      assert(d.spectral(i) == floorCurve(i) * res(i), s"spectral mismatch at $i")
    }
  }

  test("ordered + sparse codebooks and the lookup-1 lattice decode through the general parser") {
    // the lattice stream transmits: a SPARSE floor book (odd entries
    // unused), an ORDERED-coded value book, and lookup type 1 (3x3
    // lattice over mults [0,1,2] with min -1) — the three header paths
    // the explicit-book stream never touches
    val rnd = new scala.util.Random(66)
    val data = Array.fill(200)(rnd.nextInt(256).toByte)
    val d = Vorbis.decode(Vorbis.encode(data, nPackets = 2, lattice = true))
      .getOrElse(fail("decode None"))
    assert(d.nPackets == 2 && d.nSamples == n2)
    // expected spectral: entry e = byte mod 9 → lattice pair
    val exp = new Array[Int](n2)
    var src = 0
    var part = 1
    while (part < n2 / 8) {
      var t = 0
      while (t < 4) {
        val e = (data(src % data.length) & 0xff) % 9
        src += 1
        exp(part * 8 + 2 * t) = Vorbis.latticeA(e)
        exp(part * 8 + 2 * t + 1) = Vorbis.latticeB(e)
        t += 1
      }
      part += 1
    }
    (0 until n2).foreach { i =>
      assert(d.spectral(i) == exp(i).toDouble, s"lattice spectral mismatch at $i")
    }
  }

  test("decode never throws on corrupt, truncated, or arbitrary bytes") {
    val rnd = new scala.util.Random(64)
    val good = Vorbis.encode(Array.fill(100)(rnd.nextInt(256).toByte), 2)
    assert(Vorbis.decode(good).isDefined)
    // flip every byte, one at a time, over a sample of positions
    (0 until good.length by 7).foreach { i =>
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      Vorbis.decode(bad) // must not throw (None or partial both fine)
    }
    (0 until 50).foreach { _ =>
      Vorbis.decode(Array.fill(rnd.nextInt(800))(rnd.nextInt(256).toByte))
    }
    // truncation at every page boundary region
    (0 until good.length by 13).foreach(i => Vorbis.decode(good.take(i)))
  }

  test("coupled stereo with an UNUSED angle-channel floor decodes to a zero channel (advice r16)") {
    // spec §4.3.6: a channel whose floor is unused renders all zeros even
    // when coupling revives its residue vector. Pre-fix this NPE'd past
    // the decoder's catch list (floorOut(ch) == null at the dot product).
    val rnd = new scala.util.Random(67)
    val data = Array.fill(400)(rnd.nextInt(256).toByte)
    val d = Vorbis.decode(Vorbis.encode(data, nPackets = 2, stereo = true,
        unusedFloorCh = 1))
      .getOrElse(fail("decode None — unused coupled floor must not kill the stream"))
    assert(d.channels == 2 && d.nPackets == 2)
    // ch0's floor is live: its spectrum is the coupled magnitude exactly
    // as in the both-floors-live stereo test
    val combined = expectedVector(data, 0, 2 * n2,
      Vorbis.entriesPerPacket(stereo = true))
    val expCh0 = Array.tabulate(n2) { i =>
      val m = combined(2 * i).toDouble; val a = combined(2 * i + 1).toDouble
      if (m > 0) { if (a > 0) m else m + a }
      else { if (a > 0) m else m - a }
    }
    (0 until n2).foreach { i =>
      assert(d.spectral(i) == expCh0(i), s"ch0 spectral mismatch at $i")
    }
    // downmix stays finite (ch1 contributes exact zeros)
    assert(d.pcm.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("codebook claiming a huge entry count fails fast without allocation (advice r16)") {
    // patch the setup packet's first codebook entry count (24 bits at
    // packet bytes 13..15, after \x05vorbis + count byte + BCV + dims)
    // to 2^24-1: decode must return None quickly instead of attempting
    // the ~GB codeword/trie allocations the claimed size implies
    val good = Vorbis.encode(Array.fill(64)(1.toByte), 2)
    val pkts = Vorbis.Ogg.packets(good)
    val setup = pkts(2).clone()
    setup(13) = 0xff.toByte; setup(14) = 0xff.toByte; setup(15) = 0xff.toByte
    val serial = 0x67726166
    val rebuilt = Vorbis.Ogg.page(Seq(pkts(0)), serial, 0, 0L, 2) ++
      Vorbis.Ogg.page(Seq(pkts(1), setup), serial, 1, 0L, 0) ++
      Vorbis.Ogg.page(Seq(pkts(3)), serial, 2, 128L, 0)
    val t0 = System.nanoTime()
    assert(Vorbis.decode(rebuilt).isEmpty)
    assert((System.nanoTime() - t0) < 2e9, "oversized codebook must fail fast")
    // and an entry count whose 5-bit lengths exceed the packet's bit
    // budget (claims 2^17 entries in a few-hundred-byte packet) also
    // refuses before scanning
    val setup2 = pkts(2).clone()
    setup2(13) = 0.toByte; setup2(14) = 0.toByte; setup2(15) = 2.toByte // 2^17
    val rebuilt2 = Vorbis.Ogg.page(Seq(pkts(0)), serial, 0, 0L, 2) ++
      Vorbis.Ogg.page(Seq(pkts(1), setup2), serial, 1, 0L, 0) ++
      Vorbis.Ogg.page(Seq(pkts(3)), serial, 2, 128L, 0)
    assert(Vorbis.decode(rebuilt2).isEmpty)
  }

  test("orphaned continuation page: data discarded to the packet boundary (advice r16)") {
    import Vorbis.Ogg
    // a continued page arriving with NO open partial (mid-stream join /
    // dropped page): RFC 3533 discards until the next packet boundary —
    // pre-fix the orphan bytes were emitted as a fake packet that shifts
    // positional header indexing
    def manual(htype: Int, seq: Int, lacing: Seq[Int], body: Array[Byte]): Array[Byte] = {
      val head = java.nio.ByteBuffer.allocate(27 + lacing.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      head.put("OggS".getBytes("US-ASCII")); head.put(0.toByte); head.put(htype.toByte)
      head.putLong(0L); head.putInt(9); head.putInt(seq); head.putInt(0)
      head.put(lacing.length.toByte); lacing.foreach(l => head.put(l.toByte))
      val pg = head.array() ++ body
      val c = Ogg.crc(pg)
      pg(22) = (c & 0xff).toByte; pg(23) = ((c >> 8) & 0xff).toByte
      pg(24) = ((c >> 16) & 0xff).toByte; pg(25) = ((c >> 24) & 0xff).toByte
      pg
    }
    val tail = Array.tabulate(45)(i => (i * 3).toByte)
    val fresh = Array.tabulate(20)(i => (i + 1).toByte)
    // continued page with the orphan tail AND a complete fresh packet:
    // only the fresh packet survives
    val pg = manual(1, 2, Seq(45, 20), tail ++ fresh)
    val got = Ogg.packets(pg)
    assert(got.length == 1 && got(0).sameElements(fresh),
      "orphan continuation data must be discarded, fresh packet kept")
    // orphan spanning the whole page (all-255 lacing, still no
    // terminator): nothing emitted, and a FOLLOWING continued page's
    // data up to ITS terminator is still part of the orphan
    val seg255 = Array.fill(255)(7.toByte)
    val pgAll = manual(1, 3, Seq(255), seg255)
    val pgEnd = manual(1, 4, Seq(10, 20), Array.fill(10)(8.toByte) ++ fresh)
    val got2 = Ogg.packets(pgAll ++ pgEnd)
    assert(got2.length == 1 && got2(0).sameElements(fresh))
  }

  test("unequal blocksizes in the identification header decode (former declared seam, r17)") {
    // patch the identification packet's blocksize nibble pair to
    // 256/512 on an all-mode-0 stream: pre-r17 this refused; now the
    // header parses and mode 0 (blockFlag = 0) keeps decoding at bs0,
    // so the stream round-trips unchanged
    val data = Array.fill(64)(1.toByte)
    val good = Vorbis.encode(data, 2)
    val base = Vorbis.decode(good).getOrElse(fail("decode None"))
    val pkts = Vorbis.Ogg.packets(good)
    val ident = pkts(0).clone()
    // blocksize byte: low nibble = log2(bs0), high nibble = log2(bs1)
    val bsOff = ident.length - 2 // ...[bs byte][framing byte]
    ident(bsOff) = ((ident(bsOff) & 0x0f) | (9 << 4)).toByte // bs1 = 512
    val rebuilt = Vorbis.Ogg.page(Seq(ident), 0x67726166, 0, 0L, 2) ++
      good.drop(28 + pkts(0).length)
    val d = Vorbis.decode(rebuilt)
      .getOrElse(fail("unequal blocksizes must now decode"))
    assert(d.nPackets == base.nPackets && d.nSamples == base.nSamples)
    (0 until d.nSamples).foreach(i => assert(d.pcm(i) == base.pcm(i)))
  }

  test("window switching: long/short stream PCM equals absolute-time block placement (r17)") {
    // blocksizes 128/256, plan long,short,long,long,short,short,long —
    // every lap shape occurs: long-long, long-short, short-long,
    // short-short. The expectation places each windowed IMDCT block at
    // its ABSOLUTE time position (centres hop by nPrev/4 + nCur/4) and
    // sums — no shared index algebra with the decoder's overlap loop.
    val rnd = new scala.util.Random(68)
    val data = Array.fill(600)(rnd.nextInt(256).toByte)
    val plan = Seq(true, false, true, true, false, false, true)
    val d = Vorbis.decode(Vorbis.encode(data, blockPlan = plan))
      .getOrElse(fail("decode None"))
    assert(d.nPackets == plan.length)
    val sizes = plan.map(l => if (l) 256 else 128)
    // spec window: slope sin(pi/2 sin^2(pi/(2 slopeN) (i+1/2))), the
    // short slope on a long block centred at n/4 (left) / 3n/4 (right)
    def winAt(n: Int, leftN: Int, rightN: Int, i: Int): Double = {
      val ls = if (leftN == n / 2) 0 else n / 4 - leftN / 2
      val rs = if (rightN == n / 2) n / 2 else 3 * n / 4 - rightN / 2
      if (i < ls) 0.0
      else if (i < ls + leftN) {
        val s = math.sin(math.Pi / (2.0 * leftN) * (i - ls + 0.5))
        math.sin(math.Pi / 2 * s * s)
      } else if (i < rs) 1.0
      else if (i < rs + rightN) {
        val s = math.sin(math.Pi / (2.0 * rightN) * (i - rs + 0.5) + math.Pi / 2)
        math.sin(math.Pi / 2 * s * s)
      } else 0.0
    }
    // per-packet expected VQ vectors, consumed sequentially like encode
    var src = 0
    def vecFor(p: Int): Array[Int] = {
      val n2p = sizes(p) / 2
      val out = new Array[Int](n2p)
      var part = 1
      while (part < n2p / 8) {
        var t = 0
        while (t < 4) {
          val e = (data(src % data.length) & 0xff) % 8
          src += 1
          out(part * 8 + 2 * t) = Vorbis.EntryA(e)
          out(part * 8 + 2 * t + 1) = Vorbis.EntryB(e)
          t += 1
        }
        part += 1
      }
      out
    }
    // absolute placement: centre_0 = n_0/2; centre_p = centre_{p-1} +
    // n_{p-1}/4 + n_p/4; block p spans [centre_p - n_p/2, centre_p + n_p/2)
    val centre = new Array[Int](plan.length)
    centre(0) = sizes(0) / 2
    (1 until plan.length).foreach { p =>
      centre(p) = centre(p - 1) + sizes(p - 1) / 4 + sizes(p) / 4
    }
    val total = centre.last + sizes.last / 2
    val acc = new Array[Double](total)
    (0 until plan.length).foreach { p =>
      val n = sizes(p)
      val leftN = if (plan(p) && !(p == 0 || plan(p - 1))) 64 else n / 2
      val rightN = if (plan(p) && !(p == plan.length - 1 || plan(p + 1))) 64 else n / 2
      val x = vecFor(p)
      val start = centre(p) - n / 2
      (0 until n).foreach { j =>
        var s = 0.0
        var k = 0
        while (k < n / 2) {
          s += x(k) * math.cos(2.0 * math.Pi / n * (j + 0.5 + n / 4.0) * (k + 0.5))
          k += 1
        }
        acc(start + j) += s * winAt(n, leftN, rightN, j)
      }
    }
    // emitted samples = [centre_0, centre_last)
    val expLen = centre.last - centre(0)
    assert(d.nSamples == expLen, s"expected $expLen samples, got ${d.nSamples}")
    (0 until expLen).foreach { i =>
      assert(math.abs(d.pcm(i) - acc(centre(0) + i)) < 1e-9,
        s"ws pcm mismatch at $i")
    }
    // the asymmetric lap keeps Princen-Bradley: prev right slope² + cur
    // left slope² = 1 across a long→short junction
    (0 until 64).foreach { j =>
      val f = winAt(256, 128, 64, 160 + j) // long block, short right slope [160,224)
      val r = winAt(128, 64, 64, j)        // short block left slope [0,64)
      assert(math.abs(f * f + r * r - 1.0) < 1e-12)
    }
  }

  test("end-of-packet: a truncated audio packet still renders (unused floors / partial residues)") {
    // spec §1.1.3/§7.2.3/§8.6.2 — EOP during audio decode zero-fills the
    // remainder and the packet still produces output; the stream must not
    // halt. Rebuild the 2-packet stream with the SECOND audio packet cut
    // at every byte length and check: decode stays Some, both packets
    // render, and the FIRST packet's spectral layer is bit-identical.
    val rnd = new scala.util.Random(81)
    val data = Array.fill(200)(rnd.nextInt(256).toByte)
    val good = Vorbis.encode(data, nPackets = 2)
    val full = Vorbis.decode(good).getOrElse(fail("baseline decode None"))
    val pkts = Vorbis.Ogg.packets(good)
    assert(pkts.length == 5)
    val serial = 0x67726166
    (1 until pkts(4).length).foreach { cut =>
      val pages = Seq(
        Vorbis.Ogg.page(Seq(pkts(0)), serial, 0, 0L, htype = 2),
        Vorbis.Ogg.page(Seq(pkts(1), pkts(2)), serial, 1, 0L, htype = 0),
        Vorbis.Ogg.page(Seq(pkts(3)), serial, 2, 128L, htype = 0),
        Vorbis.Ogg.page(Seq(pkts(4).take(cut)), serial, 3, 256L, htype = 4))
      val d = Vorbis.decode(pages.flatten.toArray)
        .getOrElse(fail(s"decode None at cut=$cut — EOP must not kill the stream"))
      assert(d.nPackets == 2, s"packet dropped at cut=$cut")
      assert(d.nSamples == full.nSamples, s"lap count changed at cut=$cut")
      (0 until d.spectral.length).foreach { i =>
        assert(d.spectral(i) == full.spectral(i), s"first-packet spectral drift at cut=$cut i=$i")
      }
      assert(d.pcm.forall(x => !x.isNaN && !x.isInfinite), s"non-finite pcm at cut=$cut")
    }
  }

  // ------------------------------------------------------------ floor 0

  /** Independent floor0 synthesis (spec §6.2.3), written from the
    * published formulas — Bark map over 64 entries at 8 kHz, p/q
    * line-spectral products, amplitude normalization at 6 bits /
    * offset 100 — sharing no code with the decoder. */
  private def floor0Curve(coeffs: Array[Double], amp: Int): Array[Double] = {
    def bark(x: Double): Double =
      13.1 * math.atan(0.00074 * x) + 2.24 * math.atan(1.85e-8 * x * x) + 0.0001 * x
    val map = Array.tabulate(n2)(i =>
      math.min(63, math.floor(bark(8000.0 * i / (2.0 * n2)) * 64 / bark(4000.0)).toInt))
    val order = coeffs.length
    val cosC = coeffs.map(math.cos)
    Array.tabulate(n2) { i =>
      val cw = math.cos(math.Pi * map(i) / 64)
      var p = 0.0
      var q = 0.0
      if (order % 2 == 1) {
        p = 1.0 - cw * cw
        (0 until order / 2).foreach { k => val d = cosC(2 * k + 1) - cw; p *= 4 * d * d }
        q = 0.25
        (0 to order / 2).foreach { k => val d = cosC(2 * k) - cw; q *= 4 * d * d }
      } else {
        p = (1.0 - cw) / 2
        q = (1.0 + cw) / 2
        (0 until order / 2).foreach { k =>
          val dp = cosC(2 * k + 1) - cw; p *= 4 * dp * dp
          val dq = cosC(2 * k) - cw; q *= 4 * dq * dq
        }
      }
      math.exp(0.11512925 * (amp * 100.0 / 63.0 / math.sqrt(p + q) - 100.0))
    }
  }

  /** Packet 0's expected (residue integers, LSP coefficients) for a
    * floor0 stream: encode draws the residue entries first, then the
    * ceil(order/2) LSP entries, per packet. */
  private def floor0Packet0(data: Array[Byte], order: Int): (Array[Int], Array[Double]) = {
    val per = Vorbis.entriesPerPacket(stereo = false)
    val res = expectedVector(data, 0, n2, per) // packet 0 residue = first `per` draws
    var src = per
    val k = (order + 1) / 2
    val coeffs = new Array[Double](order)
    var filled = 0
    var last = 0.0
    (0 until k).foreach { _ =>
      val e = (data(src % data.length) & 0xff) % 8
      src += 1
      // LSP book: value = mult + 1 (min 1, delta 1), dim pair (A, B)
      val a = Vorbis.LspA(e) + 1.0 + last
      val b = Vorbis.LspB(e) + 1.0 + last
      if (filled < order) { coeffs(filled) = a; filled += 1 }
      if (filled < order) { coeffs(filled) = b; filled += 1 }
      last = b
    }
    (res, coeffs)
  }

  test("floor0 (LSP): spectrum = independently synthesized Bark-map curve × residue (even order)") {
    val rnd = new scala.util.Random(83)
    val data = Array.fill(300)(rnd.nextInt(256).toByte)
    val d = Vorbis.decode(Vorbis.encode(data, nPackets = 2, floor0Order = 4))
      .getOrElse(fail("floor0 decode None"))
    assert(d.nPackets == 2 && d.nSamples == n2)
    val (res, coeffs) = floor0Packet0(data, 4)
    val curve = floor0Curve(coeffs, 40)
    (0 until n2).foreach { i =>
      val exp = curve(i) * res(i)
      assert(math.abs(d.spectral(i) - exp) <= 1e-9 * math.max(1.0, math.abs(exp)),
        s"floor0 spectral mismatch at $i: ${d.spectral(i)} vs $exp")
    }
    assert(d.pcm.forall(x => !x.isNaN && !x.isInfinite))
  }

  test("floor0 odd order: p/q parity split and the overshooting final vector trim") {
    val rnd = new scala.util.Random(84)
    val data = Array.fill(300)(rnd.nextInt(256).toByte)
    // order 5, dims-2 book: 3 vectors = 6 scalars, the 6th read and
    // discarded per the spec's concatenate-then-truncate rule
    val d = Vorbis.decode(Vorbis.encode(data, nPackets = 2, floor0Order = 5,
        floor0Amp = 25))
      .getOrElse(fail("floor0 odd decode None"))
    val (res, coeffs) = floor0Packet0(data, 5)
    val curve = floor0Curve(coeffs, 25)
    (0 until n2).foreach { i =>
      val exp = curve(i) * res(i)
      assert(math.abs(d.spectral(i) - exp) <= 1e-9 * math.max(1.0, math.abs(exp)),
        s"floor0 odd spectral mismatch at $i")
    }
  }

  test("floor0 amplitude 0 = unused channel (silent), out-of-range booknumber = undecodable") {
    val data = Array.fill(300)(3.toByte)
    // amplitude 0: channel unused, spectrum all zeros, stream still renders
    val silent = Vorbis.decode(Vorbis.encode(data, nPackets = 2, floor0Order = 4,
        unusedFloorCh = 0))
      .getOrElse(fail("amplitude-0 floor0 must still decode"))
    assert(silent.spectral.forall(_ == 0.0))
    assert(silent.pcm.forall(_ == 0.0))
    // booknumber past the book list (1 bit at one book, value 1):
    // undecodable packet per §6.2.2 — every packet dropped, stream None
    assert(Vorbis.decode(Vorbis.encode(data, nPackets = 2, floor0Order = 4,
      floor0BadBook = true)).isEmpty)
  }

  test("floor0 stream: EOP truncation sweep and corruption never throw") {
    val rnd = new scala.util.Random(85)
    val data = Array.fill(200)(rnd.nextInt(256).toByte)
    val good = Vorbis.encode(data, nPackets = 2, floor0Order = 4)
    val full = Vorbis.decode(good).getOrElse(fail("baseline decode None"))
    val pkts = Vorbis.Ogg.packets(good)
    val serial = 0x67726166
    (1 until pkts(4).length).foreach { cut =>
      val pages = Seq(
        Vorbis.Ogg.page(Seq(pkts(0)), serial, 0, 0L, htype = 2),
        Vorbis.Ogg.page(Seq(pkts(1), pkts(2)), serial, 1, 0L, htype = 0),
        Vorbis.Ogg.page(Seq(pkts(3)), serial, 2, 128L, htype = 0),
        Vorbis.Ogg.page(Seq(pkts(4).take(cut)), serial, 3, 256L, htype = 4))
      val d = Vorbis.decode(pages.flatten.toArray)
        .getOrElse(fail(s"floor0 decode None at cut=$cut"))
      assert(d.nPackets == 2 && d.nSamples == full.nSamples, s"at cut=$cut")
      (0 until d.spectral.length).foreach { i =>
        assert(d.spectral(i) == full.spectral(i), s"spectral drift at cut=$cut i=$i")
      }
    }
    (0 until good.length by 7).foreach { i =>
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x55).toByte
      Vorbis.decode(bad) // must not throw
    }
  }

  test("a semantically malformed audio packet is dropped, not stream-halting") {
    val rnd = new scala.util.Random(82)
    val data = Array.fill(200)(rnd.nextInt(256).toByte)
    val good = Vorbis.encode(data, nPackets = 2)
    val pkts = Vorbis.Ogg.packets(good)
    val serial = 0x67726166
    // replace the FIRST audio packet with a non-audio-typed byte (LSb = 1
    // = header-packet flag inside the audio stream: Malformed, dropped);
    // the second packet must still decode and become the spectral source
    val pages = Seq(
      Vorbis.Ogg.page(Seq(pkts(0)), serial, 0, 0L, htype = 2),
      Vorbis.Ogg.page(Seq(pkts(1), pkts(2)), serial, 1, 0L, htype = 0),
      Vorbis.Ogg.page(Seq(Array[Byte](1, 0, 0)), serial, 2, 128L, htype = 0),
      Vorbis.Ogg.page(Seq(pkts(4)), serial, 3, 256L, htype = 4))
    val d = Vorbis.decode(pages.flatten.toArray)
      .getOrElse(fail("decode None — a dropped packet must not kill the stream"))
    assert(d.nPackets == 1)
    // lapping restarted: one rendered block emits no lapped samples
    assert(d.nSamples == 0)
    val exp = expectedVector(data, 1, n2, Vorbis.entriesPerPacket(stereo = false))
    (0 until n2).foreach { i =>
      assert(d.spectral(i) == exp(i).toDouble, s"second-packet spectral at $i")
    }
  }
}
