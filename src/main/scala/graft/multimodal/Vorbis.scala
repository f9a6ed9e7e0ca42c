package graft.multimodal

/** Vorbis I in an Ogg container — from-scratch implementation of the
  * publicly specified, patent-free format (Xiph Vorbis I specification +
  * RFC 3533 for Ogg framing; reference cuML has no audio path — this
  * extends the multimodal family the same way Flac.scala does for
  * RFC 9639 and Mp3.scala for ISO 11172-3).
  *
  * What makes Vorbis different from MP3 here: EVERYTHING entropy-coded
  * is driven by codebooks TRANSMITTED in the stream's own setup header,
  * and the codeword assignment is a deterministic function of the
  * transmitted lengths (each entry, in order, takes the lowest
  * prefix-free codeword of its length) — so unlike the MP3 Annex B
  * tables there is NO recalled-constant fidelity risk in the entropy
  * layer: the decoder is exactly as general as the header grammar it
  * parses.
  *
  * Decoder layers, all real:
  *  - Ogg: page sync/CRC (the 0x04C11DB7 non-reflected CRC-32 over the
  *    page with a zeroed checksum field), lacing-value packet reassembly
  *    including continued packets across pages;
  *  - identification/setup headers: codebook read (ordered/unordered,
  *    sparse, lookup types 0/1/2 with float32_unpack and the
  *    lattice/explicit multiplicand layouts), canonical codeword
  *    assignment + trie decode, floor type 1 (partition classes,
  *    subclass books, X list), residue types 0/1/2 (cascade bitmaps,
  *    classword partitioning), mapping type 0 (submaps, square-polar
  *    coupling), modes;
  *  - audio packets: floor1 curve synthesis (low/high neighbor
  *    prediction, render_point/render_line integer Bresenham, the
  *    geometric inverse-dB table with table(255) = 1.0 exactly),
  *    partitioned-VQ residue accumulation over 8 cascade passes,
  *    inverse channel coupling, floor x residue dot product, IMDCT
  *    (2pi/n (j + 1/2 + n/4)(k + 1/2) kernel) through the Vorbis window
  *    sin(pi/2 sin^2(...)), overlap-add;
  *  - window switching (r17): blocksize_0 != blocksize_1 streams decode
  *    for real — long blocks read the two window flags, a side whose
  *    neighbour is short gets the bs0/2-wide slope centred at n/4 /
  *    3n/4 (spec §4.3.8), and the overlap-add is the general unequal
  *    lap: a packet emits prevN/4 + n/4 samples from the previous
  *    block's centre to the current one's.
  *
  * End-of-packet semantics (r17, closing the declared approximation):
  * bit exhaustion during audio-packet decode is the spec's END-OF-PACKET
  * CONDITION (§1.1.3), distinct from semantic invalidity — a floor hit
  * by EOP is unused (§7.2.3), a residue keeps the partial vector decoded
  * so far (§8.6.2), and the packet still renders; a semantically
  * malformed packet is dropped and lapping restarts, per public-decoder
  * convention, instead of halting the stream.
  *
  * Floor type 0 (r17): the LSP floor decodes for real — coefficients
  * VQ-read in the spec's accumulate-`last` scheme, curve synthesized
  * from the p/q line-spectral products on the Bark-warped map
  * (§6.2.2/§6.2.3), one evaluation per distinct map value. Both floor
  * types dispatch per mapping submap.
  *
  * DECLARED scope limits (the honest seams, the Mp3.scala discipline):
  * decode/decodeStream return None
  * on ANY malformed input — the readers are bounds-checked. No Ogg
  * Vorbis sample exists in this offline container, so the gates are
  * self-encoded round trips (the r14 MP3 discipline before its LAME
  * golden landed): the encoder emits spec-shaped headers that the
  * GENERAL header parser consumes — the decoder never sees
  * encoder-private state. */
object Vorbis {

  private class Malformed extends RuntimeException(null, null, false, false)
  /** Bit-exhaustion, distinct from semantic invalidity: the spec's
    * end-of-packet CONDITION (§1.1.3) — during audio-packet decode the
    * remainder of the packet's vectors are zero-filled and the packet
    * still renders; anywhere else it subclasses [[Malformed]] so every
    * conservative catch keeps working. */
  private final class EndOfPacket extends Malformed

  // ------------------------------------------------------------ bit I/O
  // Vorbis packs LSb-first within bytes (spec §2); Huffman codewords are
  // transmitted MSb-of-codeword first (the assignment tree is walked one
  // bit at a time), which is why putHuff differs from putBits.

  private final class BitWriter {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nb = 0
    def putBits(v: Long, bits: Int): Unit = {
      var i = 0
      while (i < bits) {
        cur |= (((v >> i) & 1L).toInt << nb)
        nb += 1
        if (nb == 8) { buf += cur.toByte; cur = 0; nb = 0 }
        i += 1
      }
    }
    def putHuff(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) { putBits((code >> i) & 1, 1); i -= 1 }
    }
    def bytes: Array[Byte] = {
      if (nb > 0) { buf += cur.toByte; cur = 0; nb = 0 }
      buf.toArray
    }
  }

  private final class BitReader(val data: Array[Byte]) {
    private val limit = data.length << 3
    var pos = 0
    def get(bits: Int): Int = {
      if (bits > 31) throw new Malformed
      if (pos + bits > limit) throw new EndOfPacket
      var v = 0; var i = 0
      while (i < bits) {
        v |= ((data(pos >> 3) >> (pos & 7)) & 1) << i
        pos += 1; i += 1
      }
      v
    }
    def get32(): Long = {
      if (pos + 32 > limit) throw new EndOfPacket
      var v = 0L; var i = 0
      while (i < 32) {
        v |= ((data(pos >> 3) >> (pos & 7)) & 1).toLong << i
        pos += 1; i += 1
      }
      v
    }
    def get1(): Int = get(1)
    def remaining: Int = limit - pos
  }

  /** Spec ilog: bit position of the highest set bit (ilog(0) = 0). */
  private def ilog(x: Int): Int = if (x <= 0) 0 else 32 - Integer.numberOfLeadingZeros(x)

  // ------------------------------------------------------- codebooks

  /** float32_unpack (spec §9.2.2): 21-bit mantissa, 10-bit exponent
    * biased 788, top sign bit. */
  private def f32Unpack(x: Long): Double = {
    val mant = (x & 0x1fffff).toDouble
    val exp = ((x >>> 21) & 0x3ff).toInt
    val s = if ((x & 0x80000000L) != 0) -mant else mant
    s * math.pow(2.0, (exp - 788).toDouble)
  }

  /** float32_pack for the encoder: value must be m·2^e with |m| < 2^21. */
  private[multimodal] def f32Pack(mant: Long, exp: Int, neg: Boolean): Long =
    (if (neg) 0x80000000L else 0L) | ((exp + 788).toLong << 21) | mant

  /** Canonical Vorbis codeword assignment: entries in order, each takes
    * the LOWEST prefix-free codeword of its transmitted length (spec
    * §3.2.1). Implemented with an explicit allocation trie tracking, per
    * node, whether its subtree is exhausted and the minimum depth of a
    * completely-free descendant — so "lowest available" is an O(len)
    * guided walk, independent of any reference implementation's marker
    * trick. Length 0 = unused entry (sparse), gets no codeword.
    * Returns null if some entry cannot be placed (overpopulated tree —
    * malformed stream). */
  private[graft] def assignCodewords(lengths: Array[Int]): Array[Int] = {
    // trie arrays; node 0 = root. kid(2n+b) = child id, -1 absent.
    val n = lengths.count(_ > 0)
    val cap = 2 * (n * 33 + 2)
    val kid = Array.fill(2 * cap)(-1)
    val leaf = new Array[Boolean](cap)   // node is an assigned codeword
    val full = new Array[Boolean](cap)   // subtree completely allocated
    var nNodes = 1
    val codes = new Array[Int](lengths.length)
    java.util.Arrays.fill(codes, -1)
    def alloc(): Int = { val id = nNodes; nNodes += 1; id }
    // place a codeword of length L: walk from the root preferring bit 0;
    // a completely-absent child at depth <= L hosts the lowest codeword
    // (pad with zeros). Returns -1 when nothing fits.
    def place(len: Int): Int = {
      val path = new Array[Int](len)
      def walk(node: Int, depth: Int): Boolean = {
        if (depth == len) return false // only fresh nodes can host at len
        var b = 0
        while (b < 2) {
          val c = kid(2 * node + b)
          if (c == -1) {
            // whole subtree free: codeword = path so far + b + zeros
            path(depth) = b
            var d = depth + 1
            val ch = alloc()
            kid(2 * node + b) = ch
            var cur = ch
            while (d < len) {
              path(d) = 0
              val nx = alloc()
              kid(2 * cur + 0) = nx
              cur = nx
              d += 1
            }
            leaf(cur) = true
            full(cur) = true
            return true
          } else if (!leaf(c) && !full(c)) {
            path(depth) = b
            if (walk(c, depth + 1)) return true
          }
          b += 1
        }
        false
      }
      if (!walk(0, 0)) return -1
      // refresh fullness along the found path (bottom-up)
      def refresh(node: Int): Unit = {
        if (!leaf(node)) {
          val l = kid(2 * node); val r = kid(2 * node + 1)
          full(node) = l != -1 && r != -1 && full(l) && full(r)
          // children along the path were refreshed by recursion in place()
        }
      }
      // recompute fullness for all ancestors via a fresh walk
      def walkRefresh(node: Int, depth: Int): Unit = {
        if (depth < len) {
          val c = kid(2 * node + path(depth))
          walkRefresh(c, depth + 1)
          refresh(node)
        }
      }
      walkRefresh(0, 0)
      var code = 0
      var i = 0
      while (i < len) { code = (code << 1) | path(i); i += 1 }
      code
    }
    var i = 0
    while (i < lengths.length) {
      val l = lengths(i)
      if (l > 0) {
        if (l > 32) return null
        val c = place(l)
        if (c == -1) return null
        codes(i) = c
      }
      i += 1
    }
    codes
  }

  /** One transmitted codebook: trie decode + VQ lookup. */
  private[graft] final class Codebook(
      val dims: Int, val entries: Int, val lengths: Array[Int],
      val codes: Array[Int], val lookupType: Int,
      val minVal: Double, val delta: Double, val seqP: Boolean,
      val mults: Array[Int], val quantVals: Int) {
    val maxLen: Int = if (lengths.isEmpty) 0 else lengths.max
    // decode trie over the wire bit order (codeword MSb first)
    val trie: Array[Int] = {
      val nodes = scala.collection.mutable.ArrayBuffer(Array(-1, -1))
      var i = 0
      while (i < entries) {
        val l = lengths(i)
        if (l > 0) {
          val c = codes(i)
          var nd = 0
          var b = l - 1
          while (b > 0) {
            val bit = (c >> b) & 1
            if (nodes(nd)(bit) == -1) {
              nodes += Array(-1, -1); nodes(nd)(bit) = nodes.length - 1
            }
            nd = nodes(nd)(bit)
            b -= 1
          }
          nodes(nd)(c & 1) = -(i + 2)
        }
        i += 1
      }
      nodes.flatMap(a => a).toArray
    }
    /** VQ vector of entry e (lookup type 1 lattice / 2 explicit). */
    def vq(e: Int): Array[Double] = {
      val out = new Array[Double](dims)
      var last = 0.0
      if (lookupType == 1) {
        var idxDiv = 1
        var i = 0
        while (i < dims) {
          val off = (e / idxDiv) % quantVals
          out(i) = mults(off) * delta + minVal + last
          if (seqP) last = out(i)
          idxDiv *= quantVals
          i += 1
        }
      } else {
        var i = 0
        while (i < dims) {
          out(i) = mults(e * dims + i) * delta + minVal + last
          if (seqP) last = out(i)
          i += 1
        }
      }
      out
    }
  }

  private def readSym(r: BitReader, cb: Codebook): Int = {
    var nd = 0
    var steps = 0
    while (steps <= cb.maxLen) {
      val v = cb.trie(2 * nd + r.get1())
      if (v <= -2) return -v - 2
      if (v == -1) throw new Malformed
      nd = v
      steps += 1
    }
    throw new Malformed
  }

  /** The greatest integer v with v^dims <= entries (lookup-1 lattice). */
  private def lookup1Values(entries: Int, dims: Int): Int = {
    var v = 1
    while (math.pow((v + 1).toDouble, dims.toDouble) <= entries.toDouble) v += 1
    v
  }

  private def readCodebook(r: BitReader): Codebook = {
    if (r.get(24) != 0x564342) throw new Malformed // "BCV" sync
    val dims = r.get(16)
    val entries = r.get(24)
    // cap entries BEFORE any allocation sized by them (advice r16: a
    // 2.6 MB crafted header claiming 2^22 entries would otherwise drive
    // multi-GB codeword/trie allocations); 2^18 is far above any
    // realistic codebook (libvorbis ships books of a few thousand)
    if (dims <= 0 || entries <= 0 || entries > (1 << 18)) throw new Malformed
    val lengths = new Array[Int](entries)
    if (r.get1() == 0) {
      val sparse = r.get1() == 1
      // unordered lengths cost 5 bits each (1+ sparse) — a header whose
      // bit budget cannot carry them is malformed, fail before the scan
      if ((if (sparse) entries.toLong else entries * 5L) > r.remaining)
        throw new Malformed
      var i = 0
      while (i < entries) {
        lengths(i) =
          if (!sparse) r.get(5) + 1
          else if (r.get1() == 1) r.get(5) + 1
          else 0
        i += 1
      }
    } else {
      var cl = r.get(5) + 1
      var i = 0
      while (i < entries) {
        val num = r.get(ilog(entries - i))
        if (num > entries - i) throw new Malformed
        var k = 0
        while (k < num) { lengths(i + k) = cl; k += 1 }
        i += num
        cl += 1
        if (cl > 33) throw new Malformed
      }
    }
    val codes = assignCodewords(lengths)
    if (codes == null) throw new Malformed
    val lookup = r.get(4)
    if (lookup == 0)
      new Codebook(dims, entries, lengths, codes, 0, 0, 0, false, Array.emptyIntArray, 0)
    else if (lookup == 1 || lookup == 2) {
      val minV = f32Unpack(r.get32())
      val delta = f32Unpack(r.get32())
      val valBits = r.get(4) + 1
      val seqP = r.get1() == 1
      val nVals = if (lookup == 1) lookup1Values(entries, dims) else entries * dims
      if (nVals < 0 || nVals > (1 << 24)) throw new Malformed
      val mults = Array.fill(nVals)(r.get(valBits))
      new Codebook(dims, entries, lengths, codes, lookup, minV, delta, seqP, mults, nVals)
    } else throw new Malformed
  }

  // ------------------------------------------------------------ floor 1

  /** The spec's inverse-dB amplitude table is the geometric sequence
    * pinned by its two published endpoints: entry 255 is EXACTLY 1.0 and
    * entry 0 is 1.0649863e-07, with the per-step ratio derived from them
    * (exp(ln(1.0649863e-07)/-255) ≈ 1.0650). Generated from the closed
    * form and rounded to float32, not typed. */
  private[graft] val InverseDb: Array[Double] = {
    val step = -math.log(1.0649863e-07) / 255.0
    Array.tabulate(256)(i => math.exp(-step * (255 - i)).toFloat.toDouble)
  }

  private sealed trait Floor

  private final case class Floor1(
      partClass: Array[Int], classDims: Array[Int], classSubBits: Array[Int],
      masterbooks: Array[Int], subBooks: Array[Array[Int]],
      multiplier: Int, xs: Array[Int]) extends Floor

  // ------------------------------------------------------------ floor 0
  //
  // LSP floor (spec §6): an all-pole spectral envelope transmitted as
  // line-spectral-pair coefficients VQ-read from the header's own
  // codebooks, evaluated on a Bark-warped frequency map. Present in
  // very early encoder output; floor1 replaced it, but the format
  // requires decoders to support both.

  private final case class Floor0(order: Int, rate: Int, barkMapSize: Int,
                                  ampBits: Int, ampOffset: Int,
                                  bookList: Array[Int]) extends Floor {
    // Bark map per curve length (spec §6.2.3 step 1) — depends only on
    // this floor's header fields and n2, so cache per blocksize.
    private val mapCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Int]]()
    private def bark(x: Double): Double =
      13.1 * math.atan(0.00074 * x) + 2.24 * math.atan(1.85e-8 * x * x) + 0.0001 * x
    def mapFor(n2: Int): Array[Int] = mapCache.computeIfAbsent(n2, { _ =>
      val scale = barkMapSize / bark(0.5 * rate)
      Array.tabulate(n2) { i =>
        math.min(barkMapSize - 1,
          math.floor(bark(rate.toDouble * i / (2.0 * n2)) * scale).toInt)
      }
    })
  }

  private def readFloor0(r: BitReader, books: Array[Codebook]): Floor0 = {
    val order = r.get(8)
    val rate = r.get(16)
    val barkMapSize = r.get(16)
    val ampBits = r.get(6)
    val ampOffset = r.get(8)
    val nBooks = r.get(4) + 1
    val bookList = Array.fill(nBooks) {
      val b = r.get(8)
      if (b >= books.length) throw new Malformed
      // VQ-context reads require a book that maps to values (spec §6.2.1
      // errata: a book of lookup type 0 here renders the stream
      // undecodable)
      if (books(b).lookupType == 0) throw new Malformed
      b
    }
    if (order < 1 || rate < 1 || barkMapSize < 1) throw new Malformed
    Floor0(order, rate, barkMapSize, ampBits, ampOffset, bookList)
  }

  /** Floor0 packet decode + curve synthesis (spec §6.2.2/§6.2.3) →
    * Some(curve over n2 samples) or None for an unused channel
    * (amplitude 0). */
  private def decodeFloor0(r: BitReader, f: Floor0, books: Array[Codebook],
                           n2: Int): Option[Array[Double]] = {
    val amplitude = r.get(f.ampBits)
    if (amplitude == 0) return None
    val booknum = r.get(ilog(f.bookList.length))
    if (booknum >= f.bookList.length) throw new Malformed // undecodable packet
    val cb = books(f.bookList(booknum))
    // read vectors in VQ context, each element plus the running `last`
    // (= the previous vector's final post-addition scalar); the full
    // final vector is decoded even when it overshoots `order`, but only
    // the first `order` scalars feed the curve
    val coeffs = new Array[Double](f.order)
    var last = 0.0
    var filled = 0
    while (filled < f.order) {
      val v = cb.vq(readSym(r, cb))
      var i = 0
      while (i < v.length) {
        if (filled < f.order) { coeffs(filled) = v(i) + last; filled += 1 }
        i += 1
      }
      last = v(v.length - 1) + last
    }
    // curve: one p/q evaluation per distinct Bark-map value, spread over
    // the run of bins sharing it
    val map = f.mapFor(n2)
    val cosC = new Array[Double](f.order)
    var j = 0
    while (j < f.order) { cosC(j) = math.cos(coeffs(j)); j += 1 }
    val ampNorm = amplitude.toDouble * f.ampOffset / ((1 << f.ampBits) - 1).toDouble
    val out = new Array[Double](n2)
    var i = 0
    while (i < n2) {
      val m = map(i)
      val cw = math.cos(math.Pi * m / f.barkMapSize)
      var p = 0.0
      var q = 0.0
      if (f.order % 2 == 1) {
        p = 1.0 - cw * cw
        var k = 0
        while (2 * k + 1 < f.order) { val d = cosC(2 * k + 1) - cw; p *= 4.0 * d * d; k += 1 }
        q = 0.25
        k = 0
        while (2 * k < f.order) { val d = cosC(2 * k) - cw; q *= 4.0 * d * d; k += 1 }
      } else {
        p = (1.0 - cw) / 2.0
        q = (1.0 + cw) / 2.0
        var k = 0
        while (2 * k + 1 < f.order) {
          val dp = cosC(2 * k + 1) - cw; p *= 4.0 * dp * dp
          val dq = cosC(2 * k) - cw; q *= 4.0 * dq * dq
          k += 1
        }
      }
      val lin = math.exp(0.11512925 *
        (ampNorm / math.sqrt(p + q) - f.ampOffset))
      out(i) = lin
      var k2 = i + 1
      while (k2 < n2 && map(k2) == m) { out(k2) = lin; k2 += 1 }
      i = k2
    }
    Some(out)
  }

  private def readFloor1(r: BitReader, nBooks: Int): Floor1 = {
    val nPart = r.get(5)
    val partClass = Array.fill(nPart)(r.get(4))
    val maxClass = if (nPart == 0) -1 else partClass.max
    val classDims = new Array[Int](maxClass + 1)
    val classSubBits = new Array[Int](maxClass + 1)
    val masterbooks = Array.fill(maxClass + 1)(-1)
    val subBooks = new Array[Array[Int]](maxClass + 1)
    var c = 0
    while (c <= maxClass) {
      classDims(c) = r.get(3) + 1
      classSubBits(c) = r.get(2)
      if (classSubBits(c) > 0) {
        masterbooks(c) = r.get(8)
        if (masterbooks(c) >= nBooks) throw new Malformed
      }
      subBooks(c) = Array.fill(1 << classSubBits(c)) {
        val b = r.get(8) - 1
        if (b >= nBooks) throw new Malformed
        b
      }
      c += 1
    }
    val multiplier = r.get(2) + 1
    val rangeBits = r.get(4)
    val xs = scala.collection.mutable.ArrayBuffer(0, 1 << rangeBits)
    var p = 0
    while (p < nPart) {
      var j = 0
      while (j < classDims(partClass(p))) { xs += r.get(rangeBits); j += 1 }
      p += 1
    }
    if (xs.distinct.length != xs.length || xs.length > 65) throw new Malformed
    Floor1(partClass, classDims, classSubBits, masterbooks, subBooks,
      multiplier, xs.toArray)
  }

  private def lowNeighbor(v: Array[Int], i: Int): Int = {
    var best = 0; var j = 0
    while (j < i) { if (v(j) < v(i) && v(j) >= v(best)) best = j; j += 1 }
    best
  }
  private def highNeighbor(v: Array[Int], i: Int): Int = {
    var best = 1; var j = 0
    while (j < i) { if (v(j) > v(i) && v(j) <= v(best)) best = j; j += 1 }
    best
  }
  private def renderPoint(x0: Int, y0: Int, x1: Int, y1: Int, x: Int): Int = {
    val dy = y1 - y0
    val adx = x1 - x0
    val err = math.abs(dy) * (x - x0)
    val off = err / adx
    if (dy < 0) y0 - off else y0 + off
  }
  private def renderLine(x0: Int, y0: Int, x1: Int, y1: Int,
                         out: Array[Double], n: Int): Unit = {
    val dy = y1 - y0
    val adx = x1 - x0
    var ady = math.abs(dy)
    val base = dy / adx
    var y = y0
    var err = 0
    val sy = if (dy < 0) base - 1 else base + 1
    ady -= math.abs(base) * adx
    if (x0 < n) out(x0) = InverseDb(y & 255)
    var x = x0 + 1
    while (x < math.min(x1, n)) {
      err += ady
      if (err >= adx) { err -= adx; y += sy } else y += base
      out(x) = InverseDb(y & 255)
      x += 1
    }
  }

  /** Floor1 packet decode → Some(curve over n2 samples) or None for an
    * unused (silent) channel. */
  private def decodeFloor1(r: BitReader, f: Floor1, books: Array[Codebook],
                           n2: Int): Option[Array[Double]] = {
    if (r.get1() == 0) return None
    val range = Array(256, 128, 86, 64)(f.multiplier - 1)
    val yBits = ilog(range - 1)
    val nVals = f.xs.length
    val y = new Array[Int](nVals)
    y(0) = r.get(yBits)
    y(1) = r.get(yBits)
    var offset = 2
    var p = 0
    while (p < f.partClass.length) {
      val cls = f.partClass(p)
      val cDim = f.classDims(cls)
      val cBits = f.classSubBits(cls)
      val cSub = (1 << cBits) - 1
      var cVal = if (cBits > 0) readSym(r, books(f.masterbooks(cls))) else 0
      var j = 0
      while (j < cDim) {
        val b = f.subBooks(cls)(cVal & cSub)
        cVal >>= cBits
        y(offset + j) = if (b >= 0) readSym(r, books(b)) else 0
        j += 1
      }
      offset += cDim
      p += 1
    }
    // amplitude synthesis (spec §7.2.4 step 2)
    val finalY = new Array[Int](nVals)
    val step2 = new Array[Boolean](nVals)
    finalY(0) = y(0); finalY(1) = y(1)
    step2(0) = true; step2(1) = true
    var i = 2
    while (i < nVals) {
      val lo = lowNeighbor(f.xs, i)
      val hi = highNeighbor(f.xs, i)
      val pred = renderPoint(f.xs(lo), finalY(lo), f.xs(hi), finalY(hi), f.xs(i))
      val v = y(i)
      val highroom = range - pred
      val lowroom = pred
      val room = 2 * math.min(highroom, lowroom)
      if (v != 0) {
        step2(lo) = true; step2(hi) = true; step2(i) = true
        finalY(i) =
          if (v >= room) {
            if (highroom > lowroom) v - lowroom + pred
            else pred - (v - highroom) - 1
          } else if (v % 2 == 1) pred - ((v + 1) / 2)
          else pred + v / 2
      } else { step2(i) = false; finalY(i) = pred }
      finalY(i) = math.max(0, math.min(range - 1, finalY(i)))
      i += 1
    }
    // curve render over the X-sorted step2 points
    val order = f.xs.indices.sortBy(f.xs(_)).toArray
    val out = new Array[Double](n2)
    var lx = 0
    var ly = finalY(order(0)) * f.multiplier
    var k = 1
    while (k < order.length) {
      val j = order(k)
      if (step2(j)) {
        val hx = f.xs(j)
        val hy = finalY(j) * f.multiplier
        if (lx < n2) renderLine(lx, ly, hx, hy, out, n2)
        lx = hx; ly = hy
      }
      k += 1
    }
    var x = lx
    while (x < n2) { out(x) = InverseDb(ly & 255); x += 1 }
    Some(out)
  }

  // ------------------------------------------------------------ residue

  private final case class Residue(rType: Int, begin: Int, end: Int,
                                   partSize: Int, classifications: Int,
                                   classbook: Int, books: Array[Array[Int]])

  private def readResidue(r: BitReader, rType: Int, nBooks: Int): Residue = {
    val begin = r.get(24)
    val end = r.get(24)
    val partSize = r.get(24) + 1
    val classifications = r.get(6) + 1
    val classbook = r.get(8)
    if (classbook >= nBooks || begin > end) throw new Malformed
    val cascade = Array.fill(classifications) {
      val low = r.get(3)
      val high = if (r.get1() == 1) r.get(5) else 0
      low | (high << 3)
    }
    val books = Array.tabulate(classifications, 8) { (c, pass) =>
      if (((cascade(c) >> pass) & 1) == 1) {
        val b = r.get(8)
        if (b >= nBooks) throw new Malformed
        b
      } else -1
    }
    Residue(rType, begin, end, partSize, classifications, classbook, books)
  }

  /** Types 0/1 decode over `nCh` vectors of length n2 (type 2 callers
    * pre-interleave); doNotDecode channels contribute no reads. */
  private def decodeResidueInner(r: BitReader, res: Residue,
                                 books: Array[Codebook], nCh: Int,
                                 dnd: Array[Boolean], n2: Int): Array[Array[Double]] = {
    val out = Array.ofDim[Double](nCh, n2)
    if (dnd.forall(identity)) return out
    val begin = math.min(res.begin, n2)
    val end = math.min(res.end, n2)
    if (end <= begin) return out
    val partVals = (end - begin) / res.partSize
    val classbook = books(res.classbook)
    val cwPer = classbook.dims
    if (cwPer <= 0) throw new Malformed
    val classifs = Array.ofDim[Int](nCh, partVals + cwPer)
    // end-of-packet mid-residue keeps the partial vector decoded so far,
    // remainder zeros (spec §8.6.2) — `out` accumulates in place, so the
    // catch at the bottom simply stops the loops
    try decodePasses()
    catch { case _: EndOfPacket => }
    def decodePasses(): Unit = {
    var pass = 0
    while (pass < 8) {
      var pcount = 0
      while (pcount < partVals) {
        if (pass == 0) {
          var j = 0
          while (j < nCh) {
            if (!dnd(j)) {
              var temp = readSym(r, classbook)
              var k = cwPer - 1
              while (k >= 0) {
                classifs(j)(pcount + k) = temp % res.classifications
                temp /= res.classifications
                k -= 1
              }
            }
            j += 1
          }
        }
        var k = 0
        while (k < cwPer && pcount < partVals) {
          var j = 0
          while (j < nCh) {
            if (!dnd(j)) {
              val c = classifs(j)(pcount)
              val b = res.books(c)(pass)
              if (b >= 0) {
                val book = books(b)
                if (book.lookupType == 0) throw new Malformed
                val off = begin + pcount * res.partSize
                if (res.rType == 0) {
                  val step = res.partSize / book.dims
                  var s = 0
                  while (s < step) {
                    val v = book.vq(readSym(r, book))
                    var d = 0
                    while (d < book.dims) {
                      out(j)(off + s + d * step) += v(d)
                      d += 1
                    }
                    s += 1
                  }
                } else { // types 1 and (pre-interleaved) 2
                  var i = 0
                  while (i < res.partSize) {
                    val v = book.vq(readSym(r, book))
                    var d = 0
                    while (d < book.dims && i < res.partSize) {
                      out(j)(off + i) += v(d)
                      d += 1; i += 1
                    }
                  }
                }
              }
            }
            j += 1
          }
          pcount += 1
          k += 1
        }
      }
      pass += 1
    }
    }
    out
  }

  private def decodeResidue(r: BitReader, res: Residue, books: Array[Codebook],
                            nCh: Int, dnd: Array[Boolean], n2: Int): Array[Array[Double]] = {
    if (res.rType != 2) decodeResidueInner(r, res, books, nCh, dnd, n2)
    else {
      // type 2: channels interleaved into ONE vector decoded as type 1
      if (dnd.forall(identity)) Array.ofDim[Double](nCh, n2)
      else {
        val combined = decodeResidueInner(r, res.copy(rType = 1), books, 1,
          Array(false), n2 * nCh)(0)
        Array.tabulate(nCh, n2)((ch, i) => combined(i * nCh + ch))
      }
    }
  }

  // ----------------------------------------------------- mapping / mode

  private final case class Mapping(couplingMag: Array[Int], couplingAng: Array[Int],
                                   mux: Array[Int], floorOf: Array[Int],
                                   residueOf: Array[Int])
  private final case class Mode(blockFlag: Boolean, mapping: Int)

  private def readMapping(r: BitReader, channels: Int, nFloors: Int,
                          nResidues: Int): Mapping = {
    if (r.get(16) != 0) throw new Malformed
    val submaps = if (r.get1() == 1) r.get(4) + 1 else 1
    val (mags, angs) =
      if (r.get1() == 1) {
        val steps = r.get(8) + 1
        val m = new Array[Int](steps)
        val a = new Array[Int](steps)
        var s = 0
        while (s < steps) {
          m(s) = r.get(ilog(channels - 1))
          a(s) = r.get(ilog(channels - 1))
          if (m(s) == a(s) || m(s) >= channels || a(s) >= channels) throw new Malformed
          s += 1
        }
        (m, a)
      } else (Array.emptyIntArray, Array.emptyIntArray)
    if (r.get(2) != 0) throw new Malformed
    val mux =
      if (submaps > 1) Array.fill(channels) {
        val v = r.get(4)
        if (v >= submaps) throw new Malformed
        v
      }
      else new Array[Int](channels)
    val floorOf = new Array[Int](submaps)
    val residueOf = new Array[Int](submaps)
    var s = 0
    while (s < submaps) {
      r.get(8) // unused time configuration
      floorOf(s) = r.get(8)
      residueOf(s) = r.get(8)
      if (floorOf(s) >= nFloors || residueOf(s) >= nResidues) throw new Malformed
      s += 1
    }
    Mapping(mags, angs, mux, floorOf, residueOf)
  }

  // ------------------------------------------------------------- setup

  private final case class Setup(channels: Int, rate: Int, bs0: Int, bs1: Int,
                                 books: Array[Codebook], floors: Array[Floor],
                                 residues: Array[Residue], mappings: Array[Mapping],
                                 modes: Array[Mode])

  private def parseHeaders(packets: Seq[Array[Byte]]): Setup = {
    if (packets.length < 3) throw new Malformed
    // identification
    val r1 = new BitReader(packets(0))
    if (r1.get(8) != 1) throw new Malformed
    if (!"vorbis".forall(c => r1.get(8) == c.toInt)) throw new Malformed
    if (r1.get32() != 0L) throw new Malformed // vorbis_version
    val channels = r1.get(8)
    val rate = r1.get32().toInt
    if (channels < 1 || rate <= 0) throw new Malformed
    r1.get32(); r1.get32(); r1.get32() // bitrate max/nominal/min
    val bs0 = 1 << r1.get(4)
    val bs1 = 1 << r1.get(4)
    if (bs0 < 64 || bs1 > 8192 || bs1 < bs0) throw new Malformed
    if (r1.get1() != 1) throw new Malformed // framing
    // comment header: verify shape only
    val r2 = new BitReader(packets(1))
    if (r2.get(8) != 3) throw new Malformed
    if (!"vorbis".forall(c => r2.get(8) == c.toInt)) throw new Malformed
    // setup
    val r = new BitReader(packets(2))
    if (r.get(8) != 5) throw new Malformed
    if (!"vorbis".forall(c => r.get(8) == c.toInt)) throw new Malformed
    val nBooks = r.get(8) + 1
    val books = Array.fill(nBooks)(readCodebook(r))
    val nTimes = r.get(6) + 1
    var t = 0
    while (t < nTimes) { if (r.get(16) != 0) throw new Malformed; t += 1 }
    val nFloors = r.get(6) + 1
    val floors = Array.fill[Floor](nFloors) {
      r.get(16) match {
        case 0 => readFloor0(r, books)
        case 1 => readFloor1(r, nBooks)
        case _ => throw new Malformed
      }
    }
    val nRes = r.get(6) + 1
    val residues = Array.fill(nRes) {
      val rt = r.get(16)
      if (rt > 2) throw new Malformed
      readResidue(r, rt, nBooks)
    }
    val nMaps = r.get(6) + 1
    val mappings = Array.fill(nMaps)(readMapping(r, channels, nFloors, nRes))
    val nModes = r.get(6) + 1
    val modes = Array.fill(nModes) {
      val bf = r.get1() == 1
      if (r.get(16) != 0 || r.get(16) != 0) throw new Malformed
      val m = r.get(8)
      if (m >= nMaps) throw new Malformed
      Mode(bf, m)
    }
    if (r.get1() != 1) throw new Malformed // framing
    Setup(channels, rate, bs0, bs1, books, floors, residues, mappings, modes)
  }

  // --------------------------------------------------- transform chain

  /** Vorbis synthesis window, general lapping (spec §4.3.8): the rising
    * slope spans `leftN` samples ending at the left lap point, the
    * falling slope `rightN` samples, slope shape
    * sin(pi/2 · sin^2(pi/(2·slopeN) (i+1/2))); flat 1 between the
    * slopes, 0 outside. A long block next to a short one centres the
    * short slope at n/4 (left) / 3n/4 (right): leftN/rightN = bs0/2
    * there, n/2 when the neighbour is the same size (which reduces to
    * the classic full-width window sin(pi/2 sin^2(pi/n (i+1/2)))). */
  private val windowCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Double]]()
  private def windowArr(n: Int, leftN: Int, rightN: Int): Array[Double] =
    windowCache.computeIfAbsent((n, leftN, rightN), { _ =>
      val w = new Array[Double](n)
      val ls = if (leftN == n / 2) 0 else n / 4 - leftN / 2
      val le = ls + leftN
      val rs = if (rightN == n / 2) n / 2 else 3 * n / 4 - rightN / 2
      val re = rs + rightN
      var i = ls
      while (i < le) {
        val s = math.sin(math.Pi / (2.0 * leftN) * (i - ls + 0.5))
        w(i) = math.sin(math.Pi / 2 * s * s)
        i += 1
      }
      i = le
      while (i < rs) { w(i) = 1.0; i += 1 }
      i = rs
      while (i < re) {
        val s = math.sin(math.Pi / (2.0 * rightN) * (i - rs + 0.5) + math.Pi / 2)
        w(i) = math.sin(math.Pi / 2 * s * s)
        i += 1
      }
      w
    })

  /** IMDCT, spec kernel: y(j) = Σ_k X(k)·cos(2π/n (j + 1/2 + n/4)(k + 1/2)).
    * The kernel matrix is cached per blocksize for n ≤ 2048 (n·n/2
    * doubles — 16 MB at the cap; the per-row gate decode was dominated
    * by recomputing these cosines, r16 verdict #8). Values are the same
    * math.cos calls hoisted, so results are bit-identical. */
  private val imdctCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Double]]()
  private def imdctKernel(n: Int): Array[Double] =
    imdctCache.computeIfAbsent(n, { _ =>
      val n2 = n / 2
      val t = new Array[Double](n * n2)
      var j = 0
      while (j < n) {
        var k = 0
        while (k < n2) {
          t(j * n2 + k) =
            math.cos(2.0 * math.Pi / n * (j + 0.5 + n / 4.0) * (k + 0.5))
          k += 1
        }
        j += 1
      }
      t
    })
  private def imdct(x: Array[Double], n: Int): Array[Double] = {
    val out = new Array[Double](n)
    val n2 = n / 2
    if (n <= 2048) {
      val t = imdctKernel(n)
      var j = 0
      while (j < n) {
        var s = 0.0
        val base = j * n2
        var k = 0
        while (k < n2) { s += x(k) * t(base + k); k += 1 }
        out(j) = s
        j += 1
      }
    } else {
      var j = 0
      while (j < n) {
        var s = 0.0
        var k = 0
        while (k < n2) {
          s += x(k) * math.cos(2.0 * math.Pi / n * (j + 0.5 + n / 4.0) * (k + 0.5))
          k += 1
        }
        out(j) = s
        j += 1
      }
    }
    out
  }

  // ------------------------------------------------------ packet decode

  /** One audio packet against the setup. Returns (spectral
    * floor×residue per channel, full windowed IMDCT output per channel
    * — length n — and the block size n); the caller overlap-adds
    * consecutive windowed blocks, including unequal laps. A long block
    * reads the two window flags and laps with the SHORT slope on a side
    * whose neighbour is short (spec §4.3.1/§4.3.8). */
  private def decodePacket(su: Setup, packet: Array[Byte]):
      (Array[Array[Double]], Array[Array[Double]], Int) = {
    val r = new BitReader(packet)
    if (r.get1() != 0) throw new Malformed // not an audio packet
    val mode = su.modes(r.get(ilog(su.modes.length - 1)))
    val n = if (mode.blockFlag) su.bs1 else su.bs0
    var leftN = n / 2
    var rightN = n / 2
    if (mode.blockFlag) {
      if (r.get1() == 0) leftN = su.bs0 / 2  // previous window short
      if (r.get1() == 0) rightN = su.bs0 / 2 // next window short
    }
    val mp = su.mappings(mode.mapping)
    val n2 = n / 2
    val ch = su.channels
    // floors
    val floorOut = new Array[Array[Double]](ch)
    val nonzero = new Array[Boolean](ch)
    var c = 0
    while (c < ch) {
      val fl = su.floors(mp.floorOf(mp.mux(c)))
      // end-of-packet during floor decode = this floor unused (spec
      // §1.1.3 / §7.2.3); the exhausted reader makes every later read
      // EOP too, so remaining floors come out unused and residues
      // partial-zero — the packet still renders
      val curve = try fl match {
        case f1: Floor1 => decodeFloor1(r, f1, su.books, n2)
        case f0: Floor0 => decodeFloor0(r, f0, su.books, n2)
      } catch { case _: EndOfPacket => None }
      curve match {
        case Some(cv) => floorOut(c) = cv; nonzero(c) = true
        case None => nonzero(c) = false
      }
      c += 1
    }
    // coupling propagation: a coupled pair decodes if either side is live
    var s = 0
    while (s < mp.couplingMag.length) {
      if (nonzero(mp.couplingMag(s)) || nonzero(mp.couplingAng(s))) {
        nonzero(mp.couplingMag(s)) = true
        nonzero(mp.couplingAng(s)) = true
      }
      s += 1
    }
    // residues per submap (channel order within the submap)
    val residueVec = new Array[Array[Double]](ch)
    val nSubmaps = mp.floorOf.length
    var sm = 0
    while (sm < nSubmaps) {
      val chans = (0 until ch).filter(mp.mux(_) == sm).toArray
      val dnd = chans.map(!nonzero(_))
      val res = su.residues(mp.residueOf(sm))
      val vecs = decodeResidue(r, res, su.books, chans.length, dnd, n2)
      var i = 0
      while (i < chans.length) { residueVec(chans(i)) = vecs(i); i += 1 }
      sm += 1
    }
    // inverse coupling (square polar), last step first
    s = mp.couplingMag.length - 1
    while (s >= 0) {
      val mV = residueVec(mp.couplingMag(s))
      val aV = residueVec(mp.couplingAng(s))
      var i = 0
      while (i < n2) {
        val m = mV(i); val a = aV(i)
        if (m > 0) {
          if (a > 0) { mV(i) = m; aV(i) = m - a } else { aV(i) = m; mV(i) = m + a }
        } else {
          if (a > 0) { mV(i) = m; aV(i) = m + a } else { aV(i) = m; mV(i) = m - a }
        }
        i += 1
      }
      s -= 1
    }
    // floor x residue, synthesis
    val win = windowArr(n, leftN, rightN)
    val spectral = Array.ofDim[Double](ch, n2)
    val windowed = new Array[Array[Double]](ch)
    c = 0
    while (c < ch) {
      // nonzero(c) can be true with floorOut(c) == null when coupling
      // propagation revived a channel whose own floor was unused — per
      // spec §4.3.6 such a channel's spectrum stays all zeros (advice r16)
      if (nonzero(c) && floorOut(c) != null) {
        var i = 0
        while (i < n2) { spectral(c)(i) = floorOut(c)(i) * residueVec(c)(i); i += 1 }
      }
      val y = imdct(spectral(c), n)
      var i = 0
      while (i < n) { y(i) *= win(i); i += 1 }
      windowed(c) = y
      c += 1
    }
    (spectral, windowed, n)
  }

  // ---------------------------------------------------------------- Ogg

  private[graft] object Ogg {
    /** RFC 3533 CRC-32: poly 0x04C11DB7, init 0, not reflected, no xorout. */
    private val crcTable: Array[Int] = Array.tabulate(256) { i =>
      var r = i << 24
      var k = 0
      while (k < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        k += 1
      }
      r
    }
    def crc(bytes: Array[Byte]): Int = {
      var c = 0
      var i = 0
      while (i < bytes.length) {
        c = (c << 8) ^ crcTable(((c >>> 24) ^ (bytes(i) & 0xff)) & 0xff)
        i += 1
      }
      c
    }

    /** One page: packets must each be < 255*255 bytes here (the gate
      * streams are tiny); `htype` 2 = BOS, 4 = EOS, 0 = normal. */
    def page(packets: Seq[Array[Byte]], serial: Int, seq: Int, granule: Long,
             htype: Int): Array[Byte] = {
      val lacing = scala.collection.mutable.ArrayBuffer.empty[Int]
      packets.foreach { p =>
        var rem = p.length
        while (rem >= 255) { lacing += 255; rem -= 255 }
        lacing += rem // < 255 terminates the packet (0 for empty/multiple-of-255)
      }
      require(lacing.length <= 255, "page overflow")
      val body = packets.flatMap(_.toSeq).toArray
      val head = java.nio.ByteBuffer.allocate(27 + lacing.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      head.put("OggS".getBytes("US-ASCII"))
      head.put(0.toByte)            // version
      head.put(htype.toByte)
      head.putLong(granule)
      head.putInt(serial)
      head.putInt(seq)
      head.putInt(0)                // CRC placeholder
      head.put(lacing.length.toByte)
      lacing.foreach(l => head.put(l.toByte))
      val page = head.array() ++ body
      val c = crc(page)
      page(22) = (c & 0xff).toByte
      page(23) = ((c >> 8) & 0xff).toByte
      page(24) = ((c >> 16) & 0xff).toByte
      page(25) = ((c >> 24) & 0xff).toByte
      page
    }

    /** All complete packets of an Ogg stream (CRC-verified pages,
      * lacing reassembly incl. continued packets). Malformed pages stop
      * the scan. */
    def packets(bytes: Array[Byte]): Seq[Array[Byte]] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var partial = Array.emptyByteArray
      var open = false
      var o = 0
      while (o + 27 <= bytes.length) {
        if (bytes(o) == 'O' && bytes(o + 1) == 'g' && bytes(o + 2) == 'g' &&
          bytes(o + 3) == 'S' && bytes(o + 4) == 0) {
          val nSeg = bytes(o + 26) & 0xff
          val headLen = 27 + nSeg
          if (o + headLen > bytes.length) throw new Malformed
          val lacing = Array.tabulate(nSeg)(i => bytes(o + 27 + i) & 0xff)
          val bodyLen = lacing.sum
          if (o + headLen + bodyLen > bytes.length) throw new Malformed
          // CRC check over the page with a zeroed checksum field
          val page = java.util.Arrays.copyOfRange(bytes, o, o + headLen + bodyLen)
          val stored = (page(22) & 0xff) | ((page(23) & 0xff) << 8) |
            ((page(24) & 0xff) << 16) | ((page(25) & 0xff) << 24)
          page(22) = 0; page(23) = 0; page(24) = 0; page(25) = 0
          if (crc(page) != stored) throw new Malformed
          val continued = (bytes(o + 5) & 1) != 0
          if (!continued && open) { partial = Array.emptyByteArray; open = false }
          var bo = o + headLen
          var i = 0
          // RFC 3533: a continuation with no open partial (mid-stream
          // join / dropped page) — DISCARD data up to and including the
          // first packet terminator instead of emitting a garbage packet
          // that would shift positional header indexing (advice r16)
          if (continued && !open) {
            var drop = true
            while (i < nSeg && drop) {
              val l = lacing(i)
              bo += l
              if (l < 255) drop = false
              i += 1
            }
          }
          while (i < nSeg) {
            val l = lacing(i)
            partial = partial ++ java.util.Arrays.copyOfRange(bytes, bo, bo + l)
            open = true
            bo += l
            if (l < 255) { out += partial; partial = Array.emptyByteArray; open = false }
            i += 1
          }
          o += headLen + bodyLen
        } else o += 1
      }
      out.toSeq
    }
  }

  // ------------------------------------------------------ public decode

  /** `spectral` = the FIRST audio packet's channel-0 floor×residue
    * product (the exact layer the gate hashes — the encoder pins the
    * floor to the table's exact-1.0 entry so these are the transmitted
    * VQ integers); `pcm` = all lapped output samples, (L+R)/2 downmix
    * for stereo. */
  final case class Decoded(sampleRate: Int, channels: Int, nPackets: Int,
                           nSamples: Int, spectral: Array[Double],
                           pcm: Array[Double])

  /** Parsed-setup cache: a corpus ingested from one encoder configuration
    * repeats the identical three header packets across millions of
    * streams, and parseHeaders (codeword assignment + trie build per
    * codebook) dominates short-stream decode cost. Keyed by the EXACT
    * header bytes so any differing stream parses fresh; Setup is
    * immutable after construction (decodePacket only reads it). Bounded:
    * cleared wholesale past 64 distinct configurations. */
  private val setupCache =
    new java.util.concurrent.ConcurrentHashMap[java.math.BigInteger, Setup]()
  private def cachedSetup(pkts: Seq[Array[Byte]]): Setup = {
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < 3) { md.update(pkts(i)); md.update(pkts(i).length.toByte); i += 1 }
    val key = new java.math.BigInteger(1, md.digest())
    val hit = setupCache.get(key)
    if (hit != null) hit
    else {
      val su = parseHeaders(pkts)
      if (setupCache.size >= 64) setupCache.clear()
      setupCache.put(key, su)
      su
    }
  }

  def decode(bytes: Array[Byte]): Option[Decoded] =
    try {
      val pkts = Ogg.packets(bytes)
      if (pkts.length < 4) return None
      val su = cachedSetup(pkts)
      val audio = pkts.drop(3)
      // overlap-add state: previous block's full windowed output and its
      // size. Consecutive blocks lap so their window slopes coincide: a
      // packet emits prevN/4 + n/4 samples (spec §4.8) — the span from
      // the previous block's centre to the current block's centre.
      var prevY: Array[Array[Double]] = null
      var prevN = 0
      var firstSpectral: Array[Double] = null
      val pcmBuf = scala.collection.mutable.ArrayBuffer.empty[Double]
      var nPk = 0
      audio.foreach { p =>
        // end-of-packet conditions are handled INSIDE decodePacket (r17:
        // unused floors / partial residues, spec §1.1.3/§7.2.3/§8.6.2) —
        // only a semantically malformed packet lands here, and per
        // public-decoder convention it is DROPPED and lapping restarts
        // rather than halting the stream
        try {
          val (spec, yw, n) = decodePacket(su, p)
          if (firstSpectral == null) firstSpectral = spec(0)
          if (prevY != null) {
            val hop = prevN / 4 + n / 4
            val shift = n / 4 - prevN / 4 // current-block index offset
            var k = 0
            while (k < hop) {
              var s = 0.0
              var c = 0
              while (c < su.channels) {
                var v = 0.0
                val pi = prevN / 2 + k
                if (pi < prevN) v += prevY(c)(pi)
                val ci = k + shift
                if (ci >= 0) v += yw(c)(ci)
                s += v
                c += 1
              }
              pcmBuf += s / su.channels
              k += 1
            }
          }
          prevY = yw
          prevN = n
          nPk += 1
        } catch { case _: Malformed => prevY = null; prevN = 0 }
      }
      if (firstSpectral == null) None
      else Some(Decoded(su.rate, su.channels, nPk, pcmBuf.length,
        firstSpectral, pcmBuf.toArray))
    } catch {
      case _: Malformed | _: ArrayIndexOutOfBoundsException |
           _: NegativeArraySizeException | _: IllegalArgumentException |
           _: NullPointerException => None
    }

  // ------------------------------------------------------------ encoder
  //
  // Spec-shaped encoder for the gates (the FLAC/MP3 discipline): emits a
  // REAL Ogg Vorbis stream — transmitted codebooks, floor1, residue
  // type 1 (mono) / type 2 + square-polar coupling (stereo) — that the
  // GENERAL header parser above consumes with no shared state. The
  // floor is pinned flat at inverse-dB entry 255 (exactly 1.0), so the
  // decoded floor×residue spectrum IS the transmitted VQ integer
  // sequence: lossless through the entropy layer, hash-gateable.

  /** The residue value book: 8 entries × 2 dims, explicit (lookup 2)
    * values `mult − 3` with mults in 0..7 — entry e maps to the pair
    * (VA(e), VB(e)). Public for the oracle replay. */
  val EntryA: Array[Int] = Array(0, 1, -1, 2, -2, 3, -3, 4)
  val EntryB: Array[Int] = Array(0, 0, 0, 1, -1, 2, -2, 3)

  private val FloorBookLengths = Array.fill(64)(6)   // floor posts, 1-dim scalar
  private val ClassBookLengths = Array.fill(4)(2)    // classwords, 2 dims × 2 classes
  private val ValueBookLengths = Array.fill(8)(3)    // residue VQ, 2 dims
  private lazy val FloorBookCodes = assignCodewords(FloorBookLengths)
  private lazy val ClassBookCodes = assignCodewords(ClassBookLengths)
  private lazy val ValueBookCodes = assignCodewords(ValueBookLengths)
  // lattice-variant books: a SPARSE floor book (128 entries, odd ids
  // unused — posts map to entry 2v) and an ORDERED-coded lookup-type-1
  // value book (9 entries, 3x3 lattice over mults [0,1,2] - 1) — these
  // exist so the ordered/sparse/lattice read paths of the general
  // parser are gated, not just implemented
  private val SparseFloorLengths = Array.tabulate(128)(i => if (i % 2 == 0) 7 else 0)
  private val LatticeValueLengths = Array.fill(9)(4)
  private lazy val SparseFloorCodes = assignCodewords(SparseFloorLengths)
  private lazy val LatticeValueCodes = assignCodewords(LatticeValueLengths)
  // floor0 LSP coefficient book: 8 entries × 2 dims, explicit lookup-2
  // values `mult + 1` (min 1, delta 1) — entry e maps to the raw-mult
  // pair (LspA(e), LspB(e)). Coefficients stay >= 1 so no cos(coeff)
  // can coincide with cos(0) at Bark-map bin 0. Public for the specs'
  // independent curve expectation.
  val LspA: Array[Int] = Array(0, 1, 2, 3, 4, 5, 6, 7)
  val LspB: Array[Int] = Array(2, 7, 4, 1, 6, 3, 0, 5)
  private val LspBookLengths = Array.fill(8)(3)
  private lazy val LspBookCodes = assignCodewords(LspBookLengths)
  /** Lattice entry e → value pair ((e mod 3) − 1, ((e/3) mod 3) − 1):
    * dim 0 is the LOW lattice digit (spec index order). Public for the
    * lattice gate's expectation. */
  def latticeA(e: Int): Int = e % 3 - 1
  def latticeB(e: Int): Int = (e / 3) % 3 - 1

  private val BlockSize = 256 // default blocksize; ws streams use 128/256
  /** VQ entries consumed per audio packet: partition 0 is class 0
    * (books-less, decodes to zeros), the rest class 1 at 4 entries per
    * 8-sample partition. */
  def entriesPerPacket(stereo: Boolean): Int =
    ((if (stereo) 2 * BlockSize / 2 else BlockSize / 2) / 8 - 1) * 4

  /** `mode` 0 = unordered dense, 1 = unordered SPARSE (length 0 =
    * unused), 2 = ORDERED (lengths must be nondecreasing). */
  private def writeCodebook(w: BitWriter, dims: Int, lengths: Array[Int],
                            lookup: Int, mults: Array[Int], valBits: Int,
                            minMant: Long, minNeg: Boolean,
                            mode: Int = 0): Unit = {
    w.putBits(0x564342, 24)
    w.putBits(dims, 16)
    w.putBits(lengths.length, 24)
    if (mode == 2) {
      w.putBits(1, 1) // ordered
      var i = 0
      var cl = lengths(0)
      w.putBits(cl - 1, 5)
      while (i < lengths.length) {
        var k = i
        while (k < lengths.length && lengths(k) == cl) k += 1
        w.putBits(k - i, ilog(lengths.length - i))
        i = k
        cl += 1
      }
    } else {
      w.putBits(0, 1) // unordered
      w.putBits(if (mode == 1) 1 else 0, 1) // sparse flag
      lengths.foreach { l =>
        if (mode == 1) {
          if (l == 0) w.putBits(0, 1)
          else { w.putBits(1, 1); w.putBits(l - 1, 5) }
        } else w.putBits(l - 1, 5)
      }
    }
    w.putBits(lookup, 4)
    if (lookup == 1 || lookup == 2) {
      w.putBits(f32Pack(minMant, 0, minNeg), 32) // min value
      w.putBits(f32Pack(1, 0, neg = false), 32)  // delta = 1.0
      w.putBits(valBits - 1, 4)
      w.putBits(0, 1) // sequence_p
      mults.foreach(m => w.putBits(m, valBits))
    }
  }

  // The three header packets are a pure function of these four knobs and
  // the gate encodes one configuration across the whole corpus — memoize
  // (the per-row BitWriter walk was half the encode cost).
  private val headerCache = new java.util.concurrent.ConcurrentHashMap[
    (Int, Int, Boolean, Boolean, Int), Seq[Array[Byte]]]()
  private def headerPackets(channels: Int, rate: Int,
                            lattice: Boolean = false,
                            ws: Boolean = false,
                            floor0Order: Int = 0): Seq[Array[Byte]] =
    headerCache.computeIfAbsent((channels, rate, lattice, ws, floor0Order), { _ =>
      buildHeaderPackets(channels, rate, lattice, ws, floor0Order)
    })

  private def buildHeaderPackets(channels: Int, rate: Int,
                                 lattice: Boolean,
                                 ws: Boolean,
                                 floor0Order: Int = 0): Seq[Array[Byte]] = {
    def tagged(t: Int): BitWriter = {
      val w = new BitWriter
      w.putBits(t, 8)
      "vorbis".foreach(c => w.putBits(c.toInt, 8))
      w
    }
    val ident = tagged(1)
    ident.putBits(0, 32)          // vorbis_version
    ident.putBits(channels, 8)
    ident.putBits(rate, 32)
    ident.putBits(0, 32); ident.putBits(0, 32); ident.putBits(0, 32)
    if (ws) { ident.putBits(7, 4); ident.putBits(8, 4) } // blocksizes 128 / 256
    else { ident.putBits(8, 4); ident.putBits(8, 4) }    // blocksize 256 / 256
    ident.putBits(1, 1)           // framing
    val comment = tagged(3)
    comment.putBits(0, 32)        // vendor length
    comment.putBits(0, 32)        // user comment count
    comment.putBits(1, 1)         // framing
    val su = tagged(5)
    // 3 codebooks: 0 = floor posts (floor1) / LSP coefficients (floor0),
    // 1 = residue classwords, 2 = VQ values
    su.putBits(2, 8)
    if (floor0Order > 0) {
      val mults = (0 until 8).flatMap(e => Seq(LspA(e), LspB(e))).toArray
      writeCodebook(su, 2, LspBookLengths, 2, mults, 3, 1, minNeg = false)
    } else if (lattice)
      writeCodebook(su, 1, SparseFloorLengths, 0, Array.emptyIntArray, 0, 0,
        minNeg = false, mode = 1) // sparse floor book
    else
      writeCodebook(su, 1, FloorBookLengths, 0, Array.emptyIntArray, 0, 0, minNeg = false)
    writeCodebook(su, 2, ClassBookLengths, 0, Array.emptyIntArray, 0, 0, minNeg = false)
    if (lattice)
      // ordered lengths + lookup type 1: 3x3 lattice, mults [0,1,2],
      // min -1, delta 1
      writeCodebook(su, 2, LatticeValueLengths, 1, Array(0, 1, 2), 2, 1,
        minNeg = true, mode = 2)
    else {
      val mults = (0 until 8).flatMap(e => Seq(EntryA(e) + 3, EntryB(e) + 3)).toArray
      writeCodebook(su, 2, ValueBookLengths, 2, mults, 3, 3, minNeg = true)
    }
    su.putBits(0, 6); su.putBits(0, 16) // one time transform, type 0
    su.putBits(0, 6) // one floor
    if (floor0Order > 0) {
      // type 0: LSP of the requested order over a 64-entry Bark map,
      // 6 amplitude bits, offset 100, one book (the LSP book, id 0)
      su.putBits(0, 16)
      su.putBits(floor0Order, 8)
      su.putBits(rate, 16)
      su.putBits(64, 16)   // bark_map_size
      su.putBits(6, 6)     // amplitude_bits
      su.putBits(100, 8)   // amplitude_offset
      su.putBits(0, 4)     // number_of_books - 1
      su.putBits(0, 8)     // book list: codebook 0
    } else {
      // type 1: 1 partition / 1 class (dim 1, no subclasses, sub book
      // 0), multiplier 1 (range 256), rangebits 7, interior X 64
      su.putBits(1, 16)
      su.putBits(1, 5)      // partitions
      su.putBits(0, 4)      // partition class list
      su.putBits(0, 3)      // class dims - 1
      su.putBits(0, 2)      // subclass bits
      su.putBits(0 + 1, 8)  // sub book = codebook 0
      su.putBits(0, 2)      // multiplier - 1
      su.putBits(7, 4)      // rangebits
      su.putBits(64, 7)     // interior X value
    }
    // one residue: type 1 (mono) over n/2, type 2 (stereo) interleaved
    val n2 = BlockSize / 2
    val rEnd = if (channels == 2) 2 * n2 else n2
    su.putBits(0, 6)
    su.putBits(if (channels == 2) 2 else 1, 16)
    su.putBits(0, 24)        // begin
    su.putBits(rEnd, 24)     // end
    su.putBits(8 - 1, 24)    // partition size
    su.putBits(2 - 1, 6)     // classifications
    su.putBits(1, 8)         // classbook = codebook 1
    su.putBits(0, 3); su.putBits(0, 1) // class 0 cascade: no passes
    su.putBits(1, 3); su.putBits(0, 1) // class 1 cascade: pass 0
    su.putBits(2, 8)         // class 1 / pass 0 book = codebook 2
    // one mapping, type 0; stereo adds the square-polar coupling step
    su.putBits(0, 6)
    su.putBits(0, 16)
    su.putBits(0, 1) // one submap
    if (channels == 2) {
      su.putBits(1, 1)   // coupling flag
      su.putBits(0, 8)   // steps - 1
      su.putBits(0, 1)   // magnitude channel (ilog(1) = 1 bit)
      su.putBits(1, 1)   // angle channel
    } else su.putBits(0, 1)
    su.putBits(0, 2) // reserved
    su.putBits(0, 8); su.putBits(0, 8); su.putBits(0, 8) // time/floor/residue ids
    if (ws) {
      // two modes sharing mapping 0: mode 0 short, mode 1 long (the
      // residue end clamps to the short block's n/2 per spec)
      su.putBits(1, 6)
      su.putBits(0, 1); su.putBits(0, 16); su.putBits(0, 16); su.putBits(0, 8)
      su.putBits(1, 1); su.putBits(0, 16); su.putBits(0, 16); su.putBits(0, 8)
    } else {
      // one mode: long blocks, mapping 0
      su.putBits(0, 6)
      su.putBits(0, 1); su.putBits(0, 16); su.putBits(0, 16); su.putBits(0, 8)
    }
    su.putBits(1, 1) // framing
    Seq(ident.bytes, comment.bytes, su.bytes)
  }

  /** One audio packet: floor posts (y0, y1, interior v) per channel,
    * partition 0 class 0 (zeros), remaining partitions class 1 carrying
    * `entries` (VQ entry ids 0..7, exactly [[entriesPerPacket]] of
    * them). The default posts pin the floor flat at the table's exact
    * 1.0 entry. */
  private def audioPacket(entries: Array[Int], channels: Int,
                          posts: (Int, Int, Int),
                          lattice: Boolean,
                          unusedFloorCh: Int = -1,
                          wsBits: Option[(Boolean, Boolean, Boolean)] = None,
                          floor0: Option[(Int, Array[Int], Boolean)] = None):
      Array[Byte] = {
    val w = new BitWriter
    w.putBits(0, 1) // audio packet; mode number = 0 bits when one mode
    wsBits.foreach { case (isLong, prevLong, nextLong) =>
      w.putBits(if (isLong) 1 else 0, 1) // mode number (two modes)
      if (isLong) {
        w.putBits(if (prevLong) 1 else 0, 1) // previous window flag
        w.putBits(if (nextLong) 1 else 0, 1) // next window flag
      }
    }
    var c = 0
    while (c < channels) {
      floor0 match {
        case Some((amp, lspEntries, badBook)) =>
          // floor0 per channel: amplitude, booknumber (1 bit at one
          // book; 1 = out of range for the undecodable-packet gate),
          // then the LSP vectors
          if (c == unusedFloorCh) w.putBits(0, 6)
          else {
            w.putBits(amp, 6)
            w.putBits(if (badBook) 1 else 0, 1)
            if (!badBook) lspEntries.foreach(e => w.putHuff(LspBookCodes(e), 3))
          }
        case None => // floor1 per channel: nonzero, y0/y1, coded post
          if (c == unusedFloorCh) w.putBits(0, 1) // spec §4.3.2: floor unused
          else {
            w.putBits(1, 1)
            w.putBits(posts._1, 8); w.putBits(posts._2, 8)
            if (lattice) w.putHuff(SparseFloorCodes(2 * posts._3), 7)
            else w.putHuff(FloorBookCodes(posts._3), 6)
          }
      }
      c += 1
    }
    // residue: interleaved-vector size (type 2 folds channels into one);
    // a short block's vector is half the long one's
    val shortBlock = wsBits.exists(!_._1)
    val n = if (channels == 2) BlockSize
      else if (shortBlock) BlockSize / 4 else BlockSize / 2
    val partVals = n / 8
    require(entries.length == (partVals - 1) * 4,
      s"need ${(partVals - 1) * 4} entries, got ${entries.length}")
    var src = 0
    var p = 0
    while (p < partVals) {
      if (p % 2 == 0) { // classword covers 2 partitions: classes (c_p, c_p+1)
        val c0 = if (p == 0) 0 else 1
        val c1 = 1
        w.putHuff(ClassBookCodes(c0 * 2 + c1), 2)
      }
      if (p != 0) {
        var t = 0
        while (t < 4) {
          val e = entries(src); src += 1
          if (lattice) { require(e >= 0 && e < 9); w.putHuff(LatticeValueCodes(e), 4) }
          else { require(e >= 0 && e < 8); w.putHuff(ValueBookCodes(e), 3) }
          t += 1
        }
      }
      p += 1
    }
    w.bytes
  }

  /** A complete Ogg Vorbis stream at 8 kHz carrying `nPackets` audio
    * packets whose VQ entries come from `data` (byte j → entry
    * data(j mod len) mod 8, consumed sequentially across packets).
    * First packet primes the lap; each later packet yields 128 PCM
    * samples. */
  def encode(data: Array[Byte], nPackets: Int = 2, stereo: Boolean = false,
             floorPosts: (Int, Int, Int) = (255, 255, 0),
             lattice: Boolean = false,
             unusedFloorCh: Int = -1,
             blockPlan: Seq[Boolean] = null,
             floor0Order: Int = 0,
             floor0Amp: Int = 40,
             floor0BadBook: Boolean = false): Array[Byte] = {
    require(data.nonEmpty && nPackets >= 1)
    require(floorPosts._1 < 256 && floorPosts._2 < 256 && floorPosts._3 < 64)
    require(blockPlan == null || (!stereo && !lattice),
      "window-switching streams are mono/explicit-book")
    require(floor0Order == 0 ||
      (!stereo && !lattice && blockPlan == null && floor0Amp > 0 && floor0Amp < 64),
      "floor0 streams are mono, explicit-book, fixed-blocksize")
    val channels = if (stereo) 2 else 1
    val heads = headerPackets(channels, 8000, lattice, ws = blockPlan != null,
      floor0Order = floor0Order)
    val pages = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val serial = 0x67726166 // "graf"
    pages += Ogg.page(Seq(heads(0)), serial, 0, 0L, htype = 2)
    pages += Ogg.page(Seq(heads(1), heads(2)), serial, 1, 0L, htype = 0)
    val nPk = if (blockPlan != null) blockPlan.length else nPackets
    var src = 0
    var p = 0
    while (p < nPk) {
      val nEntryIds = if (lattice) 9 else 8
      val per =
        if (blockPlan == null) entriesPerPacket(stereo)
        else ((if (blockPlan(p)) BlockSize / 2 else BlockSize / 4) / 8 - 1) * 4
      val entries = Array.tabulate(per) { _ =>
        val e = (data(src % data.length) & 0xff) % nEntryIds
        src += 1
        e
      }
      val wsBits =
        if (blockPlan == null) None
        else Some((blockPlan(p),
          p == 0 || blockPlan(p - 1),
          p == nPk - 1 || blockPlan(p + 1)))
      val floor0 =
        if (floor0Order == 0) None
        else Some((floor0Amp,
          Array.tabulate((floor0Order + 1) / 2) { _ =>
            val e = (data(src % data.length) & 0xff) % 8
            src += 1
            e
          },
          floor0BadBook))
      val pkt = audioPacket(entries, channels, floorPosts, lattice,
        unusedFloorCh, wsBits, floor0)
      val granule = (p.toLong) * (BlockSize / 2)
      pages += Ogg.page(Seq(pkt), serial, 2 + p, granule,
        htype = if (p == nPk - 1) 4 else 0)
      p += 1
    }
    pages.flatMap(_.toSeq).toArray
  }
}
