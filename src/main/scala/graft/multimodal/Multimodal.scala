package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * batched feature extraction. The decode step is REAL for the following
  * formats (P6 PPM and 24-bpp BMP images, GIF87a/89a with a full LZW
  * inflater, PNG via chunk walk + JDK zlib + the five scanline
  * unfilters, baseline/color/4:2:0/progressive JPEG with Huffman entropy
  * decode + IDCT, and RIFF/WAVE audio as 16-bit PCM, G.711 μ-law/A-law
  * companding, or IMA ADPCM step-table nibbles — all parsed from the
  * public specs, no external codec library; MultimodalSpec-gated) and
  * falls back to deterministic byte statistics for anything else
  * (arithmetic-coded jpeg and other compressed audio plug in at the same
  * seam). The
  * Spark-side contract — schema, batching, partition-parallel
  * extraction — is what matters at 100 TB and is identical on every
  * path.
  */
object Multimodal {
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("media_type", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType))))))

  /** Wrap documents as fake media rows: payload = utf8 bytes, metadata
    * derived deterministically. Pure column expressions. n_bytes is the
    * BYTE length (octet_length) — the payload contract is byte-based, and
    * the oracle indexes bytes too, so the parity holds beyond ASCII. */
  def asMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").cast("long"),
      col("text").cast("binary").as("payload"),
      struct(
        octet_length(col("text")).cast("long").as("n_bytes"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") % 480 + 16).cast("int").as("height")).as("meta"))

  /** Decoder dispatch: REAL parsers for six formats — P6 PPM and
    * 24-bpp BMP images (header + raw pixels), GIF87a/89a (full LZW
    * inflate + palette lookup), PNG (chunk walk + JDK-zlib inflate +
    * None/Sub/Up/Average/Paeth unfilters), baseline grayscale JPEG
    * (marker walk + canonical Huffman + dequant + IDCT), and 16-bit
    * PCM RIFF/WAVE audio (chunk walk + signed little-endian samples),
    * plus FLAC (RFC 9639 — [[Flac]]: metadata walk, CRC-verified frame
    * headers/footers, fixed + LPC subframes, rice-partitioned
    * residuals, all four stereo channel assignments) and MP3 (MPEG-1
    * Layer III, [[Mp3]]: sync/header/side-info walk, codebook-0/1
    * Huffman + count1 table B, spec requantization, alias reduction,
    * IMDCT and polyphase synthesis — big-value codebooks 2-31 and the
    * Annex B.3 prototype window are printed table data, declared at
    * Mp3.scala's header); no external codec library needed.
    * Byte-statistics fallback for anything else (the honest path —
    * arithmetic-coded jpeg and AAC would plug in here the same way). The
    * feature contract is uniform: 4 doubles (mean, std, max, min) over
    * decoded pixel channel values when a parser matches, over raw payload
    * bytes otherwise, so the pipeline shape (binary in, fixed-size vector
    * out, batched per partition) is identical on every path. */
  def extractFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("media_type", StringType),
      StructField("n_bytes", LongType),
      StructField("features", ArrayType(DoubleType))))
    val rdd = media.select(col("doc_id"), col("meta.media_type"), col("payload")).rdd
      .mapPartitions { it =>
        // batch-at-a-time to mirror the accelerator-feeding access pattern
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val id = r.getLong(0)
            val mt = r.getString(1)
            val bytes = r.getAs[Array[Byte]](2)
            val feats = decode(bytes)
            Row(id, mt, bytes.length.toLong, feats)
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Hard cap on decoded channel values per payload: header-declared
    * geometry is UNTRUSTED (a ~100-byte payload can declare 40000×40000),
    * so every decoder checks its would-be buffer size in Long against
    * this cap before allocating and declines to the byte-stats fallback
    * on violation. 2^24 doubles (128 MiB) comfortably covers any real
    * image/clip a 100 TB corpus row would inline. */
  private[multimodal] val MaxDecodedValues: Long = 1L << 24

  /** True iff a decoded buffer of n channel values is allocatable:
    * positive (catching Long-multiply results that an Int cast would
    * have wrapped) and under the cap. */
  private def saneAlloc(n: Long): Boolean = n > 0 && n <= MaxDecodedValues

  /** Parser dispatch behind a catch-all: any parser defect on hostile or
    * corrupt bytes (index out of bounds, arithmetic overflow, bad
    * number format) degrades to None — the byte-stats fallback — rather
    * than failing the Spark task. */
  private def dispatch(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] =
    scala.util.Try(
      decodePpm(bytes).orElse(decodeBmp(bytes)).orElse(decodeGif(bytes))
        .orElse(decodePng(bytes)).orElse(decodeJpeg(bytes))
        .orElse(decodeJpegProgressive(bytes))
    ).toOption.flatten

  /** (mean, std, max, min) over decoded pixel channels for P6 PPM /
    * 24-bpp BMP payloads; same moments over raw bytes for everything
    * else. Deterministic and codec-free. */
  private[graft] def decode(bytes: Array[Byte]): Seq[Double] =
    dispatch(bytes)
      .map { case (_, _, px) => stats(px) }
      .orElse(scala.util.Try(decodeWav(bytes)).toOption.flatten
        .map { case (_, _, smp) => stats(smp) })
      .orElse(scala.util.Try(Flac.decode(bytes)).toOption.flatten
        .map { case (_, _, smp) => stats(smp) })
      // MP3: stats over granule-0's requantized spectral lines — the
      // spec-exact layer (the PCM tail's prototype window is declared
      // approximate, so it stays out of the oracle-facing contract)
      .orElse(scala.util.Try(Mp3.decode(bytes)).toOption.flatten
        .map(d => stats(d.spectral)))
      .getOrElse(stats(bytes.map(b => (b & 0xff).toDouble)))

  /** Decoded (width, height) when a real parser matches — the metadata
    * side of the decode contract. */
  private[graft] def decodedDims(bytes: Array[Byte]): Option[(Int, Int)] =
    dispatch(bytes).map { case (w, h, _) => (w, h) }

  private def stats(d: Array[Double]): Seq[Double] =
    if (d.isEmpty) Seq(0.0, 0.0, 0.0, 0.0)
    else {
      val mean = d.sum / d.length
      val v = d.map(x => (x - mean) * (x - mean)).sum / d.length
      Seq(mean, math.sqrt(v), d.max, d.min)
    }

  /** P6 binary PixMap: "P6" <ws> width <ws> height <ws> maxval <single
    * ws> then width·height·3 raw RGB bytes; '#' comments allowed in the
    * header (netpbm spec). Returns (w, h, channel values) or None when
    * the payload is not a well-formed 8-bit P6. */
  private def decodePpm(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var pos = 2
    def skipWs(): Unit = {
      var in = true
      while (in && pos < bytes.length) {
        val c = bytes(pos).toChar
        if (c == '#') while (pos < bytes.length && bytes(pos) != '\n') pos += 1
        else if (c.isWhitespace) pos += 1
        else in = false
      }
    }
    def int(): Option[Int] = {
      skipWs()
      val start = pos
      while (pos < bytes.length && bytes(pos).toChar.isDigit) pos += 1
      if (pos == start) None else Some(new String(bytes, start, pos - start).toInt)
    }
    for {
      w <- int(); h <- int(); maxv <- int()
      if w > 0 && h > 0 && maxv == 255 && pos < bytes.length &&
        bytes(pos).toChar.isWhitespace && saneAlloc(w.toLong * h * 3) &&
        bytes.length.toLong - (pos + 1) >= w.toLong * h * 3
    } yield {
      val px = new Array[Double](w * h * 3)
      var i = 0
      while (i < px.length) { px(i) = (bytes(pos + 1 + i) & 0xff).toDouble; i += 1 }
      (w, h, px)
    }
  }

  /** Windows BMP, BITMAPINFOHEADER, 24 bpp uncompressed: pixel rows are
    * bottom-up and padded to 4-byte boundaries — stats read only the
    * w·h·3 channel bytes, skipping padding. Returns None for any other
    * BMP flavor (compressed, paletted, other depths). */
  private def decodeBmp(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    def i32(off: Int): Int =
      (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8) |
        ((bytes(off + 2) & 0xff) << 16) | ((bytes(off + 3) & 0xff) << 24)
    def i16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    val dataOff = i32(10)
    val hdrSize = i32(14)
    val w = i32(18)
    val h = i32(22) // negative = top-down; stats are row-order-invariant
    val bpp = i16(28)
    val compression = i32(30)
    val hAbs = math.abs(h)
    if (hdrSize < 40 || w <= 0 || hAbs == 0 || bpp != 24 || compression != 0 ||
      !saneAlloc(w.toLong * hAbs * 3))
      return None
    val rowSize = ((w * 3 + 3) / 4) * 4
    if (dataOff < 54 || bytes.length.toLong < dataOff.toLong + rowSize.toLong * hAbs)
      return None
    val px = new Array[Double](w * hAbs * 3)
    var r = 0
    var i = 0
    while (r < hAbs) {
      val base = dataOff + r * rowSize
      var c = 0
      while (c < w * 3) { px(i) = (bytes(base + c) & 0xff).toDouble; i += 1; c += 1 }
      r += 1
    }
    Some((w, hAbs, px))
  }

  /** GIF87a/89a decoder with a REAL LZW inflater (variable-width codes,
    * dictionary growth, clear/EOI handling — implemented from the public
    * GIF spec, no codec library). Handles a global color table and skips
    * extension blocks; declines local color tables and interlace (rare
    * in the wild for data payloads; the byte-stats fallback then
    * applies). Returns (w, h, RGB channel values). */
  private def decodeGif(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    if (bytes.length < 13) return None
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val packed = bytes(10) & 0xff
    val hasGct = (packed & 0x80) != 0
    val gctSize = 2 << (packed & 0x07)
    if (!hasGct) return None
    var pos = 13
    if (pos + gctSize * 3 > bytes.length) return None
    val palette = Array.tabulate(gctSize, 3)((i, c) => (bytes(pos + 3 * i + c) & 0xff).toDouble)
    pos += gctSize * 3
    // walk blocks to the first image descriptor
    while (pos < bytes.length && (bytes(pos) & 0xff) == 0x21) { // extension
      pos += 2 // introducer + label
      while (pos < bytes.length && bytes(pos) != 0) pos += 1 + (bytes(pos) & 0xff)
      pos += 1 // block terminator
    }
    if (pos >= bytes.length || (bytes(pos) & 0xff) != 0x2c) return None
    if (pos + 10 > bytes.length) return None
    val w = u16(pos + 5); val h = u16(pos + 7)
    if (!saneAlloc(w.toLong * h * 3)) return None // u16·u16·3 can wrap Int
    val ipacked = bytes(pos + 9) & 0xff
    if ((ipacked & 0x80) != 0 || (ipacked & 0x40) != 0) return None // LCT / interlace
    pos += 10
    if (pos >= bytes.length) return None
    val minCode = bytes(pos) & 0xff
    pos += 1
    // concatenate the LZW sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (pos < bytes.length && bytes(pos) != 0) {
      val n = bytes(pos) & 0xff
      if (pos + 1 + n > bytes.length) return None
      data.write(bytes, pos + 1, n)
      pos += 1 + n
    }
    lzwDecode(data.toByteArray, minCode, w * h).map { indices =>
      val px = new Array[Double](w * h * 3)
      var i = 0
      while (i < w * h) {
        val idx = indices(i)
        if (idx >= gctSize) return None
        px(3 * i) = palette(idx)(0); px(3 * i + 1) = palette(idx)(1)
        px(3 * i + 2) = palette(idx)(2)
        i += 1
      }
      (w, h, px)
    }
  }

  /** GIF-variant LZW: LSB-first variable-width codes starting at
    * minCode+1 bits, clear code resets the dictionary, width grows when
    * the next entry would overflow the current width (cap 12 bits). */
  private def lzwDecode(data: Array[Byte], minCode: Int,
                        nPixels: Int): Option[Array[Int]] = {
    if (minCode < 2 || minCode > 8) return None
    val clear = 1 << minCode
    val eoi = clear + 1
    val dict = new Array[Array[Int]](4096)
    var next = 0
    var width = 0
    def reset(): Unit = {
      var i = 0
      while (i < clear) { dict(i) = Array(i); i += 1 }
      next = eoi + 1
      width = minCode + 1
    }
    reset()
    val out = new Array[Int](nPixels)
    var outPos = 0
    var acc = 0L; var accBits = 0; var bytePos = 0
    var prev: Array[Int] = null
    var done = false
    while (!done) {
      while (accBits < width && bytePos < data.length) {
        acc |= (data(bytePos) & 0xffL) << accBits
        accBits += 8; bytePos += 1
      }
      if (accBits < width) return None // ran out of bits before EOI
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width; accBits -= width
      if (code == clear) { reset(); prev = null }
      else if (code == eoi) done = true
      else {
        val entry: Array[Int] =
          if (code < next && dict(code) != null) dict(code)
          else if (code == next && prev != null) prev :+ prev(0)
          else return None
        if (outPos + entry.length > nPixels) return None
        System.arraycopy(entry, 0, out, outPos, entry.length)
        outPos += entry.length
        if (prev != null && next < 4096) { dict(next) = prev :+ entry(0); next += 1 }
        prev = entry
        if (next == (1 << width) && width < 12) width += 1
        if (outPos == nPixels) {
          // consume the EOI (tolerate its absence at exactly-full output)
          done = true
        }
      }
    }
    if (outPos == nPixels) Some(out) else None
  }

  /** PNG decoder: signature + chunk walk (IHDR/IDAT/IEND), zlib inflate
    * through the JDK's java.util.zip.Inflater (no external codec), and
    * the five scanline unfilters (None/Sub/Up/Average/Paeth) from the
    * PNG spec. Supports 8-bit gray / RGB / RGBA, non-interlaced; anything
    * else (16-bit, palette, Adam7) declines to the byte-stats fallback.
    * Returns (w, h, channel values — alpha included for RGBA). */
  private def decodePng(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    if (bytes.length < 8 || !sig.indices.forall(i => bytes(i) == sig(i))) return None
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
        ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
    var pos = 8
    var w = 0; var h = 0; var depth = 0; var color = -1; var interlace = 0
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && pos + 8 <= bytes.length) {
      val len = u32(pos)
      if (len > Int.MaxValue || pos + 12 + len > bytes.length) return None
      val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          w = u32(pos + 8).toInt; h = u32(pos + 12).toInt
          depth = bytes(pos + 16) & 0xff; color = bytes(pos + 17) & 0xff
          interlace = bytes(pos + 20) & 0xff
          seenIhdr = true
        case "IDAT" => idat.write(bytes, pos + 8, len.toInt)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      pos += 12 + len.toInt
    }
    if (!seenIhdr || !done || w <= 0 || h <= 0 || depth != 8 || interlace != 0)
      return None
    val bpp = color match { case 0 => 1; case 2 => 3; case 6 => 4; case _ => return None }
    // size the raw buffer in Long first: a ~100-byte PNG declaring
    // 40000×40000 RGB would wrap h*(1+w*bpp) in Int (negative-size alloc)
    // or OOM; decline such geometry to the byte-stats fallback instead
    if (!saneAlloc(h.toLong * (1L + w.toLong * bpp))) return None
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var off = 0
      while (off < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        off += n
      }
      if (off != raw.length) return None
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    // unfilter in place into the pixel buffer
    val px = new Array[Double](h * stride)
    val cur = new Array[Int](stride)
    val prior = new Array[Int](stride)
    var r = 0
    while (r < h) {
      val base = r * (1 + stride)
      val ft = raw(base) & 0xff
      if (ft > 4) return None
      var i = 0
      while (i < stride) {
        val x = raw(base + 1 + i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) else 0 // left
        val b = if (r > 0) prior(i) else 0 // up
        val c = if (r > 0 && i >= bpp) prior(i - bpp) else 0 // up-left
        val v = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 => // Paeth predictor
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        cur(i) = v & 0xff
        px(r * stride + i) = (v & 0xff).toDouble
        i += 1
      }
      System.arraycopy(cur, 0, prior, 0, stride)
      r += 1
    }
    Some((w, h, px))
  }

  /** Canonical JPEG Huffman table (T.81 F.2.2.3): per code length l,
    * the smallest/largest assigned code and the offset into the symbol
    * array — decode is array arithmetic, no per-bit allocation. */
  private final case class JpegHuff(count: Array[Int], minCode: Array[Int],
                                    maxCode: Array[Int], valPtr: Array[Int],
                                    symbols: Array[Int])
  private object JpegHuff {
    def apply(bits: Array[Int], vals: Array[Int]): JpegHuff = {
      val count = new Array[Int](17); val minC = new Array[Int](17)
      val maxC = new Array[Int](17); val ptr = new Array[Int](17)
      var code = 0; var vp = 0
      for (l <- 1 to 16) {
        count(l) = bits(l - 1)
        minC(l) = code; ptr(l) = vp
        code += bits(l - 1); vp += bits(l - 1)
        maxC(l) = code - 1
        code <<= 1
      }
      new JpegHuff(count, minC, maxC, ptr, vals)
    }
  }

  /** Precomputed IDCT basis: IdctCos(i)(u) = C(u)·cos((2i+1)uπ/16), so
    * the per-block IDCT is pure table lookups over the SPARSE nonzero
    * coefficient list — a DC-only block (the gate encoders' shape) costs
    * 64 multiply-adds instead of 8192 cos() calls. */
  private val IdctCos: Array[Array[Double]] = Array.tabulate(8, 8) { (i, u) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) *
      math.cos((2 * i + 1) * u * math.Pi / 16.0)
  }

  /** Zigzag scan order: index k → (row u, col v) of the 8×8 coefficient
    * block (JPEG spec figure A.6). */
  private val Zigzag: Array[(Int, Int)] = {
    val out = new Array[(Int, Int)](64)
    var (u, v, k) = (0, 0, 0)
    var up = true
    while (k < 64) {
      out(k) = (u, v); k += 1
      if (up) {
        if (v == 7) { u += 1; up = false }
        else if (u == 0) { v += 1; up = false }
        else { u -= 1; v += 1 }
      } else {
        if (u == 7) { v += 1; up = true }
        else if (v == 0) { u += 1; up = true }
        else { u += 1; v -= 1 }
      }
    }
    out
  }

  /** Baseline JPEG decoder (SOF0, 8-bit, grayscale or 4:4:4 YCbCr):
    * marker walk (DQT/DHT/DRI/SOS, APPn/COM skipped), canonical Huffman
    * decode over the byte-stuffed entropy stream with restart handling,
    * per-component DC prediction + run-length AC, dezigzag, dequantize,
    * a direct double-precision IDCT, and the JFIF YCbCr→RGB conversion —
    * implemented from the public JPEG spec (T.81), no codec library.
    * Sampling factors 1..2 per axis decode (4:4:4 through 4:2:0, the
    * real-world default); progressive (SOF2) declines to the byte-stats
    * fallback. */
  private def decodeJpeg(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    def u16(off: Int): Int = ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    val qt = Array.fill(4)(null: Array[Int])
    // canonical Huffman tables per (class, id) — T.81 F.2.2.3 DECODE
    val huff = Array.fill(2, 4)(null: JpegHuff)
    var w = 0; var h = 0
    var restartInterval = 0
    var nf = 0
    var compIds: Array[Int] = null
    var compQtIds: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var dcTables: Array[Int] = null
    var acTables: Array[Int] = null
    var sosPos = -1
    var pos = 2
    var scanning = true
    while (scanning && pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return None
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd9) return None // EOI before SOS
      val len = u16(pos + 2)
      if (pos + 2 + len > bytes.length) return None
      val dp = pos + 4 // chunk data start
      marker match {
        case 0xdb => // DQT — possibly several tables
          var p = dp
          while (p < pos + 2 + len) {
            if (p + 65 > pos + 2 + len) return None // truncated table
            val pq = (bytes(p) & 0xf0) >> 4; val tq = bytes(p) & 0x0f
            if (pq != 0 || tq > 3) return None // 16-bit tables undeclared
            qt(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
            p += 65
          }
        case 0xc0 => // SOF0 baseline: 1 (gray) or 3 (YCbCr) components
          if (len < 8) return None
          val precision = bytes(dp) & 0xff
          h = u16(dp + 1); w = u16(dp + 3)
          nf = bytes(dp + 5) & 0xff
          if (precision != 8 || (nf != 1 && nf != 3)) return None
          if (dp + 6 + 3 * nf > pos + 2 + len) return None // truncated comps
          compIds = new Array[Int](nf); compQtIds = new Array[Int](nf)
          compH = new Array[Int](nf); compV = new Array[Int](nf)
          for (c <- 0 until nf) {
            compIds(c) = bytes(dp + 6 + 3 * c) & 0xff
            val hv = bytes(dp + 7 + 3 * c) & 0xff
            compH(c) = (hv >> 4) & 0x0f; compV(c) = hv & 0x0f
            if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2)
              return None // 1x1 / 2x1 / 1x2 / 2x2 sampling (4:4:4 .. 4:2:0)
            compQtIds(c) = bytes(dp + 8 + 3 * c) & 0x0f
          }
        case 0xc2 => return None // progressive undeclared
        case 0xc4 => // DHT — possibly several tables
          var p = dp
          while (p < pos + 2 + len) {
            if (p + 17 > pos + 2 + len) return None // truncated bits array
            val tc = (bytes(p) & 0xf0) >> 4; val th = bytes(p) & 0x0f
            if (tc > 1 || th > 3) return None
            val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
            val nVals = bits.sum
            if (p + 17 + nVals > pos + 2 + len) return None
            val vals = Array.tabulate(nVals)(i => bytes(p + 17 + i) & 0xff)
            huff(tc)(th) = JpegHuff(bits, vals)
            p = p + 17 + nVals
          }
        case 0xdd =>
          if (len < 4) return None
          restartInterval = u16(dp)
        case 0xda => // SOS: component selectors map scan tables by id
          if (len < 3) return None
          val ns = bytes(dp) & 0xff
          if (compIds == null || ns != nf) return None
          if (dp + 1 + 2 * ns + 3 > pos + 2 + len) return None // truncated scan
          dcTables = new Array[Int](nf); acTables = new Array[Int](nf)
          for (s <- 0 until ns) {
            val cs = bytes(dp + 1 + 2 * s) & 0xff
            val c = compIds.indexOf(cs)
            if (c < 0) return None
            dcTables(c) = (bytes(dp + 2 + 2 * s) & 0xf0) >> 4
            acTables(c) = bytes(dp + 2 + 2 * s) & 0x0f
          }
          sosPos = dp + 1 + 2 * ns + 3 // Ns byte + per-comp pairs + Ss/Se/AhAl
          scanning = false
        case _ => () // APPn / COM / others: skip by length
      }
      if (scanning) pos += 2 + len
    }
    if (sosPos < 0 || w <= 0 || h <= 0 ||
      (0 until nf).exists(c => compQtIds(c) > 3 || qt(compQtIds(c)) == null ||
        huff(0)(dcTables(c)) == null || huff(1)(acTables(c)) == null)) return None
    val dcMaps = Array.tabulate(nf)(c => huff(0)(dcTables(c)))
    val acMaps = Array.tabulate(nf)(c => huff(1)(acTables(c)))
    val qts = Array.tabulate(nf)(c => qt(compQtIds(c)))

    // entropy-coded bit reader with FF00 unstuffing and RSTn handling
    var bp = sosPos; var acc = 0; var accBits = 0
    def nextBit(): Int = {
      while (accBits == 0) {
        if (bp >= bytes.length) return -1
        val b = bytes(bp) & 0xff; bp += 1
        if (b == 0xff) {
          if (bp >= bytes.length) return -1
          val m = bytes(bp) & 0xff
          if (m == 0x00) { bp += 1; acc = 0xff; accBits = 8 }
          else return -1 // real marker: out of data
        } else { acc = b; accBits = 8 }
      }
      accBits -= 1
      (acc >> accBits) & 1
    }
    def huffDecode(t: JpegHuff): Int = {
      var code = 0; var l = 0
      while (l < 16) {
        val b = nextBit(); if (b < 0) return -1
        code = (code << 1) | b; l += 1
        if (t.count(l) > 0 && code <= t.maxCode(l))
          return t.symbols(t.valPtr(l) + code - t.minCode(l))
      }
      -1
    }
    def receiveExtend(t: Int): Int = {
      if (t == 0) return 0
      var v = 0
      for (_ <- 0 until t) { val b = nextBit(); if (b < 0) return Int.MinValue; v = (v << 1) | b }
      if (v < (1 << (t - 1))) v - (1 << t) + 1 else v
    }
    val hMax = (0 until nf).map(compH(_)).max
    val vMax = (0 until nf).map(compV(_)).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    // per-component padded planes at the component's own resolution;
    // plane size computed in Long before allocation — SOF-declared dims
    // are untrusted and u16·u16·(2·8)² can wrap Int
    if ((0 until nf).exists { c =>
        val plane = mcusX.toLong * compH(c) * 8 * mcusY * compV(c) * 8
        !saneAlloc(plane)
      } || !saneAlloc(w.toLong * h * (if (nf == 1) 1 else 3))) return None
    val strides = Array.tabulate(nf)(c => mcusX * compH(c) * 8)
    val planes = Array.tabulate(nf)(c =>
      new Array[Double](strides(c) * mcusY * compV(c) * 8))
    val prevDc = new Array[Int](nf)
    var mcuCount = 0
    // sparse coefficient list for the table-driven IDCT
    val nzU = new Array[Int](64); val nzV = new Array[Int](64)
    val nzC = new Array[Double](64)
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcuCount > 0 && mcuCount % restartInterval == 0) {
          // skip to the RSTn marker boundary and reset prediction
          accBits = 0
          if (bp + 1 < bytes.length && (bytes(bp) & 0xff) == 0xff &&
            (bytes(bp + 1) & 0xff) >= 0xd0 && (bytes(bp + 1) & 0xff) <= 0xd7) bp += 2
          java.util.Arrays.fill(prevDc, 0)
        }
        // hi×vi blocks per component per MCU, raster order (T.81 A.2.3)
        var c = 0
        while (c < nf) {
          val q = qts(c)
          var v0 = 0
          while (v0 < compV(c)) {
            var h0 = 0
            while (h0 < compH(c)) {
              val t = huffDecode(dcMaps(c)); if (t < 0 || t > 11) return None
              val diff = receiveExtend(t); if (diff == Int.MinValue) return None
              prevDc(c) += diff
              nzU(0) = 0; nzV(0) = 0; nzC(0) = prevDc(c).toDouble * q(0)
              var nz = 1
              var k = 1
              var inBlock = true
              while (inBlock && k < 64) {
                val rs = huffDecode(acMaps(c)); if (rs < 0) return None
                if (rs == 0x00) inBlock = false // EOB
                else if (rs == 0xf0) k += 16 // ZRL
                else {
                  k += (rs >> 4)
                  if (k > 63) return None
                  val s = rs & 0x0f
                  val v = receiveExtend(s); if (v == Int.MinValue) return None
                  nzU(nz) = Zigzag(k)._1; nzV(nz) = Zigzag(k)._2
                  nzC(nz) = v.toDouble * q(k); nz += 1
                  k += 1
                }
              }
              // table-driven sparse IDCT + level shift into the plane
              val plane = planes(c)
              val baseY = (my * compV(c) + v0) * 8
              val baseX = (mx * compH(c) + h0) * 8
              var y = 0
              while (y < 8) {
                val rowC = IdctCos(y)
                var x = 0
                while (x < 8) {
                  val colC = IdctCos(x)
                  var sum = 0.0
                  var j = 0
                  while (j < nz) {
                    sum += nzC(j) * rowC(nzU(j)) * colC(nzV(j))
                    j += 1
                  }
                  val px = math.max(0.0, math.min(255.0, math.rint(sum / 4.0 + 128.0)))
                  plane((baseY + y) * strides(c) + baseX + x) = px
                  x += 1
                }
                y += 1
              }
              h0 += 1
            }
            v0 += 1
          }
          c += 1
        }
        mcuCount += 1
        mx += 1
      }
      my += 1
    }
    // crop block padding to (w, h); subsampled components upsample by
    // replication (integer index division); 3 components → JFIF RGB
    def sampleAt(c: Int, x: Int, y: Int): Double =
      planes(c)((y * compV(c) / vMax) * strides(c) + (x * compH(c) / hMax))
    if (nf == 1) {
      val out = new Array[Double](w * h)
      var r = 0
      while (r < h) {
        var c2 = 0
        while (c2 < w) { out(r * w + c2) = sampleAt(0, c2, r); c2 += 1 }
        r += 1
      }
      Some((w, h, out))
    } else {
      val out = new Array[Double](w * h * 3)
      def clamp8(x: Double): Double = math.max(0.0, math.min(255.0, math.rint(x)))
      var r = 0
      while (r < h) {
        var c2 = 0
        while (c2 < w) {
          val y = sampleAt(0, c2, r)
          val cb = sampleAt(1, c2, r) - 128.0
          val cr = sampleAt(2, c2, r) - 128.0
          val o = (r * w + c2) * 3
          out(o) = clamp8(y + 1.402 * cr)
          out(o + 1) = clamp8(y - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp8(y + 1.772 * cb)
          c2 += 1
        }
        r += 1
      }
      Some((w, h, out))
    }
  }

  /** PROGRESSIVE JPEG decoder (SOF2, 8-bit, grayscale or 4:4:4..4:2:0
    * YCbCr) — implemented from T.81 Annex G, no codec library: multi-scan
    * marker walk with inter-scan DQT/DHT redefinitions, spectral
    * selection (Ss..Se bands), successive approximation for DC (first +
    * one-bit refinement scans) and AC (first scans with EOB-run decoding,
    * refinement scans with the correction-bit algorithm of G.2.2.3),
    * restart handling, interleaved DC scans and the mandatory
    * single-component AC scans with the component's OWN block grid —
    * then one dequantize + IDCT reconstruction at EOI. Baseline (SOF0)
    * routes through [[decodeJpeg]]; this declines it and vice versa. */
  private def decodeJpegProgressive(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    def u16(off: Int): Int = ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    val qt = Array.fill(4)(null: Array[Int])
    val huff = Array.fill(2, 4)(null: JpegHuff)
    var w = 0; var h = 0
    var restartInterval = 0
    var nf = 0
    var compIds: Array[Int] = null
    var compQtIds: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var hMax = 0; var vMax = 0; var mcusX = 0; var mcusY = 0
    // per-component coefficient store over the PADDED (MCU) block grid;
    // non-interleaved scans iterate the component's own ceil grid inside it
    var coefs: Array[Array[Int]] = null
    var bwArr: Array[Int] = null; var bhArr: Array[Int] = null // padded grids
    var cwArr: Array[Int] = null; var chArr: Array[Int] = null // used grids
    val prevDc = new Array[Int](4)
    var pos = 2
    var sawEoi = false
    while (!sawEoi) {
      if (pos + 2 > bytes.length || (bytes(pos) & 0xff) != 0xff) return None
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd9) { sawEoi = true }
      else {
        if (pos + 4 > bytes.length) return None
        val len = u16(pos + 2)
        if (len < 2 || pos + 2 + len > bytes.length) return None
        val dp = pos + 4
        val segEnd = pos + 2 + len
        var nextPos = segEnd
        marker match {
          case 0xdb =>
            var p = dp
            while (p < segEnd) {
              if (p + 65 > segEnd) return None
              val pq = (bytes(p) & 0xf0) >> 4; val tq = bytes(p) & 0x0f
              if (pq != 0 || tq > 3) return None
              qt(tq) = Array.tabulate(64)(i => bytes(p + 1 + i) & 0xff)
              p += 65
            }
          case 0xc4 =>
            var p = dp
            while (p < segEnd) {
              if (p + 17 > segEnd) return None
              val tc = (bytes(p) & 0xf0) >> 4; val th = bytes(p) & 0x0f
              if (tc > 1 || th > 3) return None
              val bits = Array.tabulate(16)(i => bytes(p + 1 + i) & 0xff)
              val nVals = bits.sum
              if (p + 17 + nVals > segEnd) return None
              val vals = Array.tabulate(nVals)(i => bytes(p + 17 + i) & 0xff)
              huff(tc)(th) = JpegHuff(bits, vals)
              p = p + 17 + nVals
            }
          case 0xdd =>
            if (len < 4) return None
            restartInterval = u16(dp)
          case 0xc2 =>
            if (len < 8) return None
            val precision = bytes(dp) & 0xff
            h = u16(dp + 1); w = u16(dp + 3)
            nf = bytes(dp + 5) & 0xff
            if (precision != 8 || (nf != 1 && nf != 3)) return None
            if (dp + 6 + 3 * nf > segEnd) return None
            compIds = new Array[Int](nf); compQtIds = new Array[Int](nf)
            compH = new Array[Int](nf); compV = new Array[Int](nf)
            for (c <- 0 until nf) {
              compIds(c) = bytes(dp + 6 + 3 * c) & 0xff
              val hv = bytes(dp + 7 + 3 * c) & 0xff
              compH(c) = (hv >> 4) & 0x0f; compV(c) = hv & 0x0f
              if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2)
                return None
              compQtIds(c) = bytes(dp + 8 + 3 * c) & 0x0f
              if (compQtIds(c) > 3) return None
            }
            hMax = (0 until nf).map(compH(_)).max
            vMax = (0 until nf).map(compV(_)).max
            mcusX = (w + 8 * hMax - 1) / (8 * hMax)
            mcusY = (h + 8 * vMax - 1) / (8 * vMax)
            if (w <= 0 || h <= 0) return None
            if ((0 until nf).exists { c =>
                !saneAlloc(mcusX.toLong * compH(c) * mcusY * compV(c) * 64)
              } || !saneAlloc(w.toLong * h * (if (nf == 1) 1 else 3))) return None
            bwArr = Array.tabulate(nf)(c => mcusX * compH(c))
            bhArr = Array.tabulate(nf)(c => mcusY * compV(c))
            cwArr = Array.tabulate(nf) { c =>
              val compW = (w * compH(c) + hMax - 1) / hMax // T.81 A.1.1
              (compW + 7) / 8
            }
            chArr = Array.tabulate(nf) { c =>
              val compHt = (h * compV(c) + vMax - 1) / vMax
              (compHt + 7) / 8
            }
            coefs = Array.tabulate(nf)(c => new Array[Int](bwArr(c) * bhArr(c) * 64))
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // only SOF2 here (SOF0 routes through decodeJpeg)
          case 0xda =>
            if (coefs == null || len < 6) return None
            val ns = bytes(dp) & 0xff
            if (ns < 1 || ns > nf || dp + 1 + 2 * ns + 3 > segEnd) return None
            val scanComps = new Array[Int](ns)
            val dcT = new Array[Int](ns); val acT = new Array[Int](ns)
            for (s <- 0 until ns) {
              val cs = bytes(dp + 1 + 2 * s) & 0xff
              val c = compIds.indexOf(cs)
              if (c < 0) return None
              scanComps(s) = c
              dcT(s) = (bytes(dp + 2 + 2 * s) & 0xf0) >> 4
              acT(s) = bytes(dp + 2 + 2 * s) & 0x0f
              if (dcT(s) > 3 || acT(s) > 3) return None
            }
            val ss = bytes(dp + 1 + 2 * ns) & 0xff
            val se = bytes(dp + 2 + 2 * ns) & 0xff
            val ahal = bytes(dp + 3 + 2 * ns) & 0xff
            val ah = (ahal >> 4) & 0x0f; val al = ahal & 0x0f
            if (se > 63 || ss > se) return None
            if (ss == 0 && se != 0) return None // progressive DC scans are DC-only
            if (ss > 0 && ns != 1) return None // AC scans are single-component
            // entropy bit reader over this scan's data
            var bp = dp + 1 + 2 * ns + 3
            var acc = 0; var accBits = 0
            var fail = false
            def nextBit(): Int = {
              while (accBits == 0) {
                if (bp >= bytes.length) return -1
                val b0 = bytes(bp) & 0xff; bp += 1
                if (b0 == 0xff) {
                  if (bp >= bytes.length) return -1
                  val m = bytes(bp) & 0xff
                  if (m == 0x00) { bp += 1; acc = 0xff; accBits = 8 }
                  else return -1 // real marker: out of data
                } else { acc = b0; accBits = 8 }
              }
              accBits -= 1
              (acc >> accBits) & 1
            }
            def huffDec(t: JpegHuff): Int = {
              if (t == null) { fail = true; return -1 }
              var code = 0; var l = 0
              while (l < 16) {
                val b0 = nextBit(); if (b0 < 0) { fail = true; return -1 }
                code = (code << 1) | b0; l += 1
                if (t.count(l) > 0 && code <= t.maxCode(l))
                  return t.symbols(t.valPtr(l) + code - t.minCode(l))
              }
              fail = true; -1
            }
            def receive(n: Int): Int = {
              var v = 0
              var i = 0
              while (i < n) {
                val b0 = nextBit(); if (b0 < 0) { fail = true; return 0 }
                v = (v << 1) | b0; i += 1
              }
              v
            }
            def extend(v: Int, t: Int): Int =
              if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v
            var eobrun = 0
            java.util.Arrays.fill(prevDc, 0)
            var unit = 0 // MCUs (interleaved) or blocks (single-comp scan)
            def restartIfDue(): Unit =
              if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
                accBits = 0
                if (bp + 1 < bytes.length && (bytes(bp) & 0xff) == 0xff &&
                  (bytes(bp + 1) & 0xff) >= 0xd0 && (bytes(bp + 1) & 0xff) <= 0xd7)
                  bp += 2
                java.util.Arrays.fill(prevDc, 0)
                eobrun = 0
              }
            def dcBlock(c: Int, s: Int, off: Int): Unit = {
              if (ah == 0) {
                val t = huffDec(huff(0)(dcT(s))); if (fail || t < 0 || t > 11) { fail = true; return }
                val diff = extend(receive(t), t); if (fail) return
                prevDc(c) += diff
                coefs(c)(off) = prevDc(c) << al
              } else {
                val b0 = nextBit(); if (b0 < 0) { fail = true; return }
                if (b0 == 1) coefs(c)(off) += (1 << al)
              }
            }
            def acFirst(c: Int, off: Int): Unit = {
              if (eobrun > 0) { eobrun -= 1; return }
              var k = ss
              var done = false
              while (!done && k <= se) {
                val rs = huffDec(huff(1)(acT(0))); if (fail) return
                val r = (rs >> 4) & 0x0f; val sNib = rs & 0x0f
                if (sNib == 0) {
                  if (r == 15) k += 16 // ZRL
                  else { eobrun = (1 << r) - 1 + receive(r); done = true }
                } else {
                  k += r
                  if (k > se) { fail = true; return }
                  val z = Zigzag(k)
                  coefs(c)(off + z._1 * 8 + z._2) = extend(receive(sNib), sNib) << al
                  k += 1
                }
              }
            }
            def acRefine(c: Int, off: Int): Unit = {
              val p1 = 1 << al
              var k = ss
              if (eobrun == 0) {
                var break = false
                while (!break && k <= se) {
                  val rs = huffDec(huff(1)(acT(0))); if (fail) return
                  var r = (rs >> 4) & 0x0f; val sNib = rs & 0x0f
                  var newval = 0
                  if (sNib == 0) {
                    // EOBn: the run INCLUDES the current block — its
                    // remaining nonzero-history coefficients still take
                    // correction bits below, then the run decrements
                    if (r != 15) { eobrun = (1 << r) + receive(r); break = true }
                  } else {
                    if (sNib != 1) { fail = true; return }
                    val b0 = nextBit(); if (b0 < 0) { fail = true; return }
                    newval = if (b0 == 1) p1 else -p1
                  }
                  if (!break) {
                    var placed = false
                    while (!placed && k <= se) {
                      val z = Zigzag(k); val zi = off + z._1 * 8 + z._2
                      if (coefs(c)(zi) != 0) {
                        val b0 = nextBit(); if (b0 < 0) { fail = true; return }
                        if (b0 == 1 && (math.abs(coefs(c)(zi)) & p1) == 0)
                          coefs(c)(zi) += (if (coefs(c)(zi) >= 0) p1 else -p1)
                      } else {
                        if (r == 0) { if (newval != 0) coefs(c)(zi) = newval; placed = true }
                        else r -= 1
                      }
                      k += 1
                    }
                    if (!placed && newval != 0) { fail = true; return } // band ended mid-run
                  }
                }
              }
              if (eobrun > 0) {
                while (k <= se) {
                  val z = Zigzag(k); val zi = off + z._1 * 8 + z._2
                  if (coefs(c)(zi) != 0) {
                    val b0 = nextBit(); if (b0 < 0) { fail = true; return }
                    if (b0 == 1 && (math.abs(coefs(c)(zi)) & p1) == 0)
                      coefs(c)(zi) += (if (coefs(c)(zi) >= 0) p1 else -p1)
                  }
                  k += 1
                }
                eobrun -= 1
              }
            }
            if (ss == 0 && ns > 1) {
              // interleaved DC scan: MCU raster, hi×vi blocks per comp
              var my = 0
              while (my < mcusY && !fail) {
                var mx = 0
                while (mx < mcusX && !fail) {
                  restartIfDue()
                  var s = 0
                  while (s < ns && !fail) {
                    val c = scanComps(s)
                    var v0 = 0
                    while (v0 < compV(c) && !fail) {
                      var h0 = 0
                      while (h0 < compH(c) && !fail) {
                        val by = my * compV(c) + v0; val bx = mx * compH(c) + h0
                        dcBlock(c, s, (by * bwArr(c) + bx) * 64)
                        h0 += 1
                      }
                      v0 += 1
                    }
                    s += 1
                  }
                  unit += 1
                  mx += 1
                }
                my += 1
              }
            } else {
              // single-component scan (any DC/AC band): the component's
              // OWN ceil block grid, raster order (T.81 A.2.2)
              val c = scanComps(0)
              var by = 0
              while (by < chArr(c) && !fail) {
                var bx = 0
                while (bx < cwArr(c) && !fail) {
                  restartIfDue()
                  val off = (by * bwArr(c) + bx) * 64
                  if (ss == 0) dcBlock(c, 0, off)
                  else if (ah == 0) acFirst(c, off)
                  else acRefine(c, off)
                  unit += 1
                  bx += 1
                }
                by += 1
              }
            }
            if (fail) return None
            // resume the marker walk at the first real marker after the
            // scan's entropy data (skipping stuffed FF00 and RSTn)
            var mp = bp
            var found = false
            while (!found && mp + 1 < bytes.length) {
              if ((bytes(mp) & 0xff) == 0xff) {
                val m = bytes(mp + 1) & 0xff
                if (m == 0x00) mp += 2
                else if (m >= 0xd0 && m <= 0xd7) mp += 2
                else found = true
              } else mp += 1
            }
            if (!found) return None
            nextPos = mp
          case _ => () // APPn / COM: skip by length
        }
        pos = if (marker == 0xda) nextPos else segEnd
      }
    }
    if (coefs == null ||
      (0 until nf).exists(c => qt(compQtIds(c)) == null)) return None
    // reconstruction: dequant + dense IDCT per block into padded planes,
    // then the baseline decoder's upsample + YCbCr→RGB arithmetic
    val strides = Array.tabulate(nf)(c => bwArr(c) * 8)
    val planes = Array.tabulate(nf)(c =>
      new Array[Double](strides(c) * bhArr(c) * 8))
    for (c <- 0 until nf) {
      val q = qt(compQtIds(c))
      val dq = new Array[Double](64)
      var by = 0
      while (by < bhArr(c)) {
        var bx = 0
        while (bx < bwArr(c)) {
          val off = (by * bwArr(c) + bx) * 64
          var k = 0
          while (k < 64) {
            val z = Zigzag(k)
            dq(z._1 * 8 + z._2) = coefs(c)(off + z._1 * 8 + z._2).toDouble * q(k)
            k += 1
          }
          var y = 0
          while (y < 8) {
            val rowC = IdctCos(y)
            var x = 0
            while (x < 8) {
              val colC = IdctCos(x)
              var sum = 0.0
              var u = 0
              while (u < 8) {
                var v = 0
                while (v < 8) {
                  val cv = dq(u * 8 + v)
                  if (cv != 0.0) sum += cv * rowC(u) * colC(v)
                  v += 1
                }
                u += 1
              }
              planes(c)((by * 8 + y) * strides(c) + bx * 8 + x) =
                math.max(0.0, math.min(255.0, math.rint(sum / 4.0 + 128.0)))
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
    }
    def sampleAt(c: Int, x: Int, y: Int): Double =
      planes(c)((y * compV(c) / vMax) * strides(c) + (x * compH(c) / hMax))
    if (nf == 1) {
      val out = new Array[Double](w * h)
      var r = 0
      while (r < h) {
        var c2 = 0
        while (c2 < w) { out(r * w + c2) = sampleAt(0, c2, r); c2 += 1 }
        r += 1
      }
      Some((w, h, out))
    } else {
      val out = new Array[Double](w * h * 3)
      def clamp8(x: Double): Double = math.max(0.0, math.min(255.0, math.rint(x)))
      var r = 0
      while (r < h) {
        var c2 = 0
        while (c2 < w) {
          val y = sampleAt(0, c2, r)
          val cb = sampleAt(1, c2, r) - 128.0
          val cr = sampleAt(2, c2, r) - 128.0
          val o = (r * w + c2) * 3
          out(o) = clamp8(y + 1.402 * cr)
          out(o + 1) = clamp8(y - 0.344136 * cb - 0.714136 * cr)
          out(o + 2) = clamp8(y + 1.772 * cb)
          c2 += 1
        }
        r += 1
      }
      Some((w, h, out))
    }
  }

  /** Baseline grayscale JPEG encoder where each payload byte becomes one
    * CONSTANT 8×8 block: with a unit quantization table a constant block
    * has only its DC coefficient (exactly 8·(b−128)), so the lossy
    * format round-trips losslessly by construction — the synthesis side
    * of the JPEG decode gate. Custom minimal Huffman tables (12 DC
    * categories at 4 bits; AC = a 1-bit EOB) are declared in DHT, as the
    * spec allows. */
  private[graft] def jpegEncode(payload: Array[Byte], wBlocks: Int, hBlocks: Int): Array[Byte] = {
    require(payload.length == wBlocks * hBlocks, "one byte per 8x8 block")
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xff); out.write(mk) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8) // SOI
    m(0xdb); u16(2 + 1 + 64); out.write(0x00) // DQT table 0, 8-bit
    for (_ <- 0 until 64) out.write(1)
    m(0xc0); u16(2 + 6 + 3) // SOF0, 1 component
    out.write(8); u16(hBlocks * 8); u16(wBlocks * 8); out.write(1)
    out.write(1); out.write(0x11); out.write(0) // id 1, 1x1, qt 0
    // DHT DC 0: 12 categories, all 4-bit codes (0000..1011)
    m(0xc4); u16(2 + 1 + 16 + 12); out.write(0x00)
    val dcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcBits.foreach(out.write)
    for (i <- 0 until 12) out.write(i)
    // DHT AC 0: single EOB symbol with the 1-bit code '0'
    m(0xc4); u16(2 + 1 + 16 + 1); out.write(0x10)
    val acBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acBits.foreach(out.write)
    out.write(0x00)
    m(0xda); u16(2 + 1 + 2 + 3) // SOS
    out.write(1); out.write(1); out.write(0x00)
    out.write(0); out.write(63); out.write(0)
    // entropy stream: per block DC diff (4-bit category + amplitude), EOB
    var acc = 0L; var accBits = 0
    val data = new java.io.ByteArrayOutputStream()
    def putBits(v: Int, n: Int): Unit = {
      if (n == 0) return
      acc = (acc << n) | (v & ((1L << n) - 1)); accBits += n
      while (accBits >= 8) {
        val b = ((acc >> (accBits - 8)) & 0xff).toInt
        data.write(b); if (b == 0xff) data.write(0x00) // byte stuffing
        accBits -= 8
      }
    }
    var prevDc = 0
    payload.foreach { b =>
      val dc = 8 * ((b & 0xff) - 128)
      var diff = dc - prevDc
      prevDc = dc
      var t = 0
      var ad = math.abs(diff)
      while (ad > 0) { t += 1; ad >>= 1 }
      putBits(t, 4) // DC category (4-bit code == category index)
      if (t > 0) {
        if (diff < 0) diff += (1 << t) - 1
        putBits(diff, t)
      }
      putBits(0, 1) // AC EOB
    }
    if (accBits > 0) { // pad the final byte with 1s (spec convention)
      val pad = 8 - accBits
      putBits((1 << pad) - 1, pad)
    }
    out.write(data.toByteArray)
    m(0xd9) // EOI
    out.toByteArray
  }

  /** PROGRESSIVE grayscale JPEG encoder (SOF2) with a real six-scan
    * script — DC first (Al=1) → DC refinement → two spectral AC bands
    * (1..5, 6..63) at Al=1 → the same two bands' refinement scans at
    * Al=0 — where each payload byte is one constant 8×8 block. The DC
    * quant step is 8, so the quantized DC is exactly b−128: the
    * successive-approximation split (b−128)>>1 plus the refinement bit
    * (b−128)&1 is NONTRIVIAL per block, and reconstruction is lossless
    * by construction. AC coefficients are all zero, so every AC scan is
    * a single EOBn run over the whole image — exercising the EOB-run
    * decode path end to end. The synthesis side of the progressive
    * decode gate. */
  private[graft] def jpegEncodeProgressive(payload: Array[Byte], wBlocks: Int,
                                           hBlocks: Int): Array[Byte] = {
    require(payload.length == wBlocks * hBlocks, "one byte per 8x8 block")
    val n = payload.length
    require(n >= 2 && n < (1 << 15), "EOB run must fit EOB14")
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xff); out.write(mk) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8)
    m(0xdb); u16(2 + 1 + 64); out.write(0x00)
    out.write(8) // DC step 8 → quantized DC = b − 128 exactly
    for (_ <- 1 until 64) out.write(1)
    m(0xc2); u16(2 + 6 + 3) // SOF2, 1 component
    out.write(8); u16(hBlocks * 8); u16(wBlocks * 8); out.write(1)
    out.write(1); out.write(0x11); out.write(0)
    m(0xc4); u16(2 + 1 + 16 + 12); out.write(0x00) // DC 0: 12 cats, 4-bit
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    for (i <- 0 until 12) out.write(i)
    // AC 0: the single EOBn symbol covering all n blocks, 1-bit code
    val rEob = 31 - Integer.numberOfLeadingZeros(n) // floor log2 n
    val eobExtra = n - (1 << rEob)
    m(0xc4); u16(2 + 1 + 16 + 1); out.write(0x10)
    Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    out.write(rEob << 4)
    // byte-stuffing entropy writer, one per scan
    final class BitW {
      private var acc = 0L; private var accBits = 0
      private val data = new java.io.ByteArrayOutputStream()
      def put(v: Int, nb: Int): Unit = {
        if (nb == 0) return
        acc = (acc << nb) | (v & ((1L << nb) - 1)); accBits += nb
        while (accBits >= 8) {
          val b = ((acc >> (accBits - 8)) & 0xff).toInt
          data.write(b); if (b == 0xff) data.write(0x00)
          accBits -= 8
        }
      }
      def finish(): Array[Byte] = {
        if (accBits > 0) { val pad = 8 - accBits; put((1 << pad) - 1, pad) }
        data.toByteArray
      }
    }
    def sosHeader(ss: Int, se: Int, ah: Int, al: Int): Unit = {
      m(0xda); u16(2 + 1 + 2 + 3)
      out.write(1); out.write(1); out.write(0x00)
      out.write(ss); out.write(se); out.write((ah << 4) | al)
    }
    val dc = payload.map(b => (b & 0xff) - 128)
    // scan 1: DC first at Al=1 — diffs of the arithmetic-shifted values
    sosHeader(0, 0, 0, 1)
    val w1 = new BitW
    var prev = 0
    dc.foreach { v =>
      val hi = v >> 1
      var diff = hi - prev
      prev = hi
      var t = 0
      var ad = math.abs(diff)
      while (ad > 0) { t += 1; ad >>= 1 }
      w1.put(t, 4)
      if (t > 0) { if (diff < 0) diff += (1 << t) - 1; w1.put(diff, t) }
    }
    out.write(w1.finish())
    // scan 2: DC refinement (Ah=1, Al=0) — the low bit per block
    sosHeader(0, 0, 1, 0)
    val w2 = new BitW
    dc.foreach(v => w2.put(v & 1, 1))
    out.write(w2.finish())
    // scans 3..6: two spectral AC bands, first pass at Al=1 then the
    // refinement at Al=0; all-zero AC → each scan is ONE EOBn run
    for ((ah, al) <- Seq((0, 1), (1, 0)); (ss, se) <- Seq((1, 5), (6, 63))) {
      sosHeader(ss, se, ah, al)
      val wN = new BitW
      wN.put(0, 1) // the EOBn symbol's 1-bit code
      wN.put(eobExtra, rEob)
      out.write(wN.finish())
    }
    m(0xd9)
    out.toByteArray
  }

  /** Hash-gated REAL progressive decode: each document's leading bytes
    * become a six-scan SOF2 JPEG (lossless by construction — see
    * [[jpegEncodeProgressive]]), routed through the full progressive
    * pipeline: multi-scan walk, DC successive approximation, spectral
    * AC bands with EOB runs, refinement scans, final IDCT. The oracle
    * replays raw-byte stats, so any fallback or any defect in the
    * progressive coefficient accumulation breaks the hash. */
  def jpegProgressiveDecodeSummary(documents: DataFrame, wBlocks: Int = 8,
                                   hBlocks: Int = 6): DataFrame = {
    val need = wBlocks * hBlocks
    val enc = udf((text: String) =>
      jpegEncodeProgressive(text.getBytes("UTF-8").take(need), wBlocks, hBlocks))
    val media = documents
      .filter(octet_length(col("text")) >= need)
      .select(col("doc_id").cast("long"),
        enc(col("text")).as("payload"),
        struct(lit(need.toLong).as("n_bytes"), lit("image").as("media_type"),
          lit(wBlocks * 8).as("width"), lit(hBlocks * 8).as("height")).as("meta"))
    extractFeatures(media)
      .agg(count(lit(1)).cast("long").as("n_images"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_pixel_mean"),
        round(avg(element_at(col("features"), 3)), 4).as("avg_pixel_max"),
        round(avg(element_at(col("features"), 4)), 4).as("avg_pixel_min"))
  }

  /** 4:4:4 color twin of [[jpegEncode]]: per MCU one constant 8×8 block
    * per component (Y from the payload, constant Cb/Cr), same unit quant
    * table and minimal Huffman tables shared by all three components —
    * lossless by construction, exercising the interleaved-MCU and
    * YCbCr→RGB paths. */
  private[graft] def jpegEncodeColor(yBytes: Array[Byte], cb: Int, cr: Int,
                                     wBlocks: Int, hBlocks: Int): Array[Byte] = {
    require(yBytes.length == wBlocks * hBlocks, "one luma byte per 8x8 block")
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xff); out.write(mk) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8)
    m(0xdb); u16(2 + 1 + 64); out.write(0x00)
    for (_ <- 0 until 64) out.write(1)
    m(0xc0); u16(2 + 6 + 9) // SOF0, 3 components, all 1x1 (4:4:4)
    out.write(8); u16(hBlocks * 8); u16(wBlocks * 8); out.write(3)
    for (id <- 1 to 3) { out.write(id); out.write(0x11); out.write(0) }
    m(0xc4); u16(2 + 1 + 16 + 12); out.write(0x00)
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    for (i <- 0 until 12) out.write(i)
    m(0xc4); u16(2 + 1 + 16 + 1); out.write(0x10)
    Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    out.write(0x00)
    m(0xda); u16(2 + 1 + 6 + 3)
    out.write(3)
    for (id <- 1 to 3) { out.write(id); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    var acc = 0L; var accBits = 0
    val data = new java.io.ByteArrayOutputStream()
    def putBits(v: Int, n: Int): Unit = {
      if (n == 0) return
      acc = (acc << n) | (v & ((1L << n) - 1)); accBits += n
      while (accBits >= 8) {
        val b = ((acc >> (accBits - 8)) & 0xff).toInt
        data.write(b); if (b == 0xff) data.write(0x00)
        accBits -= 8
      }
    }
    val prevDc = new Array[Int](3)
    def putBlock(c: Int, value: Int): Unit = {
      val dc = 8 * (value - 128)
      var diff = dc - prevDc(c)
      prevDc(c) = dc
      var t = 0
      var ad = math.abs(diff)
      while (ad > 0) { t += 1; ad >>= 1 }
      putBits(t, 4)
      if (t > 0) {
        if (diff < 0) diff += (1 << t) - 1
        putBits(diff, t)
      }
      putBits(0, 1) // EOB
    }
    yBytes.foreach { b =>
      putBlock(0, b & 0xff); putBlock(1, cb); putBlock(2, cr)
    }
    if (accBits > 0) { val pad = 8 - accBits; putBits((1 << pad) - 1, pad) }
    out.write(data.toByteArray)
    m(0xd9)
    out.toByteArray
  }

  /** 4:2:0 twin of [[jpegEncodeColor]]: per MCU four constant Y blocks
    * (2×2, raster order) + one constant Cb + one constant Cr block at
    * half resolution — the real-world default chroma layout, still
    * lossless by construction. */
  private[graft] def jpegEncode420(yBytes: Array[Byte], cbBytes: Array[Byte],
                                   crBytes: Array[Byte], mcusX: Int,
                                   mcusY: Int): Array[Byte] = {
    require(yBytes.length == mcusX * mcusY * 4, "four luma bytes per MCU")
    require(cbBytes.length == mcusX * mcusY && crBytes.length == mcusX * mcusY,
      "one chroma byte per MCU")
    val out = new java.io.ByteArrayOutputStream()
    def m(mk: Int): Unit = { out.write(0xff); out.write(mk) }
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    m(0xd8)
    m(0xdb); u16(2 + 1 + 64); out.write(0x00)
    for (_ <- 0 until 64) out.write(1)
    m(0xc0); u16(2 + 6 + 9) // SOF0: Y 2x2, Cb 1x1, Cr 1x1 (4:2:0)
    out.write(8); u16(mcusY * 16); u16(mcusX * 16); out.write(3)
    out.write(1); out.write(0x22); out.write(0)
    out.write(2); out.write(0x11); out.write(0)
    out.write(3); out.write(0x11); out.write(0)
    m(0xc4); u16(2 + 1 + 16 + 12); out.write(0x00)
    Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    for (i <- 0 until 12) out.write(i)
    m(0xc4); u16(2 + 1 + 16 + 1); out.write(0x10)
    Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    out.write(0x00)
    m(0xda); u16(2 + 1 + 6 + 3)
    out.write(3)
    for (id <- 1 to 3) { out.write(id); out.write(0x00) }
    out.write(0); out.write(63); out.write(0)
    var acc = 0L; var accBits = 0
    val data = new java.io.ByteArrayOutputStream()
    def putBits(v: Int, n: Int): Unit = {
      if (n == 0) return
      acc = (acc << n) | (v & ((1L << n) - 1)); accBits += n
      while (accBits >= 8) {
        val b = ((acc >> (accBits - 8)) & 0xff).toInt
        data.write(b); if (b == 0xff) data.write(0x00)
        accBits -= 8
      }
    }
    val prevDc = new Array[Int](3)
    def putBlock(c: Int, value: Int): Unit = {
      val dc = 8 * (value - 128)
      var diff = dc - prevDc(c)
      prevDc(c) = dc
      var t = 0
      var ad = math.abs(diff)
      while (ad > 0) { t += 1; ad >>= 1 }
      putBits(t, 4)
      if (t > 0) { if (diff < 0) diff += (1 << t) - 1; putBits(diff, t) }
      putBits(0, 1)
    }
    for (mcu <- 0 until mcusX * mcusY) {
      for (b <- 0 until 4) putBlock(0, yBytes(mcu * 4 + b) & 0xff)
      putBlock(1, cbBytes(mcu) & 0xff)
      putBlock(2, crBytes(mcu) & 0xff)
    }
    if (accBits > 0) { val pad = 8 - accBits; putBits((1 << pad) - 1, pad) }
    out.write(data.toByteArray)
    m(0xd9)
    out.toByteArray
  }

  /** Hash-gated 4:2:0 JPEG decode — the real-world default layout:
    * neutral chroma, luma from document bytes (4 per MCU), so decoded
    * RGB equals (b, b, b) per pixel only if the 2×2-sampled MCU
    * interleave AND the chroma upsampling replication are both right. */
  def jpeg420DecodeSummary(documents: DataFrame, mcusX: Int = 4,
                           mcusY: Int = 3): DataFrame = {
    val need = mcusX * mcusY * 4
    val nChroma = mcusX * mcusY
    val enc = udf((text: String) => {
      val b = text.getBytes("UTF-8").take(need)
      jpegEncode420(b, Array.fill(nChroma)(128.toByte),
        Array.fill(nChroma)(128.toByte), mcusX, mcusY)
    })
    val media = documents
      .filter(octet_length(col("text")) >= need)
      .select(col("doc_id").cast("long"),
        enc(col("text")).as("payload"),
        struct(lit(need.toLong).as("n_bytes"), lit("image").as("media_type"),
          lit(mcusX * 16).as("width"), lit(mcusY * 16).as("height")).as("meta"))
    extractFeatures(media)
      .agg(count(lit(1)).cast("long").as("n_images"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_pixel_mean"),
        round(avg(element_at(col("features"), 3)), 4).as("avg_pixel_max"),
        round(avg(element_at(col("features"), 4)), 4).as("avg_pixel_min"))
  }

  /** Hash-gated 4:4:4 COLOR JPEG decode: luma from the payload bytes,
    * neutral chroma (Cb=Cr=128), so the full interleaved-MCU decode +
    * YCbCr→RGB conversion returns exactly (b, b, b) per pixel — the
    * oracle's raw-byte replay matches ONLY if the three-component path
    * is correct end to end. */
  def jpegColorDecodeSummary(documents: DataFrame, wBlocks: Int = 8,
                             hBlocks: Int = 6): DataFrame = {
    val need = wBlocks * hBlocks
    val enc = udf((text: String) =>
      jpegEncodeColor(text.getBytes("UTF-8").take(need), 128, 128, wBlocks, hBlocks))
    val media = documents
      .filter(octet_length(col("text")) >= need)
      .select(col("doc_id").cast("long"),
        enc(col("text")).as("payload"),
        struct(lit(need.toLong).as("n_bytes"), lit("image").as("media_type"),
          lit(wBlocks * 8).as("width"), lit(hBlocks * 8).as("height")).as("meta"))
    extractFeatures(media)
      .agg(count(lit(1)).cast("long").as("n_images"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_pixel_mean"),
        round(avg(element_at(col("features"), 3)), 4).as("avg_pixel_max"),
        round(avg(element_at(col("features"), 4)), 4).as("avg_pixel_min"))
  }

  /** Hash-gated REAL JPEG decode: each document's leading bytes become a
    * constant-block grayscale baseline JPEG (lossless by construction —
    * unit quant table, DC-only blocks), routed through the full marker
    * walk + Huffman + IDCT pipeline. The oracle replays raw-byte stats;
    * a fallback would fold markers/tables/entropy bytes into the stats
    * and break the hash. */
  def jpegDecodeSummary(documents: DataFrame, wBlocks: Int = 8, hBlocks: Int = 6): DataFrame = {
    val need = wBlocks * hBlocks
    val enc = udf((text: String) =>
      jpegEncode(text.getBytes("UTF-8").take(need), wBlocks, hBlocks))
    val media = documents
      .filter(octet_length(col("text")) >= need)
      .select(col("doc_id").cast("long"),
        enc(col("text")).as("payload"),
        struct(lit(need.toLong).as("n_bytes"), lit("image").as("media_type"),
          lit(wBlocks * 8).as("width"), lit(hBlocks * 8).as("height")).as("meta"))
    extractFeatures(media)
      .agg(count(lit(1)).cast("long").as("n_images"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_pixel_mean"),
        round(avg(element_at(col("features"), 3)), 4).as("avg_pixel_max"),
        round(avg(element_at(col("features"), 4)), 4).as("avg_pixel_min"))
  }

  /** Minimal 8-bit grayscale PNG encoder (filter-0 rows, one IDAT,
    * JDK Deflater) — the synthesis side of the PNG decode gate. The
    * gate hashes DECODED stats, so Deflater byte-level variation across
    * JDKs is immaterial. */
  private[graft] def pngEncode(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(payload.length == w * h, "one byte per pixel")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      def u32(v: Long): Array[Byte] = Array(((v >> 24) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(u32(data.length))
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(data)
      out.write(u32(crc.getValue))
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit = { ihdr.write((v >> 24) & 0xff); ihdr.write((v >> 16) & 0xff)
      ihdr.write((v >> 8) & 0xff); ihdr.write(v & 0xff) }
    be32(w); be32(h); ihdr.write(8); ihdr.write(0) // 8-bit grayscale
    ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    val raw = new Array[Byte](h * (1 + w))
    for (r <- 0 until h) {
      raw(r * (1 + w)) = 0 // filter None
      System.arraycopy(payload, r * w, raw, r * (1 + w) + 1, w)
    }
    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw); def_.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!def_.finished()) comp.write(buf, 0, def_.deflate(buf))
    def_.end()
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Hash-gated REAL PNG decode: each document's leading bytes become an
    * 8-bit grayscale PNG (JDK Deflater), routed through the real chunk
    * walk + Inflater + unfilter pipeline. Oracle replays raw-byte stats;
    * a fallback would fold the signature/chunk framing/compressed bytes
    * into the stats and break the hash. */
  def pngDecodeSummary(documents: DataFrame, w: Int = 8, h: Int = 6): DataFrame = {
    val need = w * h
    val enc = udf((text: String) => pngEncode(text.getBytes("UTF-8").take(need), w, h))
    val media = documents
      .filter(octet_length(col("text")) >= need)
      .select(col("doc_id").cast("long"),
        enc(col("text")).as("payload"),
        struct(lit(need.toLong).as("n_bytes"), lit("image").as("media_type"),
          lit(w).as("width"), lit(h).as("height")).as("meta"))
    extractFeatures(media)
      .agg(count(lit(1)).cast("long").as("n_images"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_pixel_mean"),
        round(avg(element_at(col("features"), 3)), 4).as("avg_pixel_max"),
        round(avg(element_at(col("features"), 4)), 4).as("avg_pixel_min"))
  }

  /** Minimal GIF89a encoder with an identity 256-gray global color table
    * and a clear-spam LZW stream (CLEAR before every literal keeps the
    * dictionary empty, so every byte is its own 9-bit code — a valid
    * stream any conforming decoder accepts). The synthesis side of the
    * GIF decode gate: decoded channel values are each payload byte
    * three times (r=g=b). */
  private[graft] def gifEncode(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(payload.length == w * h, "one byte per pixel")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(w); u16(h); out.write(0x80 | 0x07); out.write(0); out.write(0) // GCT, 256 entries
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c); u16(0); u16(0); u16(w); u16(h); out.write(0) // image descriptor
    out.write(8) // LZW min code size
    val clear = 256; val eoi = 257
    val codes = payload.flatMap(b => Seq(clear, b & 0xff)) :+ eoi
    var acc = 0L; var accBits = 0
    val data = new java.io.ByteArrayOutputStream()
    codes.foreach { c =>
      acc |= c.toLong << accBits; accBits += 9 // width stays 9: dict never grows
      while (accBits >= 8) { data.write((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
    }
    if (accBits > 0) data.write((acc & 0xff).toInt)
    val lzw = data.toByteArray
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n); out.write(lzw, off, n); off += n
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** The decode dispatch as a UDF — the streaming-compatible face of
    * [[extractFeatures]] (Structured Streaming cannot run the RDD
    * mapPartitions path). One definition of [[decode]] serves both, so
    * batch and ingest-time features cannot drift. */
  def decodeFeaturesUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((bytes: Array[Byte]) => decode(bytes))

  /** Hash-gated dimension parsing — the METADATA side of the decode
    * contract (stats gates cover pixel values; this covers the header
    * geometry). Each doc becomes a GIF, PNG, baseline JPEG, or
    * progressive JPEG whose (w, h) derive from doc_id, so the oracle
    * recomputes the expected dims in SQL and the gate fails if any
    * format's header parse (or the format dispatch) mis-reads
    * geometry. */
  def dimsSummary(documents: DataFrame): DataFrame = {
    val dims = udf((id: Long, text: String) => {
      // jpeg dims are block multiples; gif/png take the small grid.
      // progressive ids are ≡3 (mod 4) hence odd → hBlocks = 2 always,
      // satisfying the encoder's n ≥ 2 EOB-run requirement
      val (w, h) =
        if (id % 4 >= 2) (8 * (1 + (id % 5).toInt), 8 * (1 + (id % 2).toInt))
        else (2 + (id % 5).toInt, 2 + (id % 3).toInt)
      val need = if (id % 4 >= 2) (w / 8) * (h / 8) else w * h
      val b = text.getBytes("UTF-8").take(need)
      val payload = if (b.length < need) b.padTo(need, 0.toByte) else b
      val enc = (id % 4) match {
        case 0 => gifEncode(payload, w, h)
        case 1 => pngEncode(payload, w, h)
        case 2 => jpegEncode(payload, w / 8, h / 8)
        case _ => jpegEncodeProgressive(payload, w / 8, h / 8)
      }
      decodedDims(enc) match {
        case Some((dw, dh)) => Seq(dw, dh)
        case None           => Seq(-1, -1)
      }
    }) // structural barrier below: two element_at reads must not re-run encode+decode
    graft.core.Barrier.once(documents,
        Seq(col("doc_id").cast("long").as("doc"),
          when(col("doc_id") % 4 === 0, "gif")
            .when(col("doc_id") % 4 === 1, "png")
            .when(col("doc_id") % 4 === 2, "jpeg").otherwise("jpeg_prog").as("fmt")),
        dims(col("doc_id").cast("long"), col("text")), "_d")
      .select(col("doc"), col("fmt"),
        element_at(col("_d"), 1).as("w"), element_at(col("_d"), 2).as("h"))
      .groupBy("fmt")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("w")).cast("long").as("sum_w"), sum(col("h")).cast("long").as("sum_h"),
        min(col("w")).cast("long").as("min_w"), max(col("h")).cast("long").as("max_h"))
      .orderBy("fmt")
  }

  /** Hash-gated REAL GIF decode: encode each document's leading bytes as
    * an identity-palette GIF (clear-spam LZW), route through the real
    * LZW decoder, aggregate pixel stats. Decoded gray channels repeat
    * each byte three times, so the oracle's raw-byte replay matches ONLY
    * if the full GIF parse (header, 768-byte palette, sub-block walk,
    * LZW inflate, palette lookup) is correct — any fallback to byte
    * stats would include the header and palette and break the hash. */
  def gifDecodeSummary(documents: DataFrame, w: Int = 8, h: Int = 6): DataFrame = {
    val need = w * h
    val enc = udf((text: String) => {
      val b = text.getBytes("UTF-8")
      gifEncode(b.take(need), w, h)
    })
    val media = documents
      .filter(octet_length(col("text")) >= need)
      .select(col("doc_id").cast("long"),
        enc(col("text")).as("payload"),
        struct(lit(need.toLong).as("n_bytes"), lit("image").as("media_type"),
          lit(w).as("width"), lit(h).as("height")).as("meta"))
    extractFeatures(media)
      .agg(count(lit(1)).cast("long").as("n_images"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_pixel_mean"),
        round(avg(element_at(col("features"), 3)), 4).as("avg_pixel_max"),
        round(avg(element_at(col("features"), 4)), 4).as("avg_pixel_min"))
  }

  /** Canonical 44-byte RIFF/WAVE header for 16-bit mono PCM — the
    * synthesis side of the audio decode gate. */
  private[graft] def wavHeader(dataSize: Int, sampleRate: Int = 8000): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(44)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def u32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    ascii("RIFF"); u32(36 + dataSize); ascii("WAVE")
    ascii("fmt "); u32(16); u16(1); u16(1); u32(sampleRate)
    u32(sampleRate * 2); u16(2); u16(16)
    ascii("data"); u32(dataSize)
    out.toByteArray
  }

  /** RIFF/WAVE PCM parser: "RIFF" <u32 size> "WAVE", then chunks; needs a
    * "fmt " chunk declaring PCM (format 1) at 16 bits and a "data" chunk,
    * whose payload parses as little-endian signed int16 samples. Returns
    * (sampleRate, nChannels, sample values) or None when the payload is
    * not a well-formed 16-bit PCM WAV (the byte-stats fallback then
    * applies — same seam as the image parsers). */
  private def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    def u32(off: Int): Long =
      ((bytes(off) & 0xffL)) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    def tag(off: Int, s: String): Boolean =
      off + 4 <= bytes.length && s.indices.forall(i => bytes(off + i) == s.charAt(i).toByte)
    if (bytes.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (format, channels, bits)
    var rate = 0
    var blockAlign = 0
    var data: Option[(Int, Int)] = None // (offset, size)
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val size = u32(pos + 4).toInt
      if (size < 0 || pos + 8 + size > bytes.length) return None
      if (tag(pos, "fmt ") && size >= 16) {
        fmt = Some((u16(pos + 8), u16(pos + 10), u16(pos + 22)))
        rate = u32(pos + 12).toInt
        blockAlign = u16(pos + 20)
      } else if (tag(pos, "data")) data = Some((pos + 8, size))
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    fmt match {
      case Some((7, channels, 8)) if channels >= 1 =>
        // G.711 μ-law (WAVE format 7): one companded byte per sample,
        // expanded by the closed-form segment/mantissa formula — a REAL
        // compressed-audio codec, and SQL-replayable since the expansion
        // is pure integer arithmetic
        data.map { case (off, size) =>
          val smp = Array.tabulate(size)(i => mulawExpand(bytes(off + i)).toDouble)
          (rate, channels, smp)
        }
      case Some((6, channels, 8)) if channels >= 1 =>
        // G.711 A-law (WAVE format 6): the even-bit-toggled companding
        // twin of μ-law — same one-byte-per-sample layout, different
        // segment/mantissa formula (ITU-T G.711 table 2)
        data.map { case (off, size) =>
          val smp = Array.tabulate(size)(i => alawExpand(bytes(off + i)).toDouble)
          (rate, channels, smp)
        }
      case Some((17, 1, 4)) if blockAlign >= 5 =>
        // IMA/DVI ADPCM (WAVE format 0x11, mono): 4-bit differential
        // nibbles expanded through the 89-entry step table — a REAL
        // predictive codec (4:1 vs PCM16), decoded block-by-block per
        // the declared blockAlign
        data.flatMap { case (off, size) => decodeImaAdpcm(bytes, off, size, blockAlign, rate) }
      case _ => decodePcm16(bytes, fmt, rate, data)
    }
  }

  /** G.711 μ-law byte → linear PCM16 sample (ITU-T G.711 decoder
    * formula: complement, 3-bit exponent segment, 4-bit mantissa,
    * +0x84 bias). */
  private[graft] def mulawExpand(b: Byte): Int = {
    val u = (~b) & 0xff
    val exp = (u >> 4) & 7
    val mant = u & 0x0f
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** G.711 A-law byte → linear PCM16 sample: toggle the even bits
    * (XOR 0x55), then 3-bit segment + 4-bit mantissa; segment 0 adds the
    * half-step 8, higher segments add 0x108 then shift. Sign bit SET
    * means positive in A-law (the opposite of μ-law). */
  private[graft] def alawExpand(b: Byte): Int = {
    val a = (b ^ 0x55) & 0xff
    val seg = (a >> 4) & 7
    val base = (a & 0x0f) << 4
    val mag = seg match {
      case 0 => base + 8
      case 1 => base + 0x108
      case _ => (base + 0x108) << (seg - 1)
    }
    if ((a & 0x80) != 0) mag else -mag
  }

  /** IMA ADPCM step-size table (IMA ADPCM reference algorithm, 89
    * entries) and index-adjust table. */
  private[multimodal] val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private[multimodal] val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM nibble expansion: (predictor, index) → the next pair.
    * diff = step/8 + conditional step/4, step/2, step terms from the
    * three magnitude bits; bit 3 is the sign; predictor clamps to int16,
    * index to [0, 88]. Pure integer arithmetic → SQL-replayable as a
    * recursive CTE carrying (pred, idx). */
  private[graft] def imaAdpcmStep(pred: Int, idx: Int, nibble: Int): (Int, Int) = {
    val step = ImaStepTable(idx)
    var diff = step >> 3
    if ((nibble & 1) != 0) diff += step >> 2
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 4) != 0) diff += step
    val p = if ((nibble & 8) != 0) math.max(-32768, pred - diff)
            else math.min(32767, pred + diff)
    (p, math.max(0, math.min(88, idx + ImaIndexTable(nibble & 7))))
  }

  /** IMA ADPCM data-chunk decode (mono): each blockAlign-sized block is a
    * 4-byte header (initial predictor int16 LE — emitted as sample 0 —
    * plus the initial step index) followed by nibble bytes, LOW nibble
    * first. A trailing partial block decodes through its available
    * bytes. */
  private def decodeImaAdpcm(bytes: Array[Byte], off: Int, size: Int,
                             blockAlign: Int, rate: Int): Option[(Int, Int, Array[Double])] = {
    if (!saneAlloc(2L * size)) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[Double]
    var p = off
    val end = off + size
    while (p + 4 <= end) {
      var pred = ((bytes(p) & 0xff) | (bytes(p + 1) << 8)).toShort.toInt
      var idx = bytes(p + 2) & 0xff
      if (idx > 88) return None
      out += pred.toDouble
      var q = p + 4
      val blockEnd = math.min(p + blockAlign, end)
      while (q < blockEnd) {
        val b = bytes(q) & 0xff
        val r1 = imaAdpcmStep(pred, idx, b & 0x0f)
        pred = r1._1; idx = r1._2; out += pred.toDouble
        val r2 = imaAdpcmStep(pred, idx, (b >> 4) & 0x0f)
        pred = r2._1; idx = r2._2; out += pred.toDouble
        q += 1
      }
      p += blockAlign
    }
    if (out.isEmpty) None else Some((rate, 1, out.toArray))
  }

  private def decodePcm16(bytes: Array[Byte], fmt: Option[(Int, Int, Int)],
                          rate: Int, data: Option[(Int, Int)]): Option[(Int, Int, Array[Double])] =
    for {
      (format, channels, bits) <- fmt
      if format == 1 && bits == 16 && channels >= 1
      (off, size) <- data
      if size % 2 == 0
    } yield {
      val n = size / 2
      val smp = Array.tabulate(n) { i =>
        ((bytes(off + 2 * i) & 0xff) | (bytes(off + 2 * i + 1) << 8)).toShort.toDouble
      }
      (rate, channels, smp)
    }

  /** 44-byte RIFF/WAVE header for 8-bit mono G.711 μ-law (format 7). */
  private[graft] def wavHeaderMulaw(dataSize: Int, sampleRate: Int = 8000): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(44)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def u32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    ascii("RIFF"); u32(36 + dataSize); ascii("WAVE")
    ascii("fmt "); u32(16); u16(7); u16(1); u32(sampleRate)
    u32(sampleRate); u16(1); u16(8)
    ascii("data"); u32(dataSize)
    out.toByteArray
  }

  /** Hash-gated REAL compressed-audio decode: each document's leading
    * bytes become G.711 μ-law samples in a format-7 WAV; the decoder
    * expands them through the closed-form segment/mantissa formula, and
    * the oracle replays the SAME integer formula in SQL — so the gate
    * verifies the actual companded-codec expansion, not just byte
    * plumbing. */
  def mulawDecodeSummary(documents: DataFrame, nSamples: Int = 48): DataFrame = {
    val header = wavHeaderMulaw(dataSize = nSamples)
    val media = documents
      .filter(octet_length(col("text")) >= nSamples)
      .select(col("doc_id").cast("long"),
        concat(lit(header), substring(col("text").cast("binary"), 1, nSamples)).as("payload"),
        struct(lit(nSamples.toLong).as("n_bytes"), lit("audio").as("media_type"),
          lit(0).as("width"), lit(0).as("height")).as("meta"))
    extractFeatures(media)
      .agg(count(lit(1)).cast("long").as("n_clips"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_sample_mean"),
        round(avg(element_at(col("features"), 3)), 4).as("avg_sample_max"),
        round(avg(element_at(col("features"), 4)), 4).as("avg_sample_min"))
  }

  /** 44-byte RIFF/WAVE header for 8-bit mono G.711 A-law (format 6). */
  private[graft] def wavHeaderAlaw(dataSize: Int, sampleRate: Int = 8000): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(44)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def u32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    ascii("RIFF"); u32(36 + dataSize); ascii("WAVE")
    ascii("fmt "); u32(16); u16(6); u16(1); u32(sampleRate)
    u32(sampleRate); u16(1); u16(8)
    ascii("data"); u32(dataSize)
    out.toByteArray
  }

  /** RIFF/WAVE prefix for mono IMA ADPCM (format 0x11): 20-byte fmt
    * chunk (cbSize=2 extension carrying samplesPerBlock), a single block
    * whose align covers the whole data chunk, and the 4-byte block
    * header (initial predictor 0, step index `initIdx`) — the payload
    * bytes that follow are the nibble stream. */
  private[graft] def wavHeaderAdpcm(dataSize: Int, sampleRate: Int = 8000,
                                    initIdx: Int = 32): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(52)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def u32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    val blockAlign = 4 + dataSize
    ascii("RIFF"); u32(44 + dataSize); ascii("WAVE")
    ascii("fmt "); u32(20); u16(0x11); u16(1); u32(sampleRate)
    u32(sampleRate / 2); u16(blockAlign); u16(4)
    u16(2); u16(1 + 2 * dataSize) // cbSize, samplesPerBlock
    ascii("data"); u32(blockAlign)
    u16(0); out.write(initIdx); out.write(0) // block header: pred=0, idx, reserved
    out.toByteArray
  }

  /** Hash-gated REAL A-law decode: the μ-law gate's twin on WAVE
    * format 6 — each document's leading bytes become companded samples,
    * expanded by the even-bit-toggle segment formula; the oracle replays
    * the same integer arithmetic in SQL. */
  def alawDecodeSummary(documents: DataFrame, nSamples: Int = 48): DataFrame = {
    val header = wavHeaderAlaw(dataSize = nSamples)
    val media = documents
      .filter(octet_length(col("text")) >= nSamples)
      .select(col("doc_id").cast("long"),
        concat(lit(header), substring(col("text").cast("binary"), 1, nSamples)).as("payload"),
        struct(lit(nSamples.toLong).as("n_bytes"), lit("audio").as("media_type"),
          lit(0).as("width"), lit(0).as("height")).as("meta"))
    extractFeatures(media)
      .agg(count(lit(1)).cast("long").as("n_clips"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_sample_mean"),
        round(avg(element_at(col("features"), 3)), 4).as("avg_sample_max"),
        round(avg(element_at(col("features"), 4)), 4).as("avg_sample_min"))
  }

  /** Hash-gated REAL IMA ADPCM decode: each document's leading bytes are
    * the nibble stream of a mono format-0x11 WAV (predictor 0, step
    * index 32); the decoder walks the 89-entry step-table recursion and
    * the oracle replays the SAME recursion as a recursive CTE carrying
    * (predictor, index) per nibble — a stateful predictive codec fully
    * inside the hash gate, beyond the stateless companding of
    * μ-law/A-law. */
  def adpcmDecodeSummary(documents: DataFrame, nBytes: Int = 24): DataFrame = {
    val header = wavHeaderAdpcm(dataSize = nBytes)
    val media = documents
      .filter(octet_length(col("text")) >= nBytes)
      .select(col("doc_id").cast("long"),
        concat(lit(header), substring(col("text").cast("binary"), 1, nBytes)).as("payload"),
        struct(lit(nBytes.toLong).as("n_bytes"), lit("audio").as("media_type"),
          lit(0).as("width"), lit(0).as("height")).as("meta"))
    extractFeatures(media)
      .agg(count(lit(1)).cast("long").as("n_clips"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_sample_mean"),
        round(avg(element_at(col("features"), 3)), 4).as("avg_sample_max"),
        round(avg(element_at(col("features"), 4)), 4).as("avg_sample_min"))
  }

  /** Hash-gated REAL FLAC decode (RFC 9639, [[Flac]]): each document's
    * leading byte pairs become little-endian int16 samples (the PCM16
    * gate's derivation), rice-ENCODED per row into a real FLAC stream
    * (STREAMINFO + frame header with verified CRC-8 + order-2 FIXED
    * subframe + partition-order-1 rice residuals + verified CRC-16), then
    * decoded back by [[Flac.decode]] inside [[extractFeatures]]. The
    * codec is lossless by construction, so the oracle replays the SAME
    * int16-from-byte-pairs stats the PCM16 gate uses — any parsing,
    * prediction, rice, or CRC defect anywhere in the round trip breaks
    * the hash. */
  def flacDecodeSummary(documents: DataFrame, nSamples: Int = 32): DataFrame = {
    val need = nSamples * 2
    val enc = udf { (raw: Array[Byte]) =>
      val smp = Array.tabulate(nSamples) { i =>
        val u = (raw(2 * i) & 0xff) | ((raw(2 * i + 1) & 0xff) << 8)
        if (u >= 32768) u - 65536 else u
      }
      Flac.encode(smp)
    }
    val media = documents
      .filter(octet_length(col("text")) >= need)
      .select(col("doc_id").cast("long"),
        enc(substring(col("text").cast("binary"), 1, need)).as("payload"),
        struct(lit(need.toLong).as("n_bytes"), lit("audio").as("media_type"),
          lit(0).as("width"), lit(0).as("height")).as("meta"))
    extractFeatures(media)
      .agg(count(lit(1)).cast("long").as("n_clips"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_sample_mean"),
        round(avg(element_at(col("features"), 3)), 4).as("avg_sample_max"),
        round(avg(element_at(col("features"), 4)), 4).as("avg_sample_min"))
  }

  /** Hash-gated MID-SIDE stereo FLAC decode: even-index byte-pair int16
    * samples become the left channel, odd the right, encoded per row as
    * a mid-side decorrelated stereo stream ((L+R)>>1 mid, L−R side at 17
    * bits) and decoded back by [[Flac.decode]]'s §9.1.3 reconstruction.
    * The decoder interleaves L/R back into the ORIGINAL sample order, so
    * the oracle is the same int16 byte-pair replay as the mono gate —
    * any decorrelation defect breaks the hash. */
  def flacStereoDecodeSummary(documents: DataFrame, nSamples: Int = 32): DataFrame = {
    val need = nSamples * 2
    val enc = udf { (raw: Array[Byte]) =>
      val smp = Array.tabulate(nSamples) { i =>
        val u = (raw(2 * i) & 0xff) | ((raw(2 * i + 1) & 0xff) << 8)
        if (u >= 32768) u - 65536 else u
      }
      val l = Array.tabulate(nSamples / 2)(i => smp(2 * i))
      val r = Array.tabulate(nSamples / 2)(i => smp(2 * i + 1))
      Flac.encodeStereo(l, r, Flac.MidSide)
    }
    val media = documents
      .filter(octet_length(col("text")) >= need)
      .select(col("doc_id").cast("long"),
        enc(substring(col("text").cast("binary"), 1, need)).as("payload"),
        struct(lit(need.toLong).as("n_bytes"), lit("audio").as("media_type"),
          lit(0).as("width"), lit(0).as("height")).as("meta"))
    extractFeatures(media)
      .agg(count(lit(1)).cast("long").as("n_clips"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_sample_mean"),
        round(avg(element_at(col("features"), 3)), 4).as("avg_sample_max"),
        round(avg(element_at(col("features"), 4)), 4).as("avg_sample_min"))
  }

  /** Hash-gated REAL MP3 decode (MPEG-1 Layer III, [[Mp3]]): each
    * document's leading 72 bytes become 576 quantized spectral lines
    * (bit l of the text, sign − on odd lines), encoded as a real
    * 320 kbps / 44.1 kHz mono frame and decoded back through sync/header
    * parse, mono side-info, THREE spec Huffman codebooks (7 / 10 / 13 by
    * region — the r14 table seam, closed in r15), the transmitted
    * scalefactors with preflag/pretab, and the §2.4.3.4 requantization.
    * global_gain = 218 with scalefac_l = pretab at scalefac_scale = 0
    * makes every line's factor the exact power of two 2^(2 − pretab(band))
    * and |lines| ≤ 1 keeps |is|^(4/3) = |is| — LOSSLESS BY CONSTRUCTION
    * through the entropy AND scalefactor layers (the JPEG unit-quant
    * discipline), so the oracle replays the decoded spectral mean/energy
    * bit-for-bit from the text bits with a CASE on the published
    * scalefactor-band edges; header fields and the 1152-sample count gate
    * SQL-exact, and the PCM tail (now the typed Table B.3 window, near-PR
    * measured at 84 dB in the spec suite) gates on sanity bounds only. */
  def mp3DecodeSummary(documents: DataFrame): DataFrame = {
    val need = 72 // 576 bits = 576 spectral lines
    val enc = udf { (raw: Array[Byte]) =>
      val lines = Array.tabulate(576) { l =>
        val bit = (raw(l >> 3) >> (7 - (l & 7))) & 1
        if (bit == 0) 0 else if (l % 2 == 1) -1 else 1
      }
      Mp3.encodeScaled(lines)
    }
    val dec = udf { (payload: Array[Byte]) =>
      Mp3.decode(payload).map { d =>
        val n = d.spectral.length.toDouble
        val mean = d.spectral.sum / n
        val energy = d.spectral.map(x => x * x).sum / n
        // sanity bound scaled to the r15 gate frame: the adversarial
        // worst case over all byte patterns measures 423 (PcmBoundSpec —
        // an all-ones document), so ±1000 tolerates every legitimate
        // frame while still catching NaN/instability blowups
        val pcmOk = d.pcm.forall(x => !x.isNaN && !x.isInfinite && math.abs(x) <= 1000.0)
        (d.sampleRate, d.bitrateKbps, d.nSamples, mean, energy, pcmOk)
      }.getOrElse((0, 0, 0, 0.0, 0.0, false))
    }
    documents
      .filter(octet_length(col("text")) >= need)
      .select(col("doc_id").cast("long"),
        dec(enc(substring(col("text").cast("binary"), 1, need))).as("_d"))
      .agg(count(lit(1)).cast("long").as("n_clips"),
        coalesce(sum(col("_d._3")), lit(0L)).cast("long").as("n_samples"),
        // degenerate corpus (no doc ≥ 72 bytes): min over empty is NULL
        // but the oracle emits literal TRUE — vacuous truth (advice r14)
        coalesce(min(col("_d._1") === 44100 && col("_d._2") === 320), lit(true))
          .as("header_ok"),
        round(avg(col("_d._4")), 4).as("avg_line_mean"),
        round(avg(col("_d._5")), 4).as("avg_line_energy"),
        coalesce(min(col("_d._6")), lit(true)).as("pcm_ok"))
  }

  /** Hash-gated REAL Ogg Vorbis decode (r16): each document's leading
    * 120 bytes choose the VQ entries of a 2-packet mono 8 kHz stream —
    * Ogg pages (CRC'd), transmitted codebooks, floor1, residue type 1 —
    * decoded through [[Vorbis.decode]]'s GENERAL header parser. The
    * encoder pins the floor flat at the inverse-dB table's exact-1.0
    * entry, so the first packet's floor×residue spectrum IS the
    * transmitted VQ integer sequence and its mean/energy hash-gate
    * exactly; the oracle replays entry ids (byte mod 8) and the
    * public value-pair table straight from the text bytes. PCM (IMDCT +
    * Vorbis window + lap, spec-gated against an independent chain in
    * VorbisSpec) gates on sanity bounds. */
  def vorbisDecodeSummary(documents: DataFrame): DataFrame = {
    val need = 120 // 2 packets x 60 VQ entries, one byte each
    val enc = udf { (raw: Array[Byte]) => Vorbis.encode(raw, nPackets = 2) }
    val dec = udf { (payload: Array[Byte]) =>
      Vorbis.decode(payload).map { d =>
        val n = d.spectral.length.toDouble
        val mean = d.spectral.sum / n
        val energy = d.spectral.map(x => x * x).sum / n
        // |spectral| <= 4 over 128 lines bounds any sane lap well inside
        // 2000; NaN/Inf is the real failure this guards
        val pcmOk = d.pcm.forall(x => !x.isNaN && !x.isInfinite && math.abs(x) <= 2000.0)
        (d.sampleRate, d.channels, d.nPackets, d.nSamples, mean, energy, pcmOk)
      }.getOrElse((0, 0, 0, 0, 0.0, 0.0, false))
    }
    documents
      .filter(octet_length(col("text")) >= need)
      .select(col("doc_id").cast("long"),
        dec(enc(substring(col("text").cast("binary"), 1, need))).as("_d"))
      .agg(count(lit(1)).cast("long").as("n_clips"),
        coalesce(sum(col("_d._4")), lit(0L)).cast("long").as("n_samples"),
        coalesce(min(col("_d._1") === 8000 && col("_d._2") === 1 &&
          col("_d._3") === 2), lit(true)).as("header_ok"),
        round(avg(col("_d._5")), 4).as("avg_spec_mean"),
        round(avg(col("_d._6")), 4).as("avg_spec_energy"),
        coalesce(min(col("_d._7")), lit(true)).as("pcm_ok"))
  }

  /** Wrap documents as P6 media rows (the ppm gate's construction as a
    * standalone pure map — shared by the batch summary and the streaming
    * decode twin, so the payload shape cannot drift between them). */
  def asPpmMedia(documents: DataFrame, w: Int = 4, h: Int = 4): DataFrame = {
    val need = w * h * 3
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    documents
      .filter(octet_length(col("text")) >= need)
      .select(col("doc_id").cast("long"),
        concat(lit(header), substring(col("text").cast("binary"), 1, need)).as("payload"),
        struct(lit(need.toLong).as("n_bytes"), lit("image").as("media_type"),
          lit(w).as("width"), lit(h).as("height")).as("meta"))
  }

  /** Hash-gated REAL audio decode: wrap each document's leading bytes as
    * a 16-bit mono PCM WAV (canonical header + the text's first
    * 2·nSamples bytes as little-endian samples), run them through
    * [[extractFeatures]]' real RIFF parser, and aggregate the SIGNED
    * sample statistics. The oracle recomputes int16 values from the raw
    * byte pairs, so a fallback to byte stats (unsigned, header included)
    * or any chunk-walk bug breaks the hash. */
  def wavDecodeSummary(documents: DataFrame, nSamples: Int = 24): DataFrame = {
    val need = nSamples * 2
    val header = wavHeader(dataSize = need)
    val media = documents
      .filter(octet_length(col("text")) >= need)
      .select(col("doc_id").cast("long"),
        concat(lit(header), substring(col("text").cast("binary"), 1, need)).as("payload"),
        struct(lit(need.toLong).as("n_bytes"), lit("audio").as("media_type"),
          lit(0).as("width"), lit(0).as("height")).as("meta"))
    extractFeatures(media)
      .agg(count(lit(1)).cast("long").as("n_clips"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_sample_mean"),
        round(avg(element_at(col("features"), 3)), 4).as("avg_sample_max"),
        round(avg(element_at(col("features"), 4)), 4).as("avg_sample_min"))
  }

  /** Hash-gated REAL-decode pipeline: wrap each document's leading bytes
    * as a tiny P6 image (our header + the text's first w·h·3 bytes as
    * "pixels"), run them through [[extractFeatures]]' real parser, and
    * aggregate the pixel statistics. The oracle replays the same stats
    * over the raw text bytes, so a silent fallback to byte stats (which
    * would include the header) or any header-parsing bug breaks the
    * hash — the decoder itself is inside the correctness gate. */
  def ppmDecodeSummary(documents: DataFrame, w: Int = 4, h: Int = 4): DataFrame =
    extractFeatures(asPpmMedia(documents, w, h))
      .agg(count(lit(1)).cast("long").as("n_images"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_pixel_mean"),
        round(avg(element_at(col("features"), 3)), 4).as("avg_pixel_max"),
        round(avg(element_at(col("features"), 4)), 4).as("avg_pixel_min"))

  /** Aggregate summary per media type (the query-surface entry point). */
  def featureSummary(documents: DataFrame): DataFrame =
    extractFeatures(asMedia(documents))
      .groupBy(col("media_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        round(avg(col("n_bytes")), 4).as("avg_bytes"),
        round(avg(element_at(col("features"), 1)), 4).as("avg_feat_mean"))
      .orderBy(col("media_type"))
}
