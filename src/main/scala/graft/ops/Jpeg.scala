package graft.ops

import org.apache.spark.sql.functions._

import graft.ops.Multimodal.{Decoded, MediaCodec}

/** JPEG baseline (ITU-T T.81 / ISO 10918-1, SOF0 sequential DCT,
  * grayscale) — the DCT-DOMAIN ENTROPY PATH the PNG codec doesn't
  * exercise (VERDICT r13 next-round #7): PNG is filter+DEFLATE over
  * spatial bytes; JPEG is block transform → quantization → DC DPCM +
  * AC zigzag run-length → canonical Huffman with magnitude categories
  * and 0xFF byte stuffing, inside a marker-segment container
  * (SOI/DQT/DHT/SOF0/SOS/EOI). Everything here is public format
  * knowledge: the marker layout is T.81 §B, the Huffman code
  * construction is §C, the decode procedures (DECODE / RECEIVE /
  * EXTEND) are §F, and the code-length/value tables are the Annex K
  * typical luminance tables. Pure JVM — no imaging libraries exist in
  * this environment, which is exactly why the codec seam
  * ([[Multimodal.MediaCodec]]) wants a library-free implementation.
  *
  * Oracle strategy (the [[Multimodal.toPng]] discipline, adapted to a
  * LOSSY codec): the full raster round trip is quantization-lossy, so
  * the declared query surfaces the DC PLANE, which is exact end to
  * end — the encoder computes each block's quantized DC coefficient
  * in pure integer arithmetic (the 2-D DCT's F(0,0) is exactly
  * Σ(x−128)/8, so with Q_DC = 1 the quantized DC is
  * floorDiv(Σx − 8192 + 4, 8), round-half-up), DPCM + Huffman carry
  * integers losslessly, and the decoder recovers them bit-exactly.
  * DuckDB re-derives the same block sums from the documents' cycled
  * text bytes, so the WHOLE entropy stack (marker walk, DHT canonical
  * code rebuild, stuffed-bit reading, DPCM undo, dezigzag, dequantize)
  * is hash-oracled — a single flipped bit anywhere breaks the compare.
  * The lossy AC path is pinned by JpegSpec instead: the entropy layer
  * must be LOSSLESS ON COEFFICIENTS (decode(encode(x)) equals a plain
  * quant→dequant→IDCT reference computed with no entropy coding at
  * all, byte-for-byte), which is the strongest statement a lossy codec
  * admits.
  */
object Jpeg {

  // ----------------------------------------------------------------- tables

  /** Zigzag scan: position k in the scan → natural (row-major) index. */
  private[ops] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Annex K.1 typical luminance quantization table (natural order),
    * with ONE deliberate change: Q(0,0) = 1 instead of 16, so the DC
    * plane survives quantization exactly and the declared query stays
    * cross-engine hash-oracleable (scaladoc above). AC entries are the
    * standard table verbatim — the lossy path is real.
    */
  private[ops] val QuantTable: Array[Int] = Array(
    1, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  /** Annex K.3.1: typical DC luminance table — BITS (number of codes of
    * each length 1..16) and HUFFVAL (symbols in code order).
    */
  private val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray

  /** Annex K.3.2: typical AC luminance table. Symbols are (run << 4) |
    * size with the two specials 0x00 = EOB and 0xF0 = ZRL.
    */
  private val AcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Canonical Huffman codes from a (BITS, HUFFVAL) pair — T.81 §C.2:
    * codes of increasing length, assigned in value order, each length
    * starting at (prev + count(prev)) << 1. Returns value → (code, len).
    */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    val out = Map.newBuilder[Int, (Int, Int)]
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      for (_ <- 0 until bits(len - 1)) {
        out += vals(k) -> ((code, len))
        code += 1; k += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** Encode tables as flat (code << 5 | len) arrays indexed by symbol —
    * no tuple boxing on the per-coefficient hot path (codes ≤ 16 bits,
    * lengths ≤ 16, so the packing is lossless).
    */
  private def packedCodes(bits: Array[Int], vals: Array[Int]): Array[Int] = {
    val m = canonicalCodes(bits, vals)
    val out = Array.fill(256)(-1)
    m.foreach { case (sym, (code, len)) => out(sym) = (code << 5) | len }
    out
  }
  private val DcEncode = packedCodes(DcBits, DcVals)
  private val AcEncode = packedCodes(AcBits, AcVals)

  // ------------------------------------------------------------ bit streams

  /** MSB-first bit writer with T.81 §B.1.1.5 byte stuffing: every 0xFF
    * data byte is followed by 0x00 so entropy data can never alias a
    * marker. Final partial byte pads with 1-bits (§F.1.2.3).
    */
  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(bits: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bits >>> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n)
  }

  /** MSB-first bit reader over entropy-coded data: un-stuffs 0xFF 0x00;
    * any other 0xFF xx mid-stream is a marker where data was expected —
    * fail loudly (truncated or corrupt scan). `pos` after the last
    * needed bit lets the caller find the trailing EOI.
    */
  private final class BitReader(data: Array[Byte], start: Int) {
    private var posB = start
    private var cur = 0
    private var n = 0
    def bit(): Int = {
      if (n == 0) {
        require(posB < data.length, "truncated JPEG: scan data ends mid-block")
        cur = data(posB) & 0xff
        posB += 1
        if (cur == 0xff) {
          require(posB < data.length && data(posB) == 0x00,
            "JPEG marker inside entropy-coded data: truncated or corrupt scan")
          posB += 1
        }
        n = 8
      }
      n -= 1
      (cur >>> n) & 1
    }
    def receive(len: Int): Int = {
      var v = 0
      var i = 0
      while (i < len) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte offset of the next unread byte (pad bits discarded). */
    def bytePos: Int = posB
  }

  /** T.81 §F.2.2.1 EXTEND: map the `len` received magnitude bits back
    * to the signed value ( values < 2^(len−1) encode negatives ).
    */
  private def extend(v: Int, len: Int): Int =
    if (len == 0) 0 else if (v < (1 << (len - 1))) v - (1 << len) + 1 else v

  /** Magnitude category: smallest s with |v| < 2^s (0 for v = 0). */
  private def category(v: Int): Int = {
    var a = math.abs(v)
    var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  // ------------------------------------------------------------------- DCT

  private val CosTable: Array[Double] =
    Array.tabulate(8, 8)((x, u) => math.cos((2 * x + 1) * u * math.Pi / 16)).flatten
  private def cosAt(x: Int, u: Int): Double = CosTable(x * 8 + u)
  private def cNorm(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

  /** Forward 2-D DCT-II of one level-shifted 8×8 block (row-major),
    * quantized per [[QuantTable]], computed SEPARABLY (rows then
    * columns — 2·8·64 multiplies per block instead of the direct
    * form's 64·64; same transform, float regrouping only). The AC path
    * is the plain float transform with round-half-up quantization; the
    * DC path is EXACT integer arithmetic — F(0,0) = Σx/8 algebraically,
    * so with Q_DC = 1 the quantized DC is floorDiv(Σx + 4, 8), which is
    * the identity the cross-engine oracle re-derives (object scaladoc).
    */
  private[ops] def fdctQuant(shifted: Array[Int]): Array[Int] = {
    val out = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) { sum += shifted(i); i += 1 }
    out(0) = Math.floorDiv(sum + 4, 8).toInt
    // tmp(u, y) = Σ_x s(x, y)·cos(x, u)
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0.0
        var x = 0
        while (x < 8) { acc += shifted(x * 8 + y) * cosAt(x, u); x += 1 }
        tmp(u * 8 + y) = acc
        y += 1
      }
      u += 1
    }
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          var acc = 0.0
          var y = 0
          while (y < 8) { acc += tmp(u * 8 + y) * cosAt(y, v); y += 1 }
          val f = 0.25 * cNorm(u) * cNorm(v) * acc
          out(u * 8 + v) = Math.round(f / QuantTable(u * 8 + v)).toInt
        }
        v += 1
      }
      u += 1
    }
    out
  }

  /** Inverse: dequantize + separable 2-D IDCT + level unshift + clamp. */
  private[ops] def dequantIdct(coef: Array[Int]): Array[Int] = {
    // tmp(x, v) = Σ_u c(u)·F'(u, v)·cos(x, u)
    val tmp = new Array[Double](64)
    var x = 0
    while (x < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) {
          acc += cNorm(u) * (coef(u * 8 + v).toDouble * QuantTable(u * 8 + v)) * cosAt(x, u)
          u += 1
        }
        tmp(x * 8 + v) = acc
        v += 1
      }
      x += 1
    }
    val out = new Array[Int](64)
    x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += cNorm(v) * tmp(x * 8 + v) * cosAt(y, v); v += 1 }
        val p = Math.round(0.25 * acc).toInt + 128
        out(x * 8 + y) = math.max(0, math.min(255, p))
        y += 1
      }
      x += 1
    }
    out
  }

  // ---------------------------------------------------------------- encoder

  private def be16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def marker(out: java.io.ByteArrayOutputStream, m: Int): Unit = {
    out.write(0xff); out.write(m)
  }

  /** Segment with the standard 2-byte length (length includes itself). */
  private def segment(out: java.io.ByteArrayOutputStream, m: Int, body: Array[Byte]): Unit = {
    marker(out, m); be16(out, body.length + 2); out.write(body, 0, body.length)
  }

  /** Encode an 8-bit grayscale raster as a real baseline JPEG. True
    * dimensions go in SOF0; blocks pad to the MCU grid by edge
    * replication (the standard's recommended fill — keeps the padded
    * DC equal to real pixels' structure rather than injecting a hard
    * edge the AC coefficients would pay for).
    */
  private[ops] def encodeJpeg(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff, s"bad JPEG dims ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    marker(out, 0xd8) // SOI
    // DQT: Pq=0 (8-bit), Tq=0; entries in ZIGZAG order (§B.2.4.1)
    val dqt = new java.io.ByteArrayOutputStream()
    dqt.write(0x00)
    for (k <- 0 until 64) dqt.write(QuantTable(Zigzag(k)))
    segment(out, 0xdb, dqt.toByteArray)
    // SOF0: precision 8, lines, samples/line, 1 component (id 1, 1x1, Tq 0)
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8); be16(sof, h); be16(sof, w); sof.write(1)
    sof.write(1); sof.write(0x11); sof.write(0)
    segment(out, 0xc0, sof.toByteArray)
    // DHT: DC table (Tc=0,Th=0) then AC table (Tc=1,Th=0) in one segment
    val dht = new java.io.ByteArrayOutputStream()
    dht.write(0x00); DcBits.foreach(dht.write); DcVals.foreach(dht.write)
    dht.write(0x10); AcBits.foreach(dht.write); AcVals.foreach(dht.write)
    segment(out, 0xc4, dht.toByteArray)
    // SOS: 1 component (id 1, Td=0/Ta=0), Ss=0, Se=63, AhAl=0
    segment(out, 0xda, Array[Byte](1, 1, 0x00, 0, 63, 0))
    val bw = new BitWriter(out)
    val bw8 = (w + 7) / 8
    val bh8 = (h + 7) / 8
    var prevDc = 0
    for (br <- 0 until bh8; bc <- 0 until bw8) {
      val shifted = new Array[Int](64)
      for (r <- 0 until 8; c <- 0 until 8) {
        val rr = math.min(h - 1, br * 8 + r) // edge-replicate pad
        val cc = math.min(w - 1, bc * 8 + c)
        shifted(r * 8 + c) = (pixel(rr, cc) & 0xff) - 128
      }
      val q = fdctQuant(shifted)
      // DC: DPCM diff, category code + magnitude bits (§F.1.2.1)
      val diff = q(0) - prevDc
      prevDc = q(0)
      val s = category(diff)
      val dcP = DcEncode(s)
      bw.put(dcP >>> 5, dcP & 0x1f)
      if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      // AC: zigzag run-length with ZRL/EOB (§F.1.2.2)
      var run = 0
      var lastNz = 0
      var k = 1
      while (k < 64) { if (q(Zigzag(k)) != 0) lastNz = k; k += 1 }
      k = 1
      while (k <= lastNz) {
        val v = q(Zigzag(k))
        if (v == 0) run += 1
        else {
          while (run > 15) { val p0 = AcEncode(0xf0); bw.put(p0 >>> 5, p0 & 0x1f); run -= 16 }
          val sz = category(v)
          val p1 = AcEncode((run << 4) | sz)
          bw.put(p1 >>> 5, p1 & 0x1f)
          bw.put(if (v < 0) v + (1 << sz) - 1 else v, sz)
          run = 0
        }
        k += 1
      }
      if (lastNz < 63) { val p2 = AcEncode(0x00); bw.put(p2 >>> 5, p2 & 0x1f) } // EOB
    }
    bw.flush()
    marker(out, 0xd9) // EOI
    out.toByteArray
  }

  // ---------------------------------------------------------------- decoder

  /** Canonical Huffman decoder per T.81 §F.2.2.3 — the
    * MINCODE/MAXCODE/VALPTR array walk, one compare per code length,
    * no per-bit allocation (the hot path of every scan byte).
    */
  private final class HuffDecodeTable(bits: Array[Int], vals: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = Array.fill(17)(-1)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1)
          k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
    def decode(br: BitReader): Int = {
      var len = 1
      var code = br.bit()
      while (len <= 16) {
        if (maxCode(len) >= 0 && code <= maxCode(len))
          return vals(valPtr(len) + code - minCode(len))
        code = (code << 1) | br.bit()
        len += 1
      }
      throw new IllegalArgumentException("invalid JPEG Huffman code (corrupt scan)")
    }
  }

  /** Parsed scan state: dims + tables + entropy-data offset. */
  private final case class ScanHeader(
      w: Int, h: Int,
      quant: Array[Int], // natural order
      dcDecode: HuffDecodeTable,
      acDecode: HuffDecodeTable,
      scanStart: Int)

  /** Walk the marker segments to the scan (§B.2): verifies SOI, reads
    * DQT/DHT/SOF0/SOS, skips APPn/COM, fails loudly on anything a
    * baseline grayscale decoder can't honor.
    */
  private def parseHeaders(p: Array[Byte]): ScanHeader = {
    require(p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8,
      "not a JPEG: bad SOI")
    var off = 2
    var w = -1; var h = -1
    var quant: Array[Int] = null
    var dc: HuffDecodeTable = null
    var ac: HuffDecodeTable = null
    while (true) {
      require(off + 4 <= p.length, "truncated JPEG: marker cut")
      require((p(off) & 0xff) == 0xff, s"JPEG marker expected at $off")
      val m = p(off + 1) & 0xff
      val len = ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
      require(off + 2 + len <= p.length, f"truncated JPEG: segment $m%02x cut")
      val body = off + 4
      m match {
        case 0xdb =>
          require((p(body) & 0xf0) == 0, "only 8-bit DQT supported")
          quant = new Array[Int](64)
          for (k <- 0 until 64) quant(Zigzag(k)) = p(body + 1 + k) & 0xff
        case 0xc4 =>
          var o = body
          while (o < off + 2 + len) {
            val tcTh = p(o) & 0xff
            val bits = Array.tabulate(16)(i => p(o + 1 + i) & 0xff)
            val n = bits.sum
            val vals = Array.tabulate(n)(i => p(o + 17 + i) & 0xff)
            if ((tcTh >> 4) == 0) dc = new HuffDecodeTable(bits, vals)
            else ac = new HuffDecodeTable(bits, vals)
            o += 17 + n
          }
        case 0xc0 =>
          require((p(body) & 0xff) == 8, "only 8-bit precision supported")
          h = ((p(body + 1) & 0xff) << 8) | (p(body + 2) & 0xff)
          w = ((p(body + 3) & 0xff) << 8) | (p(body + 4) & 0xff)
          require((p(body + 5) & 0xff) == 1, "only single-component (grayscale) JPEG supported")
        case 0xda =>
          require(w > 0 && h > 0, "JPEG SOS before SOF0")
          require(quant != null && dc != null && ac != null, "JPEG SOS before DQT/DHT")
          return ScanHeader(w, h, quant, dc, ac, off + 2 + len)
        case x if x >= 0xe0 && x <= 0xef => () // APPn: skipped
        case 0xfe => () // COM: skipped
        case other =>
          throw new IllegalArgumentException(
            f"unsupported JPEG marker $other%02x (baseline grayscale decoder)")
      }
      off += 2 + len
    }
    sys.error("unreachable")
  }

  /** Entropy-decode every block's QUANTIZED coefficients (natural
    * order) — the shared lossless core of [[JpegCodec.decode]] and
    * [[dcStats]]. Verifies the trailing EOI.
    */
  private[ops] def decodeCoefficients(p: Array[Byte]): (Int, Int, Array[Array[Int]]) = {
    val hdr = parseHeaders(p)
    val bw8 = (hdr.w + 7) / 8
    val bh8 = (hdr.h + 7) / 8
    val br = new BitReader(p, hdr.scanStart)
    val blocks = new Array[Array[Int]](bw8 * bh8)
    var prevDc = 0
    var b = 0
    while (b < blocks.length) {
      val q = new Array[Int](64)
      val s = hdr.dcDecode.decode(br)
      prevDc += extend(br.receive(s), s)
      q(0) = prevDc
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = hdr.acDecode.decode(br)
        if (rs == 0x00) eob = true
        else if (rs == 0xf0) k += 16
        else {
          k += rs >> 4
          require(k < 64, "JPEG AC run overflows the block (corrupt scan)")
          val sz = rs & 0x0f
          q(Zigzag(k)) = extend(br.receive(sz), sz)
          k += 1
        }
      }
      blocks(b) = q
      b += 1
    }
    val tail = br.bytePos
    require(tail + 2 <= p.length && (p(tail) & 0xff) == 0xff && (p(tail + 1) & 0xff) == 0xd9,
      "truncated JPEG: EOI missing after scan")
    (hdr.w, hdr.h, blocks)
  }

  /** The DC-plane statistics the declared query surfaces: full entropy
    * decode, then per-block DEQUANTIZED DC (exact integers end to end —
    * object scaladoc). Returns (width, height, nBlocks, dcMean) with
    * dcMean = one final IEEE division of an exact integer sum.
    */
  private[ops] def dcStats(p: Array[Byte]): (Int, Int, Int, Double) = {
    val hdr = parseHeaders(p)
    val (w, h, blocks) = decodeCoefficients(p)
    var sum = 0L
    var i = 0
    while (i < blocks.length) { sum += blocks(i)(0).toLong * hdr.quant(0); i += 1 }
    (w, h, blocks.length, sum.toDouble / blocks.length)
  }

  /** The [[MediaCodec]] face: full lossy raster decode (IDCT + crop to
    * the SOF0 dims), nearest-neighbor resize re-encoded as JPEG, and
    * concatenated-still demux by marker walking — same seam as
    * [[Multimodal.PngCodec]].
    */
  object JpegCodec extends MediaCodec {

    private[ops] def decodeRaw(p: Array[Byte]): (Int, Int, Array[Int]) = {
      val (w, h, blocks) = decodeCoefficients(p)
      val bw8 = (w + 7) / 8
      val raw = new Array[Int](w * h)
      for (b <- blocks.indices) {
        val px = dequantIdct(blocks(b))
        val r0 = (b / bw8) * 8
        val c0 = (b % bw8) * 8
        for (r <- 0 until 8; c <- 0 until 8;
             if r0 + r < h && c0 + c < w) // crop MCU padding
          raw((r0 + r) * w + (c0 + c)) = px(r * 8 + c)
      }
      (w, h, raw)
    }

    def decode(p: Array[Byte]): Decoded = {
      val (w, h, raw) = decodeRaw(p)
      var sum = 0L
      var i = 0
      while (i < raw.length) { sum += raw(i); i += 1 }
      Decoded(w, h, 1, if (raw.isEmpty) 0.0 else sum.toDouble / raw.length)
    }

    def resize(p: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val (w0, h0, raw) = decodeRaw(p)
      encodeJpeg(w, h, (r, c) => raw((r * h0 / h) * w0 + (c * w0 / w)))
    }

    /** Concatenated JPEG stills: each frame walked SOI→EOI (segment
      * lengths skip headers; entropy data is scanned for a real marker,
      * which stuffing guarantees is the next marker, here EOI).
      */
    def frameSample(p: Array[Byte], frameBytes: Int, everyK: Int): Seq[(Int, Array[Byte])] = {
      val out = Seq.newBuilder[(Int, Array[Byte])]
      var off = 0
      var idx = 0
      while (off < p.length) {
        require(off + 2 <= p.length && (p(off) & 0xff) == 0xff && (p(off + 1) & 0xff) == 0xd8,
          "concatenated payload: not a JPEG at frame boundary")
        var end = off + 2
        var done = false
        while (!done) {
          require(end + 2 <= p.length, "truncated JPEG frame")
          require((p(end) & 0xff) == 0xff, "concatenated payload: lost marker sync")
          val m = p(end + 1) & 0xff
          if (m == 0xd9) { end += 2; done = true }
          else if (m == 0xda) {
            val len = ((p(end + 2) & 0xff) << 8) | (p(end + 3) & 0xff)
            end += 2 + len
            // entropy data: next 0xFF not followed by 0x00 is the EOI
            var scanning = true
            while (scanning) {
              require(end + 1 < p.length, "truncated JPEG frame scan")
              if ((p(end) & 0xff) == 0xff && p(end + 1) != 0x00) scanning = false
              else end += 1
            }
          } else {
            val len = ((p(end + 2) & 0xff) << 8) | (p(end + 3) & 0xff)
            end += 2 + len
          }
        }
        if (idx % everyK == 0)
          out += ((idx, java.util.Arrays.copyOfRange(p, off, end)))
        off = end
        idx += 1
      }
      out.result()
    }
  }

  // ----------------------------------------------------------------- query

  /** Deterministic JPEG payload per document — the [[Multimodal.toPpm]]
    * discipline with MCU-aligned dims (whole blocks keep the DC oracle
    * a clean per-block sum): w ∈ {8,16}, h ∈ {8,16,24}, grayscale
    * pixels cycling the document's ASCII bytes row-major.
    */
  private[ops] def toJpeg(docId: Long, text: Array[Byte]): Array[Byte] = {
    val w = 8 * (1 + (docId % 2)).toInt
    val h = 8 * (1 + (docId % 3)).toInt
    encodeJpeg(w, h,
      (r, c) => if (text.isEmpty) 0 else text((r * w + c) % text.length) & 0xff)
  }

  /** The DCT-entropy-path declared query: encode each document as a
    * real baseline JPEG, entropy-decode it back, and surface the
    * DC-plane statistics that are EXACT end to end (object scaladoc) —
    * so the Huffman/DPCM/zigzag/stuffing stack is hash-oracled, with
    * the lossy AC raster pinned by JpegSpec's reference-math law.
    */
  val qMmJpeg = Q(
    "q_mm_jpeg",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        .select(col("doc_id").cast("long"), col("text").cast("binary"))
        .as[(Long, Array[Byte])]
        .mapPartitions(it => it.map { case (id, t) =>
          val (w, h, n, m) = dcStats(toJpeg(id, t))
          (id, w, h, n, m)
        })
        .toDF("doc_id", "width", "height", "n_blocks", "dc_mean")
        .orderBy("doc_id")
    },
    Some("""WITH p AS (SELECT doc_id,
                              CAST(8 * (1 + doc_id % 2) AS INTEGER) AS width,
                              CAST(8 * (1 + doc_id % 3) AS INTEGER) AS height,
                              text,
                              octet_length(CAST(text AS BLOB)) AS len
                       FROM documents),
                 u AS (SELECT doc_id, width, height, len, text,
                              unnest(range(CAST(width * height AS BIGINT))) AS i
                       FROM p),
                 q AS (SELECT doc_id, width, height,
                              (i // width) // 8 AS br,
                              (i % width) // 8 AS bc,
                              ord(substr(text, CAST(i % len AS INTEGER) + 1, 1)) AS v
                       FROM u),
                 b AS (SELECT doc_id, width, height, br, bc,
                              CAST(floor((sum(v) - 8192 + 4) / 8.0) AS BIGINT) AS dc
                       FROM q GROUP BY doc_id, width, height, br, bc)
            SELECT doc_id, width, height,
                   CAST(count(*) AS INTEGER) AS n_blocks,
                   CAST(sum(dc) AS DOUBLE) / count(*) AS dc_mean
            FROM b GROUP BY doc_id, width, height
            ORDER BY doc_id""")
  )
}
