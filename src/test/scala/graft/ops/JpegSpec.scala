package graft.ops

import graft.SparkSpec

/** The JPEG baseline codec ([[Jpeg]]) — the DCT-domain entropy path.
  *
  * The load-bearing law for a LOSSY codec: the entropy layer must be
  * LOSSLESS ON COEFFICIENTS. decode(encode(x)) is compared
  * byte-for-byte against a plain quant→dequant→IDCT reference that
  * never touches Huffman/DPCM/zigzag/stuffing — equality proves the
  * whole entropy stack is a bijection on the quantized blocks, which
  * is the strongest statement the format admits. The DC plane is
  * additionally exact against the integer formula the DuckDB oracle
  * uses (floorDiv(Σx − 8192 + 4, 8) with Q_DC = 1), so q_mm_jpeg is
  * hash-compared cross-engine despite the lossy raster.
  */
class JpegSpec extends SparkSpec {
  import Jpeg._

  /** Reference raster with NO entropy coding: per block pad → level
    * shift → [[Jpeg.fdctQuant]] → [[Jpeg.dequantIdct]] → crop. What the
    * full decode must reproduce byte-for-byte.
    */
  private def referenceRaster(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Int] = {
    val bw8 = (w + 7) / 8
    val bh8 = (h + 7) / 8
    val out = new Array[Int](w * h)
    for (br <- 0 until bh8; bc <- 0 until bw8) {
      val shifted = Array.tabulate(64) { i =>
        val r = math.min(h - 1, br * 8 + i / 8)
        val c = math.min(w - 1, bc * 8 + i % 8)
        (pixel(r, c) & 0xff) - 128
      }
      val px = dequantIdct(fdctQuant(shifted))
      for (r <- 0 until 8; c <- 0 until 8;
           if br * 8 + r < h && bc * 8 + c < w)
        out((br * 8 + r) * w + (bc * 8 + c)) = px(r * 8 + c)
    }
    out
  }

  private def cyclePixel(text: Array[Byte], w: Int): (Int, Int) => Int =
    (r, c) => text((r * w + c) % text.length) & 0xff

  test("entropy layer is lossless on coefficients: decoded blocks == fdctQuant blocks exactly") {
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 13L, 41L)) {
      val text = s"coefficient fidelity sweep $id lorem ipsum".getBytes("US-ASCII")
      val w = 8 * (1 + (id % 2)).toInt
      val h = 8 * (1 + (id % 3)).toInt
      val jpeg = encodeJpeg(w, h, cyclePixel(text, w))
      val (dw, dh, blocks) = decodeCoefficients(jpeg)
      assert((dw, dh) == ((w, h)))
      val bw8 = w / 8
      for (b <- blocks.indices) {
        val br = b / bw8; val bc = b % bw8
        val shifted = Array.tabulate(64) { i =>
          (cyclePixel(text, w)(br * 8 + i / 8, bc * 8 + i % 8)) - 128
        }
        assert(blocks(b).toSeq == fdctQuant(shifted).toSeq,
          s"doc $id block $b coefficient mismatch — entropy layer not lossless")
      }
    }
  }

  test("full decode equals the no-entropy reference raster byte-for-byte, incl. MCU padding crop") {
    // (10, 12) exercises the edge-replication pad + crop path; the
    // MCU-aligned pair exercises the declared-query shape
    for ((w, h, seed) <- Seq((10, 12, "pad me"), (16, 24, "aligned blocks"), (8, 8, "one"))) {
      val text = s"$seed raster".getBytes("US-ASCII")
      val jpeg = encodeJpeg(w, h, cyclePixel(text, w))
      val (dw, dh, raw) = JpegCodec.decodeRaw(jpeg)
      assert((dw, dh) == ((w, h)))
      assert(raw.toSeq == referenceRaster(w, h, cyclePixel(text, w)).toSeq,
        s"${w}x$h raster diverges from the reference math")
    }
  }

  test("lossy raster error is bounded by the quantization-derived bound") {
    // per-pixel error <= sum over (u,v) of (Q/2) * |basis| + 0.5 final
    // rounding; basis magnitude <= C(u)C(v)/4
    def cN(u: Int) = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    val bound = (for (u <- 0 until 8; v <- 0 until 8)
      yield (QuantTable(u * 8 + v) / 2.0) * cN(u) * cN(v) / 4.0).sum + 0.5
    for (id <- Seq(2L, 9L, 23L)) {
      val text = s"error bound sweep $id".getBytes("US-ASCII")
      val w = 8 * (1 + (id % 2)).toInt
      val h = 8 * (1 + (id % 3)).toInt
      val (_, _, raw) = JpegCodec.decodeRaw(encodeJpeg(w, h, cyclePixel(text, w)))
      val maxErr = (0 until w * h)
        .map(i => math.abs(raw(i) - cyclePixel(text, w)(i / w, i % w))).max
      assert(maxErr <= bound, s"doc $id max error $maxErr exceeds bound $bound")
    }
  }

  test("DC plane is exact: dcStats equals the integer block-sum formula the oracle uses") {
    for (id <- 0L until 24L) {
      val text = s"dc exactness $id with varied content ${id * 37}".getBytes("US-ASCII")
      val (w, h, n, mean) = dcStats(toJpeg(id, text))
      assert(w == 8 * (1 + (id % 2)).toInt && h == 8 * (1 + (id % 3)).toInt)
      assert(n == (w / 8) * (h / 8))
      val dcs = for (br <- 0 until h / 8; bc <- 0 until w / 8) yield {
        val sum = (for (r <- 0 until 8; c <- 0 until 8)
          yield (text(((br * 8 + r) * w + (bc * 8 + c)) % text.length) & 0xff).toLong).sum
        Math.floorDiv(sum - 8192 + 4, 8)
      }
      assert(mean == dcs.sum.toDouble / n, s"doc $id dc mean mismatch")
    }
  }

  test("byte stuffing occurs in real payloads and round-trips") {
    // scan region = after the SOS segment; look for stuffed 0xFF 0x00
    def scanHasStuffing(p: Array[Byte]): Boolean = {
      var off = 2
      var scan = -1
      while (scan < 0) {
        val m = p(off + 1) & 0xff
        val len = ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)
        if (m == 0xda) scan = off + 2 + len else off += 2 + len
      }
      (scan until p.length - 2).exists(i =>
        (p(i) & 0xff) == 0xff && p(i + 1) == 0x00)
    }
    // high-contrast pixels produce large ACs -> long magnitude runs ->
    // some payload in the sweep must emit an 0xFF data byte
    val payloads = (0 until 64).map { s =>
      encodeJpeg(16, 16, (r, c) => if (((r * 16 + c) + s) % 2 == 0) 255 else 0)
    } ++ (0L until 32L).map(id => toJpeg(id, s"stuffing sweep $id".getBytes("US-ASCII")))
    assert(payloads.exists(scanHasStuffing), "sweep never exercised byte stuffing")
    payloads.foreach(p => decodeCoefficients(p)) // all must decode cleanly
  }

  test("malformed input fails loudly: bad SOI, truncated scan, missing EOI, corrupt codes") {
    val good = toJpeg(3L, "tamper target".getBytes("US-ASCII"))
    val badSoi = good.clone(); badSoi(1) = 0x00
    assertThrows[IllegalArgumentException](JpegCodec.decode(badSoi))
    assertThrows[IllegalArgumentException](
      JpegCodec.decode(good.take(good.length - 8))) // cuts scan + EOI
    val noEoi = good.take(good.length - 2) ++ Array[Byte](0x41, 0x41)
    assertThrows[IllegalArgumentException](JpegCodec.decode(noEoi))
    // corrupting the FIRST scan byte must fail (invalid code / marker
    // in scan / run overflow) or change the first block's DC, which
    // DPCM propagates to every block — never decode to the original
    // coefficients
    val scanStart = {
      var off = 2
      var s = -1
      while (s < 0) {
        val m = good(off + 1) & 0xff
        val len = ((good(off + 2) & 0xff) << 8) | (good(off + 3) & 0xff)
        if (m == 0xda) s = off + 2 + len else off += 2 + len
      }
      s
    }
    val t = good.clone()
    t(scanStart) = (t(scanStart) ^ 0x7f).toByte
    val r = try Some(decodeCoefficients(t)._3.map(_.toSeq).toSeq)
            catch { case _: Exception => None }
    r.foreach(blocks => assert(blocks != decodeCoefficients(good)._3.map(_.toSeq).toSeq,
      "corrupt scan decoded to identical coefficients"))
  }

  test("resize re-encodes the nearest-neighbor raster exactly; frameSample demuxes stills") {
    val text = "resize and demux".getBytes("US-ASCII")
    val jpeg = toJpeg(9L, text)
    val (w0, h0, raw) = JpegCodec.decodeRaw(jpeg)
    val thumb = JpegCodec.resize(jpeg, 8, 8)
    val expected = encodeJpeg(8, 8, (r, c) => raw((r * h0 / 8) * w0 + (c * w0 / 8)))
    assert(thumb.toSeq == expected.toSeq, "resize must be NN + deterministic re-encode")

    val a = toJpeg(1L, "aaa".getBytes)
    val b = toJpeg(2L, "bbbb".getBytes)
    val c = toJpeg(3L, "ccccc".getBytes)
    val frames = JpegCodec.frameSample(a ++ b ++ c, 0, 2)
    assert(frames.map(_._1) == Seq(0, 2))
    assert(frames(0)._2.toSeq == a.toSeq && frames(1)._2.toSeq == c.toSeq)
  }

  test("declared q_mm_jpeg matches a driver recompute at sf0.001") {
    val got = qMmJpeg.fn(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.length == docs.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val text = docs(id).getBytes("US-ASCII")
      val w = 8 * (1 + (id % 2)).toInt
      val h = 8 * (1 + (id % 3)).toInt
      val dcs = for (br <- 0 until h / 8; bc <- 0 until w / 8) yield {
        val sum = (for (rr <- 0 until 8; cc <- 0 until 8)
          yield (text(((br * 8 + rr) * w + (bc * 8 + cc)) % text.length) & 0xff).toLong).sum
        Math.floorDiv(sum - 8192 + 4, 8)
      }
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((w, h, dcs.size)), s"doc $id dims")
      assert(r.getDouble(4) == dcs.sum.toDouble / dcs.size, s"doc $id dc mean")
    }
  }
}
