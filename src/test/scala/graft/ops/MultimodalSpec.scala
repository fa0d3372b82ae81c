package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The codec seam: [[Multimodal.MediaCodec]] is pluggable — the same
  * operators run a custom implementation, and the default is
  * [[Multimodal.FakeCodec]] (whose outputs the DuckDB oracle verifies
  * end-to-end via the declared q_mm_* queries).
  */
class MultimodalSpec extends SparkSpec {
  import Multimodal._

  /** Constant-output codec: distinguishable from the fake in every field. */
  private object ConstCodec extends MediaCodec {
    def decode(payload: Array[Byte]): Decoded = Decoded(1, 2, 4, 42.0)
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = Array[Byte](7)
    def frameSample(payload: Array[Byte], frameBytes: Int, everyK: Int): Seq[(Int, Array[Byte])] =
      Seq(0 -> Array[Byte](9))
  }

  private def media = Tables
    .documents(spark, sf0001)
    .limit(20)
    .select(col("doc_id"), col("text").cast("binary").as("payload"))

  test("extractFeatures runs the plugged codec, FakeCodec by default") {
    val const = extractFeatures(spark, media, ConstCodec).collect()
    assert(const.length == 20)
    assert(const.forall(r =>
      r.getAs[Int]("width") == 1 && r.getAs[Int]("height") == 2 &&
        r.getAs[Int]("channels") == 4 && r.getAs[Double]("mean_byte") == 42.0))

    val fake = extractFeatures(spark, media).collect()
    assert(fake.forall(r => r.getAs[Int]("channels") == 3))
    assert(fake.forall(r => r.getAs[Int]("width") == 16 + r.getAs[Int]("n_bytes") % 241))
  }

  test("sampleFrames fan-out and resizeThumbs honor the plugged codec") {
    val frames = sampleFrames(spark, media, frameBytes = 64, everyK = 3, codec = ConstCodec)
    assert(frames.count() == 20) // ConstCodec: exactly one frame per row
    assert(frames.select("n_bytes").distinct().collect().map(_.getInt(0)).toSeq == Seq(1))

    val thumbs = resizeThumbs(spark, media, 32, 32, codec = ConstCodec).collect()
    assert(thumbs.forall(_.getAs[Int]("thumb_bytes") == 1))
  }

  /** A w×h P6 image whose pixel (x,y) is (r, x, y). */
  private def ppm(w: Int, h: Int, r: Int): Array[Byte] = {
    val head = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val raster = (0 until h).flatMap(y => (0 until w).flatMap(x =>
      Seq(r.toByte, x.toByte, y.toByte))).toArray
    head ++ raster
  }

  test("PpmCodec decodes real P6 headers and rasters") {
    val img = ppm(4, 2, 100)
    val d = PpmCodec.decode(img)
    assert(d.width == 4 && d.height == 2 && d.channels == 3)
    // mean over RASTER bytes only (header excluded): r=100, x∈0..3 ×2, y∈{0,1}×4
    val raster = (0 until 2).flatMap(y => (0 until 4).flatMap(x => Seq(100, x, y)))
    assert(d.meanByte == raster.sum.toDouble / raster.size)
    intercept[IllegalArgumentException](PpmCodec.decode("JFIF garbage".getBytes))
  }

  test("PpmCodec resize is exact nearest-neighbor, re-encoded as P6") {
    val small = PpmCodec.resize(ppm(4, 2, 100), 2, 1)
    val d = PpmCodec.decode(small)
    assert(d.width == 2 && d.height == 1)
    // nearest-neighbor picks src pixels (0,0) and (2,0): bytes (100,0,0,100,2,0)
    val start = small.length - 6
    assert(small.slice(start, start + 6).toSeq ==
      Seq[Byte](100, 0, 0, 100, 2, 0))
  }

  test("PpmCodec demuxes concatenated frames and drives the real operators") {
    // a 3-frame "rawvideo" payload; every 2nd frame sampled → frames 0, 2
    val vid = ppm(2, 2, 10) ++ ppm(2, 2, 20) ++ ppm(2, 2, 30)
    val sampled = PpmCodec.frameSample(vid, frameBytes = 0, everyK = 2)
    assert(sampled.map(_._1) == Seq(0, 2))
    assert(sampled.forall { case (_, f) => PpmCodec.decode(f).width == 2 })

    // end-to-end through the Spark operators with the REAL codec
    import spark.implicits._
    val mediaDf = Seq((1L, ppm(4, 2, 100)), (2L, vid))
      .toDF("doc_id", "payload")
    val feats = extractFeatures(spark, mediaDf.where(col("doc_id") === 1), PpmCodec).collect()
    assert(feats.head.getAs[Int]("width") == 4 && feats.head.getAs[Int]("height") == 2)
    val frames = sampleFrames(spark, mediaDf.where(col("doc_id") === 2),
      frameBytes = 0, everyK = 2, codec = PpmCodec).collect()
    assert(frames.length == 2)
    val thumbs = resizeThumbs(spark, mediaDf.where(col("doc_id") === 1),
      2, 1, codec = PpmCodec).collect()
    assert(thumbs.head.getAs[Int]("thumb_bytes") == "P6\n2 1\n255\n".length + 6)
  }

  test("q_mm_decode_ppm: real-codec decode matches a driver-side recompute") {
    val got = Multimodal.qMmDecodePpm.fn(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id").cast("long"), col("text"))
      .collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("US-ASCII"))
      .toMap
    assert(got.length == docs.size && got.nonEmpty)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val text = docs(id)
      val w = 8 + (id % 8).toInt
      val h = 8 + ((id * 3) % 8).toInt
      val n = w * h * 3
      val expectMean =
        (0 until n).map(i => text(i % text.length) & 0xff).sum.toDouble / n
      assert(r.getAs[Int]("width") == w && r.getAs[Int]("height") == h)
      assert(r.getAs[Int]("channels") == 3)
      assert(r.getAs[Int]("n_bytes") == s"P6\n$w $h\n255\n".length + n)
      assert(r.getAs[Double]("mean_byte") == expectMean)
    }
  }

  test("WavCodec is a chunk PARSER: extra/odd chunks before fmt and data decode identically") {
    val canonical = Multimodal.toWav(7L, "hello world".getBytes("US-ASCII"))
    val base = Multimodal.WavCodec.decode(canonical)
    assert(base.sampleRate == 8000 && base.channels == 1
      && base.bitsPerSample == 16 && base.nSamples == 256 + 7)

    // rebuild the same file with a 5-byte (ODD — exercises the RIFF pad
    // rule) LIST chunk inserted before fmt : a fixed-offset reader
    // breaks, a parser does not
    val fmtAndData = canonical.drop(12)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0) ++ "INFOX".getBytes("US-ASCII") ++ Array[Byte](0)
    val body = list ++ fmtAndData
    val buf = java.nio.ByteBuffer.allocate(12 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
    buf.put("WAVE".getBytes("US-ASCII")).put(body)
    val shifted = Multimodal.WavCodec.decode(buf.array())
    assert(shifted == base, "chunk-shifted WAV decoded differently")

    // a truly malformed payload must fail loudly, not return garbage
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decode("RIFFxxxxJUNK".getBytes("US-ASCII"))
    }
  }

  /** Build a P6 payload with per-pixel gray g(x,y) (all 3 channels). */
  private def ppmOf(w: Int, h: Int)(g: (Int, Int) => Int): Array[Byte] = {
    val head = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](head.length + w * h * 3)
    System.arraycopy(head, 0, out, 0, head.length)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3)
      out(head.length + (y * w + x) * 3 + c) = g(x, y).toByte
    out
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
  private def bands(hh: Long): Seq[Long] =
    Seq(hh & 0xffffL, (hh >>> 16) & 0xffffL, (hh >>> 32) & 0xffffL, (hh >>> 48) & 0xffffL)

  test("dHash: near-duplicate images collide (small Hamming, shared band); unrelated don't") {
    val base = ppmOf(16, 14)((x, y) => (x * 37 + y * 101) % 251)
    // the same image with a handful of ±1-gray perturbed pixels — the
    // jpeg-reencode / resize noise a perceptual hash must absorb
    val noisy = ppmOf(16, 14) { (x, y) =>
      val v = (x * 37 + y * 101) % 251
      if ((x, y) == (3, 2) || (x, y) == (7, 9) || (x, y) == (12, 5)) v + 1 else v
    }
    val other = ppmOf(16, 14)((x, y) => (x * 53 + y * 7) % 251)
    val hb = Multimodal.dHash(base)
    val hn = Multimodal.dHash(noisy)
    val ho = Multimodal.dHash(other)
    assert(Multimodal.dHash(base) == hb, "dHash must be deterministic")
    val near = hamming(hb, hn)
    assert(near <= 3, s"near-dup Hamming $near > 3 — hash not noise-robust")
    // pigeonhole: ≤3 differing bits cannot touch all 4 bands
    assert(bands(hb).zip(bands(hn)).exists { case (a, b) => a == b },
      "near-dup pair shares no band — banded candidate generation would miss it")
    assert(hamming(hb, ho) >= 10,
      s"unrelated images at Hamming ${hamming(hb, ho)} — hash not discriminative")
  }

  test("q_mm_phash: one row per doc, bands are exact 16-bit slices of the hash") {
    val rows = graft.SparkEntry.queries("q_mm_phash")(spark, sf0001).collect()
    assert(rows.length == Tables.documents(spark, sf0001).count())
    rows.foreach { r =>
      val h = r.getLong(1)
      assert(r.getLong(2) == (h & 0xffffL) && r.getLong(3) == ((h >>> 16) & 0xffffL) &&
        r.getLong(4) == ((h >>> 32) & 0xffffL) && r.getLong(5) == ((h >>> 48) & 0xffffL))
    }
  }

  test("PngCodec round trip: CRC walk + inflate + all-five-filter defilter recover the exact raster") {
    // every encoded image has h >= 8 rows, so filter types 0..4 all
    // occur; decode must invert each against real DEFLATE output
    for (id <- Seq(0L, 3L, 7L, 12L, 41L)) {
      val text = s"the quick brown fox $id jumps".getBytes("US-ASCII")
      val png = Multimodal.toPng(id, text)
      // structural: two IDAT chunks (decoders must concatenate)
      def countChunks(p: Array[Byte], typ: String): Int = {
        var off = 8; var n = 0
        while (off < p.length) {
          val len = (p(off) & 0xff) << 24 | (p(off + 1) & 0xff) << 16 |
            (p(off + 2) & 0xff) << 8 | (p(off + 3) & 0xff)
          if (new String(p, off + 4, 4, "US-ASCII") == typ) n += 1
          off += 12 + len
        }
        n
      }
      assert(countChunks(png, "IDAT") == 2, "encoder must split IDAT")
      val w = 8 + (id % 8).toInt
      val h = 8 + ((id * 3) % 8).toInt
      val dec = Multimodal.PngCodec.decode(png)
      assert((dec.width, dec.height, dec.channels) == ((w, h, 1)))
      val expected = (0 until w * h).map(i => text(i % text.length) & 0xff)
      val (_, _, raw) = Multimodal.PngCodec.decodeRaw(png)
      assert(raw.toSeq == expected, s"doc $id raster mismatch")
      assert(dec.meanByte == expected.map(_.toLong).sum.toDouble / (w * h))
    }
  }

  test("PngCodec fails loudly on tampering: flipped byte (CRC), truncated IDAT, missing IEND") {
    val png = Multimodal.toPng(5L, "some pixels here".getBytes("US-ASCII"))
    // flip one raster-affecting byte inside the first IDAT body
    val tampered = png.clone()
    val idatOff = {
      var off = 8
      while (new String(tampered, off + 4, 4, "US-ASCII") != "IDAT")
        off += 12 + ((tampered(off) & 0xff) << 24 | (tampered(off + 1) & 0xff) << 16 |
          (tampered(off + 2) & 0xff) << 8 | (tampered(off + 3) & 0xff))
      off
    }
    tampered(idatOff + 8) = (tampered(idatOff + 8) ^ 0x55).toByte
    assertThrows[IllegalArgumentException](Multimodal.PngCodec.decode(tampered))
    // truncation mid-chunk
    assertThrows[IllegalArgumentException](
      Multimodal.PngCodec.decode(png.take(png.length - 20)))
    // signature corruption
    val sig = png.clone(); sig(0) = 0
    assertThrows[IllegalArgumentException](Multimodal.PngCodec.decode(sig))
  }

  test("PngCodec resize is exact nearest-neighbor through a full decode/re-encode round trip") {
    val text = "resize me please".getBytes("US-ASCII")
    val png = Multimodal.toPng(9L, text)
    val (w0, h0, raw) = Multimodal.PngCodec.decodeRaw(png)
    val thumb = Multimodal.PngCodec.resize(png, 4, 4)
    val (w1, h1, small) = Multimodal.PngCodec.decodeRaw(thumb)
    assert((w1, h1) == ((4, 4)))
    for (r <- 0 until 4; c <- 0 until 4)
      assert(small(r * 4 + c) == raw((r * h0 / 4) * w0 + (c * w0 / 4)))
  }

  test("PngCodec demuxes concatenated stills and the declared q_mm_png matches a driver recompute") {
    val a = Multimodal.toPng(1L, "aaa".getBytes)
    val b = Multimodal.toPng(2L, "bbbb".getBytes)
    val c = Multimodal.toPng(3L, "ccccc".getBytes)
    val frames = Multimodal.PngCodec.frameSample(a ++ b ++ c, 0, 2)
    assert(frames.map(_._1) == Seq(0, 2))
    assert(frames(0)._2.toSeq == a.toSeq && frames(1)._2.toSeq == c.toSeq)

    val got = Multimodal.qMmPng.fn(spark, sf0001).collect()
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.length == docs.size)
    got.foreach { r =>
      val id = r.getLong(0)
      val text = docs(id).getBytes("US-ASCII")
      val w = 8 + (id % 8).toInt
      val h = 8 + ((id * 3) % 8).toInt
      val mean = (0 until w * h).map(i => (text(i % text.length) & 0xff).toLong)
        .sum.toDouble / (w * h)
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) == ((w, h, 1)), s"doc $id dims")
      assert(r.getDouble(4) == mean, s"doc $id mean")
    }
  }
}
