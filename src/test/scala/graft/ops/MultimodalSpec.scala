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
}
