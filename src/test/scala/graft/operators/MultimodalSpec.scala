package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkFunSuite {

  private def media = graft.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text").cast("binary").as("content"))

  test("non-media payloads take the labeled stub path, deterministically") {
    val a = Multimodal.extractFeatures(media).collect()
    val b = Multimodal.extractFeatures(media).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    // text bytes are not decodable images → every row is labeled stub
    assert(a.forall(_.getString(3) == "stub"))
    assert(a.forall(_.isNullAt(4))) // no fake width
    assert(a.forall(_.getSeq[Double](13).length == Multimodal.StubCodec.FeatureDim))
    assert(a.forall(r => r.getLong(2) > 0)) // every doc yields frames
  }

  test("BMP/PNG/JPEG payloads yield REAL pixel features") {
    import spark.implicits._
    def px(x: Int, y: Int): (Int, Int, Int) = (40 + x, 50 + y, 60 + x + y)
    val rows = Seq(
      (1L, PixelCodec.encodeBmp(4, 3, px)),
      (2L, PixelCodec.encodePng(4, 3, px)),
      (3L, "not an image".getBytes("UTF-8")),
      (4L, JpegCodec.encodeJpeg(8, 8, (_, _) => (90, 90, 90), gray = true)))
    val out = Multimodal.extractFeatures(rows.toDF("doc_id", "content"))
      .orderBy("doc_id").collect()
    // hand-computed sums over the 4x3 grid: sum(x)=3*(0+1+2+3)=18, sum(y)=4*(0+1+2)=12
    val n = 12L
    val (sr, sg, sb) = (40 * n + 18, 50 * n + 12, 60 * n + 18 + 12)
    for (i <- 0 to 1) {
      val r = out(i)
      assert(r.getString(3) == (if (i == 0) "bmp" else "png"))
      assert(r.getInt(4) == 4 && r.getInt(5) == 3)
      assert(r.getLong(6) == sr && r.getLong(7) == sg && r.getLong(8) == sb)
      assert(math.abs(r.getDouble(9) - sr.toDouble / n) < 1e-12)
      assert(r.getSeq[Long](12).sum == n) // luma hist covers every pixel
      assert(r.getSeq[Double](13).length == 3 + Multimodal.LumaBins)
    }
    assert(out(2).getString(3) == "stub" && out(2).isNullAt(6))
    // constant 8×8 grayscale JPEG is DC-only → exact sums (64·90 per channel)
    assert(out(3).getString(3) == "jpeg")
    assert(out(3).getInt(4) == 8 && out(3).getInt(5) == 8)
    assert(out(3).getLong(6) == 64L * 90 && out(3).getLong(7) == 64L * 90 &&
      out(3).getLong(8) == 64L * 90)
  }

  test("NULL content is data, not an error (stub path, zero bytes)") {
    import spark.implicits._
    val rows = Seq((1L, Some("real".getBytes("UTF-8"))), (2L, None))
      .toDF("doc_id", "content")
    val out = Multimodal.extractFeatures(rows).orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(1).getString(3) == "stub")
    assert(out(1).getLong(1) == 0L) // n_bytes
    assert(out(1).getLong(2) == 0L) // no frames from no bytes
  }

  test("audio: WAV payloads yield REAL PCM features, others take the stub") {
    import spark.implicits._
    val samples = Array.tabulate(40)(i => 100 - 3 * i) // mono ramp
    val rows = Seq(
      (1L, Some(AudioCodec.encodeWav(8000, 1, samples))),
      (2L, Some("ID3 compressed audio".getBytes("UTF-8"))),
      (3L, None))
    val out = Multimodal.extractAudioFeatures(rows.toDF("doc_id", "content"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(2) == "pcm16")
    assert(out(0).getLong(3) == 8000L && out(0).getLong(4) == 1L)
    assert(out(0).getLong(5) == 40L && out(0).getLong(6) == 5000L) // 40/8000 s
    assert(out(0).getLong(8) == samples.map(_.toLong).sum)
    assert(out(0).isNullAt(9)) // mono: no ch1
    assert(out(0).getLong(10) == samples.map(s => s.toLong * s).sum)
    assert(out(1).getString(2) == "stub" && out(1).isNullAt(3))
    assert(out(2).getString(2) == "stub" && out(2).getLong(1) == 0L)
  }

  test("video: AVI payloads emit one row per SAMPLED frame, others a stub row") {
    import spark.implicits._
    def px(f: Int, x: Int, y: Int): (Int, Int, Int) = (10 + 9 * f, 20, 30)
    val rows = Seq(
      (1L, Some(VideoCodec.encodeAvi(4, 3, 5, px))),
      (2L, Some("MOOV compressed".getBytes("UTF-8"))),
      (3L, None))
    val out = Multimodal.sampleVideoFrames(rows.toDF("doc_id", "content"),
      stride = 2).orderBy("doc_id", "frame_idx").collect()
    assert(out.length == 5) // frames 0,2,4 + two stub rows
    val frames = out.filter(_.getString(1) == "dib")
    assert(frames.map(_.getLong(3)).sameElements(Array(0L, 2L, 4L)))
    assert(frames.forall(_.getLong(2) == 5L)) // total_frames
    // constant frame f: sum_r = 12·(10+9f) exactly
    for ((r, f) <- frames.zip(Seq(0, 2, 4)))
      assert(r.getLong(6) == 12L * (10 + 9 * f) && r.getLong(7) == 12L * 20)
    assert(out.filter(_.getString(1) == "stub").forall(_.isNullAt(3)))
  }

  test("resize: exact 2x box downscale, output is a real decodable PNG") {
    import spark.implicits._
    def px(x: Int, y: Int): (Int, Int, Int) = (40 + 4 * x, 60 + 8 * y, 100)
    val rows = Seq(
      (1L, Some(PixelCodec.encodeBmp(6, 4, px))),
      (2L, Some("not an image".getBytes("UTF-8"))),
      (3L, None))
    val out = Multimodal.resizeImages(rows.toDF("doc_id", "content"))
      .orderBy("doc_id").collect()
    val r0 = out(0)
    assert(r0.getString(1) == "bmp")
    assert(r0.getLong(2) == 6 && r0.getLong(3) == 4) // in dims
    assert(r0.getLong(4) == 3 && r0.getLong(5) == 2) // out dims
    // resized pixel (i,j) = (42+8i, 64+16j, 100): slopes double, offsets
    // are the truncating means of the in-block deltas (4/2, 8/2... here
    // r offset = (0+4+0+4)/4 = 2, g offset = (0+0+8+8)/4 = 4)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (j <- 0 until 2; i <- 0 until 3) {
      sr += 42 + 8 * i; sg += 64 + 16 * j; sb += 100
    }
    assert(r0.getLong(6) == sr && r0.getLong(7) == sg && r0.getLong(8) == sb)
    // the content column is a REAL PNG: decode it and re-derive the sums
    val png = r0.getAs[Array[Byte]](9)
    val re = PixelCodec.decode(png)
    assert(re.isDefined, "resized output is not a decodable PNG")
    val f = PixelCodec.features(re.get)
    assert(f.sumR == sr && f.sumG == sg && f.sumB == sb)
    assert(out(1).getString(1) == "stub" && out(1).isNullAt(9))
    assert(out(2).getString(1) == "stub")
  }

  test("decode pipeline introduces no shuffle") {
    val plan = Multimodal.extractFeatures(media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    val audioPlan = Multimodal.extractAudioFeatures(media)
      .queryExecution.executedPlan.toString
    assert(!audioPlan.contains("Exchange"), s"unexpected shuffle in:\n$audioPlan")
    val videoPlan = Multimodal.sampleVideoFrames(media)
      .queryExecution.executedPlan.toString
    assert(!videoPlan.contains("Exchange"), s"unexpected shuffle in:\n$videoPlan")
  }

  test("lossy-VP8 rows carry the machine-visible unverified-probs label") {
    import spark.implicits._
    // the Vp8Codec HONESTY NOTE caveat must be visible in the decoder
    // column, not just a source comment: lossless WebP keeps "webp",
    // lossy VP8 gets the distinct label a consumer can filter on
    def px(x: Int, y: Int): (Int, Int, Int) = (40 + x, 50 + y, 60)
    val rows = Seq(
      (1L, Vp8Codec.encodeWebpLossyGray(16, 16,
        (bx, by) => 40 + 7 * bx + 11 * by)),
      (2L, WebpCodec.encodeWebpLossless(4, 4, px)))
    val feats = Multimodal.extractFeatures(rows.toDF("doc_id", "content"))
      .orderBy("doc_id").collect()
    assert(feats(0).getString(3) == "webp-vp8-unverified-probs")
    assert(feats(1).getString(3) == "webp")
    val resized = Multimodal.resizeImages(rows.toDF("doc_id", "content"))
      .orderBy("doc_id").collect()
    assert(resized(0).getString(1) == "webp-vp8-unverified-probs")
    assert(resized(1).getString(1) == "webp")
  }

  test("frame sampling honors the stride") {
    val bytes = Array.fill[Byte](640)(1) // 10 chunks of 64
    assert(Multimodal.StubCodec.sampleFrames(bytes, 2).size == 5)
    assert(Multimodal.StubCodec.sampleFrames(bytes, 1).size == 10)
    assert(Multimodal.StubCodec.sampleFrames(Array[Byte](1, 2), 2).size == 1)
  }
}
