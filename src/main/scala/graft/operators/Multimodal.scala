package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video content is carried as an
  * opaque `binary` column plus typed metadata, and per-item decode /
  * feature-extraction / frame-sampling runs as `mapPartitions` over the
  * binary payloads — the Spark-side schema, batching, and partitioning are
  * real. Container METADATA extraction is real
  * ([[graft.functions.ImageMetaExpr]] parses PNG/JPEG/GIF/WebP/BMP/TIFF
  * headers, q66 oracle-checks it), and so is the DEEP decode for all six
  * container formats: [[PixelCodec]] reconstructs actual pixels from
  * 24bpp BMP, 8-bit PNG (full filter set, Inflater), GIF (LZW, palette,
  * interlace), baseline JPEG (from-scratch T.81 Huffman+IDCT —
  * [[JpegCodec]]), lossless WebP (from-scratch VP8L prefix codes +
  * transforms — [[WebpCodec]]), and baseline TIFF (round 18 — IFD walk,
  * PackBits + TIFF-LZW, predictor — [[TiffCodec]]), and the features — exact channel sums,
  * means, luma histogram — come from those pixels (q47 oracle-checks the
  * sums bit-for-bit; JPEG covers baseline, progressive, AND — since
  * round 16 — BOTH arithmetic-coded frame types, sequential SOF9 and
  * progressive SOF10 ([[QmCoder]]); lossy-VP8 WebP decodes since round
  * 18 — [[Vp8Codec]]; animated WebP composites through the video
  * surface since round 18 — [[VideoCodec]]). Payloads the from-scratch
  * decoders don't cover (modern video codecs, MP3/AAC) fall back to the
  * clearly-labeled deterministic [[StubCodec]], flagged per-row in the
  * `decoder` column; swap it for a real codec on a cluster that has one.
  *
  * Scale design: decode is embarrassingly parallel per partition — no
  * shuffle is introduced (verified by MultimodalSpec asserting the plan is
  * exchange-free), executors stream one item at a time (no
  * collect-to-driver, no per-partition materialization), and feature
  * vectors are fixed-width so downstream columnar ops stay narrow.
  */
object Multimodal {

  /** STUB decoder — deterministic stand-in for codec-bound payloads
    * (H.264/VP9 video, MP3/AAC audio; BMP/PNG/GIF/JPEG/WebP/TIFF decode
    * for real via [[PixelCodec]]). Derives
    * pseudo-features purely from byte length so tests and oracles stay
    * reproducible; rows that went through it carry `decoder = "stub"`.
    */
  object StubCodec {
    val FeatureDim = 4

    /** "Decode" → fixed-width feature vector (deterministic fake). */
    def features(bytes: Array[Byte]): Array[Double] = {
      val n = bytes.length.toLong
      Array.tabulate(FeatureDim)(j => ((n * (j + 1)) % 997L) / 997.0)
    }

    /** "Frame-sample" → every `stride`-th 64-byte chunk as a frame. */
    def sampleFrames(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] =
      bytes.grouped(64).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => chunk }
        .toSeq
  }

  /** Luma histogram bin count (BT.601 luma bucketed into equal ranges). */
  val LumaBins = 4

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    // "bmp"|"png"|"gif"|"jpeg"|"webp"|"tiff" = real decode; "stub" = fallback
    StructField("decoder", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true),
    StructField("mean_r", DoubleType, nullable = true),
    StructField("mean_g", DoubleType, nullable = true),
    StructField("mean_b", DoubleType, nullable = true),
    StructField("luma_hist", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Decode+featurize a (doc_id, content: binary) DataFrame partition-wise.
    * BMP/PNG/GIF/JPEG payloads yield REAL pixel features (exact channel sums,
    * means, luma histogram, plus a normalized feature vector); everything
    * else gets the labeled stub vector with null pixel columns. NULL
    * content is data, not an error (routine in a mixed crawl): such rows
    * take the stub path with zero bytes.
    */
  def extractFeatures(in: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content", frameStride: Int = 2): DataFrame = {
    val src = in.select(col(idCol).cast("long"), col(contentCol))
    implicit val enc = Encoders.row(featureSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes =
          if (r.isNullAt(1)) Array.emptyByteArray
          else r.getAs[Array[Byte]](1)
        val frames = StubCodec.sampleFrames(bytes, frameStride).size.toLong
        PixelCodec.decode(bytes) match {
          case Some(img) =>
            val f = PixelCodec.features(img, LumaBins)
            val n = img.width.toLong * img.height
            val fmt =
              if (bytes(0) == 'B') "bmp"
              else if (bytes(0) == 'G') "gif"
              else if ((bytes(0) & 0xff) == 0xff) "jpeg"
              // lossy VP8 decodes under self-consistent (not offline-
              // verified) probability tables — distinct label so
              // consumers can filter ([[Vp8Codec]] HONESTY NOTE)
              else if (bytes(0) == 'R')
                (if (WebpCodec.isLossyVp8Still(bytes))
                   "webp-vp8-unverified-probs"
                 else "webp")
              else if (bytes(0) == 'I' || bytes(0) == 'M') "tiff"
              else if (bytes(0) == 'P') "pnm"
              else "png"
            val vec = Array(
              f.sumR.toDouble / n / 255.0,
              f.sumG.toDouble / n / 255.0,
              f.sumB.toDouble / n / 255.0) ++
              f.lumaHist.map(_.toDouble / n)
            Row(id, bytes.length.toLong, frames, fmt,
              img.width, img.height, f.sumR, f.sumG, f.sumB,
              f.sumR.toDouble / n, f.sumG.toDouble / n, f.sumB.toDouble / n,
              f.lumaHist.toSeq, vec)
          case None =>
            Row(id, bytes.length.toLong, frames, "stub",
              null, null, null, null, null, null, null, null, null,
              StubCodec.features(bytes))
        }
      }
    }
  }

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    // "pcm8".."pcm32"|"pcmf32"|"pcmf64"|"ulaw"|"alaw"|"adpcm"|"msadpcm"
    // |"flac" = real decode; "stub" = fallback
    StructField("decoder", StringType, nullable = false),
    StructField("sample_rate", LongType, nullable = true),
    StructField("channels", LongType, nullable = true),
    StructField("n_frames", LongType, nullable = true),
    StructField("duration_us", LongType, nullable = true),
    StructField("peak_abs", LongType, nullable = true),
    StructField("sum_ch0", LongType, nullable = true),
    StructField("sum_ch1", LongType, nullable = true),
    StructField("sumsq_ch0", LongType, nullable = true),
    StructField("sumsq_ch1", LongType, nullable = true)))

  /** Decode+featurize a (doc_id, content: binary) DataFrame of AUDIO
    * payloads partition-wise, mirroring [[extractFeatures]] for images:
    * RIFF/WAVE integer PCM decodes for real ([[AudioCodec]] — exact
    * per-channel sums / sums-of-squares, peak, duration), everything
    * else (compressed codecs, corrupt bytes, NULL content) takes the
    * labeled stub path with NULL audio columns. Exchange-free: decode
    * is per-row inside mapPartitions, payloads never leave the executor,
    * and the output is fixed-width so downstream columnar ops stay
    * narrow. Channels beyond the first two report through ch0/ch1 only
    * (sum columns are a fixed-width projection; the full per-channel
    * vector is available from [[AudioCodec.features]] where needed). */
  def extractAudioFeatures(in: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    val src = in.select(col(idCol).cast("long"), col(contentCol))
    implicit val enc = Encoders.row(audioFeatureSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes =
          if (r.isNullAt(1)) Array.emptyByteArray
          else r.getAs[Array[Byte]](1)
        AudioCodec.decode(bytes) match {
          case Some(clip) =>
            val f = AudioCodec.features(clip)
            val frames = clip.frames.toLong
            Row(id, bytes.length.toLong,
              clip.encoding match {
                case "float" => s"pcmf${clip.bitsPerSample}"
                case "ulaw" | "alaw" | "adpcm" | "msadpcm" | "flac" =>
                  clip.encoding
                case _ => s"pcm${clip.bitsPerSample}"
              },
              clip.sampleRate.toLong, clip.channels.toLong, frames,
              frames * 1000000L / clip.sampleRate, f.peakAbs.toLong,
              f.sumByChannel(0),
              if (clip.channels > 1) f.sumByChannel(1) else null,
              f.sumSqByChannel(0),
              if (clip.channels > 1) f.sumSqByChannel(1) else null)
          case None =>
            Row(id, bytes.length.toLong, "stub",
              null, null, null, null, null, null, null, null, null)
        }
      }
    }
  }

  val resizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    // any real-decode format label, or "stub" for undecodable payloads
    StructField("decoder", StringType, nullable = false),
    StructField("in_width", LongType, nullable = true),
    StructField("in_height", LongType, nullable = true),
    StructField("out_width", LongType, nullable = true),
    StructField("out_height", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true),
    // the resized image itself, re-encoded as a real PNG
    StructField("content", BinaryType, nullable = true)))

  /** Decode → exact 2× box downscale → re-encode (real PNG bytes) a
    * (doc_id, content: binary) DataFrame partition-wise: the "resize"
    * verb of the multimodal contract. Any format [[PixelCodec]] decodes
    * (BMP/PNG/GIF/JPEG/VP8L) resizes; the output carries the resized
    * PNG plus exact channel sums of the RESIZED pixels, so a
    * closed-form oracle can pin the whole decode→resample→rounding
    * chain. Undecodable payloads emit a labeled stub row with NULL
    * geometry/content. Exchange-free like the other media operators;
    * output payloads are ~4× smaller than inputs, so a resize stage
    * SHRINKS the bytes a downstream shuffle would move. */
  def resizeImages(in: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    val src = in.select(col(idCol).cast("long"), col(contentCol))
    implicit val enc = Encoders.row(resizeSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes =
          if (r.isNullAt(1)) Array.emptyByteArray
          else r.getAs[Array[Byte]](1)
        PixelCodec.decode(bytes) match {
          case Some(img) =>
            val small = PixelCodec.resizeBox2(img)
            val f = PixelCodec.features(small, LumaBins)
            val fmt =
              if (bytes(0) == 'B') "bmp"
              else if (bytes(0) == 'G') "gif"
              else if ((bytes(0) & 0xff) == 0xff) "jpeg"
              // lossy VP8 decodes under self-consistent (not offline-
              // verified) probability tables — distinct label so
              // consumers can filter ([[Vp8Codec]] HONESTY NOTE)
              else if (bytes(0) == 'R')
                (if (WebpCodec.isLossyVp8Still(bytes))
                   "webp-vp8-unverified-probs"
                 else "webp")
              else if (bytes(0) == 'I' || bytes(0) == 'M') "tiff"
              else if (bytes(0) == 'P') "pnm"
              else "png"
            val png = PixelCodec.encodePng(small.width, small.height,
              (x, y) => {
                val o = (y * small.width + x) * 3
                (small.rgb(o) & 0xff, small.rgb(o + 1) & 0xff,
                  small.rgb(o + 2) & 0xff)
              })
            Row(id, fmt, img.width.toLong, img.height.toLong,
              small.width.toLong, small.height.toLong,
              f.sumR, f.sumG, f.sumB, png)
          case None =>
            Row(id, "stub", null, null, null, null, null, null, null, null)
        }
      }
    }
  }

  val videoFrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    // "dib"/"mjpg"/"mrle" (AVI) | "gif" | "webp" (animated) = real
    // decode; "stub" = fallback
    StructField("decoder", StringType, nullable = false),
    StructField("total_frames", LongType, nullable = true),
    StructField("frame_idx", LongType, nullable = true),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("sum_r", LongType, nullable = true),
    StructField("sum_g", LongType, nullable = true),
    StructField("sum_b", LongType, nullable = true)))

  /** Frame-sample a (doc_id, content: binary) DataFrame of VIDEO
    * payloads partition-wise: AVI containers with uncompressed 24bpp
    * DIB frames, AVI containers with MOTION-JPEG frames (round 16 —
    * each chunk a complete JPEG through the in-repo T.81 codec, only
    * sampled key frames pay decode work), AND animated GIFs — both the
    * full-canvas fast tier and full GIF89a COMPOSITING (partial
    * frames, transparency, disposal methods) — decode for real
    * ([[VideoCodec]]), emitting one row per SAMPLED frame (indices 0,
    * stride, 2·stride, …) with exact channel sums off the actual
    * pixels; other codecs / corrupt bytes / NULL content emit a single
    * labeled stub row. Exchange-free and
    * allocation-bounded: only every `stride`-th frame is materialized,
    * one clip at a time per executor thread — the "sample k frames,
    * featurize, never hold the whole clip" shape a 100 TB video corpus
    * requires. */
  def sampleVideoFrames(in: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content", stride: Int = 2): DataFrame = {
    val src = in.select(col(idCol).cast("long"), col(contentCol))
    implicit val enc = Encoders.row(videoFrameSchema)
    src.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes =
          if (r.isNullAt(1)) Array.emptyByteArray
          else r.getAs[Array[Byte]](1)
        VideoCodec.decodeSampled(bytes, stride) match {
          case Some(clip) =>
            clip.sampledIdx.iterator.zip(clip.frames.iterator).map {
              case (idx, frame) =>
                val f = PixelCodec.features(frame, LumaBins)
                Row(id, clip.container, clip.totalFrames.toLong, idx.toLong,
                  frame.width.toLong, frame.height.toLong,
                  f.sumR, f.sumG, f.sumB)
            }
          case None =>
            Iterator.single(Row(id, "stub", null, null, null, null,
              null, null, null))
        }
      }
    }
  }
}
