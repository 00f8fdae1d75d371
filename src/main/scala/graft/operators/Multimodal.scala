package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video content is carried as an
  * opaque `binary` column plus typed metadata, and per-item decode /
  * feature-extraction / frame-sampling runs as `mapPartitions` over the
  * binary payloads — the Spark-side schema, batching, and partitioning are
  * real. Container METADATA extraction is real too:
  * [[graft.functions.ImageMetaExpr]] parses PNG/JPEG/GIF/WebP/BMP format
  * and pixel dimensions straight off the header bytes (no codec library —
  * q66 oracle-checks it). Only the DEEP decode (pixel data → feature
  * vector) is a clearly-marked deterministic STUB: this container has no
  * image/audio libraries; swap [[StubCodec]] for a real decoder on a
  * cluster that does.
  *
  * Scale design: decode is embarrassingly parallel per partition — no
  * shuffle is introduced (verified by MultimodalSpec asserting the plan is
  * exchange-free), executors stream one item at a time (no
  * collect-to-driver, no per-partition materialization), and feature
  * vectors are fixed-width so downstream columnar ops stay narrow.
  */
object Multimodal {

  /** STUB decoder — deterministic stand-in for an image/audio codec.
    * Derives pseudo-features purely from byte length and content so tests
    * and oracles are reproducible. A real deployment replaces exactly this
    * object (the mapPartitions plumbing above it is production-shaped).
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

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Decode+featurize a (doc_id, content: binary) DataFrame partition-wise. */
  def extractFeatures(in: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content", frameStride: Int = 2): DataFrame = {
    val src = in.select(col(idCol).cast("long"), col(contentCol))
    implicit val enc = Encoders.row(featureSchema)
    src.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val frames = StubCodec.sampleFrames(bytes, frameStride)
        Row(id, bytes.length.toLong, frames.size.toLong, StubCodec.features(bytes))
      }
    }
  }
}
