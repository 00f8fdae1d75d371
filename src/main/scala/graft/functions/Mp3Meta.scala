package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** mp3_meta(content binary) → struct<version, layer, sample_rate_hz,
  * channels, bitrate_kbps, frames, duration_ms, vbr> — REAL container
  * metadata for MPEG audio whose SAMPLE synthesis stays honestly
  * stubbed (the polyphase filterbank + Huffman spectrum decode is codec
  * machinery out of scope; see [[graft.operators.AudioCodec]]). This is
  * the mp4_meta treatment for MP3: at 100 TB, duration / bitrate /
  * sample-rate / mono-vs-stereo are what an audio-curation pipeline
  * filters on BEFORE paying any decode.
  *
  * Pure byte arithmetic over the public frame-header layout (ISO/IEC
  * 11172-3 §2.4.1.3 and the 13818-3 extension):
  *
  *  - optional ID3v2 prefix skipped via its synchsafe size;
  *  - 4-byte headers: 11 sync bits, version (1 / 2 / 2.5), layer
  *    (I/II/III), bitrate + sample-rate table indices, padding bit,
  *    channel mode — the standard small constant tables;
  *  - frame length in bytes: layer I `(12·br/sr + pad)·4`; layer II
  *    `144·br/sr + pad`; layer III `144·br/sr + pad` for MPEG1 and
  *    `72·br/sr + pad` for MPEG2/2.5 — the walk advances exactly and
  *    counts frames, so duration is EXACT: `frames · samples_per_frame
  *    · 1000 / sample_rate`, never a bitrate estimate;
  *  - a Xing/Info tag in the first frame's side-info region is
  *    recognized (VBR awareness): `vbr` is true when the Xing tag is
  *    present or the walked bitrate indices differ; `bitrate_kbps` is
  *    the exact floor-average over walked frames.
  *
  * Anything that doesn't start (after ID3) with a valid frame header →
  * NULL, never an exception. The walk stops at the first invalid
  * header, so trailing junk/truncation yields the honestly-walked
  * prefix counts. Static-invoke codegen, per-row, zero shuffle.
  */
case class Mp3MetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Mp3Meta.schema
  override def prettyName: String = "mp3_meta"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Mp3Meta.parseRow(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Mp3Meta.parseRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp3Meta {

  val schema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("layer", IntegerType),
    StructField("sample_rate_hz", IntegerType),
    StructField("channels", IntegerType),
    StructField("bitrate_kbps", IntegerType),
    StructField("frames", LongType),
    StructField("duration_ms", LongType),
    StructField("vbr", BooleanType)))

  final case class Meta(version: String, layer: Int, sampleRate: Int,
      channels: Int, bitrateKbps: Int, frames: Long, durationMs: Long,
      vbr: Boolean)

  def parseRow(b: Array[Byte]): InternalRow = {
    val m = parse(b)
    if (m == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(m.version), m.layer, m.sampleRate,
        m.channels, m.bitrateKbps, m.frames, m.durationMs, m.vbr))
  }

  // bitrate tables, kbps (ISO 11172-3 Table B.1 / 13818-3); index 0 is
  // "free format" and 15 is forbidden — both refuse the frame
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L1 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
  private val BrV2L23 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)

  private val SrV1 = Array(44100, 48000, 32000)
  private val SrV2 = Array(22050, 24000, 16000)
  private val SrV25 = Array(11025, 12000, 8000)

  /** One parsed frame header: (frameBytes, samplesPerFrame, bitrateKbps,
    * sampleRate, channels, versionTag, layer), or null when the 4 bytes
    * at `i` are not a valid header. */
  private def header(b: Array[Byte], i: Int): Array[Int] = {
    if (i + 4 > b.length) return null
    if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xe0) != 0xe0) return null
    val verBits = (b(i + 1) >> 3) & 3 // 0=2.5, 1=reserved, 2=2, 3=1
    val layerBits = (b(i + 1) >> 1) & 3 // 1=III, 2=II, 3=I
    if (verBits == 1 || layerBits == 0) return null
    val brIdx = (b(i + 2) >> 4) & 15
    val srIdx = (b(i + 2) >> 2) & 3
    val pad = (b(i + 2) >> 1) & 1
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return null
    val mpeg1 = verBits == 3
    val layer = 4 - layerBits // 1, 2, 3
    val br = (if (mpeg1) layer match {
      case 1 => BrV1L1; case 2 => BrV1L2; case _ => BrV1L3
    } else if (layer == 1) BrV2L1 else BrV2L23)(brIdx)
    val sr = (verBits match {
      case 3 => SrV1; case 2 => SrV2; case _ => SrV25
    })(srIdx)
    val bytes = layer match {
      case 1 => (12 * br * 1000 / sr + pad) * 4
      case 2 => 144 * br * 1000 / sr + pad
      case _ => (if (mpeg1) 144 else 72) * br * 1000 / sr + pad
    }
    val spf = layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (mpeg1) 1152 else 576
    }
    val channels = if (((b(i + 3) >> 6) & 3) == 3) 1 else 2
    Array(bytes, spf, br, sr, channels, verBits, layer)
  }

  /** Metadata from the frame walk, or null for non-MP3 payloads. */
  def parse(b: Array[Byte]): Meta = {
    if (b == null || b.length < 4) return null
    var i = 0
    // ID3v2 prefix: "ID3" vv f + 4-byte synchsafe size
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val size = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      val skip = 10L + size
      if (skip >= b.length) return null
      i = skip.toInt
    }
    val first = header(b, i)
    if (first == null) return null
    val verBits = first(5)
    val layer = first(6)
    val sr = first(3)
    val spf = first(1)
    val channels = first(4)
    // Xing/Info tag: side info follows the 4-byte header — MPEG1:
    // 17 (mono) / 32 bytes; MPEG2/2.5: 9 / 17 (layer III; other layers
    // have no Xing convention but checking is harmless)
    val side =
      if (verBits == 3) (if (channels == 1) 17 else 32)
      else (if (channels == 1) 9 else 17)
    val xingOff = i + 4 + side
    val hasXing = xingOff + 4 <= b.length &&
      b(xingOff) == 'X' && b(xingOff + 1) == 'i' &&
      b(xingOff + 2) == 'n' && b(xingOff + 3) == 'g'

    var frames = 0L
    var brSum = 0L
    var brMin = Int.MaxValue
    var brMax = 0
    var pos = i
    var go = true
    while (go) {
      val h = header(b, pos)
      // frames must agree on version/layer/sample-rate — a "sync" inside
      // payload bytes that declares a different stream shape is noise
      if (h == null || h(5) != verBits || h(6) != layer || h(3) != sr ||
          h(0) <= 4) go = false
      else {
        frames += 1
        brSum += h(2)
        if (h(2) < brMin) brMin = h(2)
        if (h(2) > brMax) brMax = h(2)
        pos += h(0)
        if (pos >= b.length) go = false
        if (frames > 10000000) go = false // hostile length cap
      }
    }
    if (frames == 0) return null
    Meta(
      version = verBits match {
        case 3 => "1"; case 2 => "2"; case _ => "2.5"
      },
      layer = layer,
      sampleRate = sr,
      channels = channels,
      bitrateKbps = (brSum / frames).toInt,
      frames = frames,
      durationMs = frames * spf * 1000L / sr,
      vbr = hasXing || brMin != brMax)
  }

  // ------------------------------------------------- fixture encoder

  private def brIndex(table: Array[Int], kbps: Int): Int = {
    val i = table.indexOf(kbps)
    require(i > 0, s"bitrate $kbps not in table")
    i
  }

  /** Write a REAL MPEG audio elementary stream: valid frame headers
    * with zeroed payloads (metadata is real; samples are not — the
    * honest-stub contract). `bitrates` supplies the per-frame kbps
    * rotation (a single element = CBR); `xing` plants a Xing tag in the
    * first frame's side-info slot; `id3Size` prepends an ID3v2 shell. */
  def encode(version: String, layer: Int, sampleRate: Int,
      bitrates: Seq[Int], frames: Int, mono: Boolean = false,
      xing: Boolean = false, id3Size: Int = 0): Array[Byte] = {
    require(frames > 0 && bitrates.nonEmpty)
    val verBits = version match {
      case "1" => 3; case "2" => 2; case "2.5" => 0
      case _ => throw new IllegalArgumentException(version)
    }
    val mpeg1 = verBits == 3
    val srTable = verBits match {
      case 3 => SrV1; case 2 => SrV2; case _ => SrV25
    }
    val srIdx = srTable.indexOf(sampleRate)
    require(srIdx >= 0, s"sample rate $sampleRate invalid for MPEG $version")
    val brTable =
      if (mpeg1) layer match {
        case 1 => BrV1L1; case 2 => BrV1L2; case _ => BrV1L3
      } else if (layer == 1) BrV2L1 else BrV2L23
    val out = new java.io.ByteArrayOutputStream(4096)
    if (id3Size > 0) { // ID3v2.3 shell: header + zero padding
      out.write('I'); out.write('D'); out.write('3')
      out.write(3); out.write(0); out.write(0)
      out.write((id3Size >> 21) & 0x7f); out.write((id3Size >> 14) & 0x7f)
      out.write((id3Size >> 7) & 0x7f); out.write(id3Size & 0x7f)
      out.write(new Array[Byte](id3Size), 0, id3Size)
    }
    var f = 0
    while (f < frames) {
      val kbps = bitrates(f % bitrates.size)
      val brIdx = brIndex(brTable, kbps)
      val size = layer match {
        case 1 => (12 * kbps * 1000 / sampleRate + 0) * 4
        case 2 => 144 * kbps * 1000 / sampleRate
        case _ => (if (mpeg1) 144 else 72) * kbps * 1000 / sampleRate
      }
      val frame = new Array[Byte](size)
      frame(0) = 0xff.toByte
      frame(1) = (0xe0 | (verBits << 3) | ((4 - layer) << 1) | 1).toByte
      frame(2) = ((brIdx << 4) | (srIdx << 2)).toByte
      frame(3) = (if (mono) 0xc0 else 0x00).toByte
      if (xing && f == 0) {
        val side =
          if (mpeg1) (if (mono) 17 else 32)
          else (if (mono) 9 else 17)
        val o = 4 + side
        require(o + 12 <= size, "first frame too small for a Xing tag")
        frame(o) = 'X'; frame(o + 1) = 'i'; frame(o + 2) = 'n'; frame(o + 3) = 'g'
        frame(o + 7) = 1 // flags: frames field present
        frame(o + 8) = ((frames >> 24) & 0xff).toByte
        frame(o + 9) = ((frames >> 16) & 0xff).toByte
        frame(o + 10) = ((frames >> 8) & 0xff).toByte
        frame(o + 11) = (frames & 0xff).toByte
      }
      out.write(frame, 0, size)
      f += 1
    }
    out.toByteArray
  }
}
