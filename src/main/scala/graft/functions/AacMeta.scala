package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** aac_meta(content binary) → struct<version, profile, sample_rate_hz,
  * channels, frames, duration_ms, bitrate_kbps> — REAL container
  * metadata for ADTS AAC streams (the raw-AAC framing crawls carry)
  * whose sample synthesis stays honestly stubbed, exactly the
  * [[Mp3Meta]] / [[Mp4Meta]] treatment: at 100 TB an audio-curation
  * pipeline filters on duration / rate / channel count BEFORE paying
  * any decode.
  *
  * Pure byte arithmetic over the public ADTS header layout (ISO/IEC
  * 13818-7 §6.2, carried forward into 14496-3):
  *
  *  - 12 sync bits (FFF), 1 MPEG-version bit (0 = MPEG-4, 1 = MPEG-2),
  *    2 layer bits (must be 00), protection_absent;
  *  - 2 profile bits (Main / LC / SSR / LTP), 4-bit sampling-frequency
  *    index (the 13-entry public table), 3-bit channel configuration;
  *  - 13-bit aac_frame_length (INCLUDING the 7- or 9-byte header — the
  *    walk advances exactly, so frame count and duration are exact);
  *  - 2-bit number_of_raw_data_blocks_in_frame: each frame carries
  *    (n+1) × 1024 samples;
  *  - protection_absent = 0 → a 16-bit CRC extends the header to
  *    9 bytes (inside frame_length; the walk is agnostic, fixtures
  *    exercise both spellings).
  *
  * Frames must agree on version/profile/rate/channels — a false sync
  * inside payload bytes that declares a different stream shape ends
  * the walk, so duration covers the honestly-walked prefix. Anything
  * not starting with a valid header → NULL, never an exception.
  * bitrate_kbps is the exact floor of walked-bits × rate / samples /
  * 1000 (ADTS is inherently VBR-capable; this is the true average).
  * Static-invoke codegen, per-row, zero shuffle.
  */
case class AacMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = AacMeta.schema
  override def prettyName: String = "aac_meta"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    AacMeta.parseRow(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.AacMeta.parseRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AacMeta {

  val schema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("profile", StringType),
    StructField("sample_rate_hz", IntegerType),
    StructField("channels", IntegerType),
    StructField("frames", LongType),
    StructField("duration_ms", LongType),
    StructField("bitrate_kbps", IntegerType)))

  final case class Meta(version: String, profile: String, sampleRate: Int,
      channels: Int, frames: Long, durationMs: Long, bitrateKbps: Int)

  def parseRow(b: Array[Byte]): InternalRow = {
    val m = parse(b)
    if (m == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(m.version),
        UTF8String.fromString(m.profile), m.sampleRate, m.channels,
        m.frames, m.durationMs, m.bitrateKbps))
  }

  /** ISO 13818-7 Table 35 (sampling_frequency_index). */
  private val SampleRates = Array(
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350)

  private val Profiles = Array("Main", "LC", "SSR", "LTP")

  /** One parsed ADTS header at `i`: (frameBytes, samples, srIdx,
    * profile, channels, mpeg2Bit), or null when invalid. */
  private def header(b: Array[Byte], i: Int): Array[Int] = {
    if (i + 7 > b.length) return null
    if ((b(i) & 0xff) != 0xff || (b(i + 1) & 0xf0) != 0xf0) return null
    if ((b(i + 1) & 0x06) != 0) return null // layer must be 00
    val mpeg2 = (b(i + 1) >> 3) & 1
    val profile = (b(i + 2) >> 6) & 3
    val srIdx = (b(i + 2) >> 2) & 15
    if (srIdx >= SampleRates.length) return null
    val channels = (((b(i + 2) & 1) << 2) | ((b(i + 3) >> 6) & 3))
    if (channels == 0) return null // program-config channels: refuse
    val frameLen = (((b(i + 3) & 3) << 11) |
      ((b(i + 4) & 0xff) << 3) | ((b(i + 5) >> 5) & 7))
    val protAbsent = b(i + 1) & 1
    val headerLen = if (protAbsent == 1) 7 else 9
    if (frameLen < headerLen) return null
    val rdb = b(i + 6) & 3 // raw data blocks - 1
    Array(frameLen, (rdb + 1) * 1024, srIdx, profile, channels, mpeg2)
  }

  /** Metadata from the ADTS frame walk, or null for non-AAC payloads. */
  def parse(b: Array[Byte]): Meta = {
    if (b == null || b.length < 7) return null
    val first = header(b, 0)
    if (first == null) return null
    val srIdx = first(2); val profile = first(3)
    val channels = first(4); val mpeg2 = first(5)
    var frames = 0L
    var samples = 0L
    var bytes = 0L
    var pos = 0
    var go = true
    while (go) {
      val h = header(b, pos)
      // a frame counts only when it is FULLY present — a truncated
      // tail frame is not audio the stream actually carries
      if (h == null || h(2) != srIdx || h(3) != profile ||
          h(4) != channels || h(5) != mpeg2 ||
          pos + h(0) > b.length) go = false
      else {
        frames += 1
        samples += h(1)
        bytes += h(0)
        pos += h(0)
        if (pos >= b.length) go = false
        if (frames > 10000000) go = false // hostile length cap
      }
    }
    if (frames == 0) return null
    val sr = SampleRates(srIdx)
    Meta(
      version = if (mpeg2 == 1) "MPEG-2" else "MPEG-4",
      profile = Profiles(profile),
      sampleRate = sr,
      channels = channels,
      frames = frames,
      durationMs = samples * 1000L / sr,
      bitrateKbps = (bytes * 8L * sr / samples / 1000L).toInt)
  }

  // ------------------------------------------------- fixture encoder

  /** Write a REAL ADTS elementary stream: valid headers with zeroed
    * raw-data payloads (metadata real, samples honestly stubbed).
    * `frameSizes` rotates the per-frame payload byte counts (ADTS is
    * VBR by nature); `crc = true` writes protection_absent = 0 headers
    * with the 16-bit CRC slot; `mpeg2` flips the version bit. */
  def encode(profile: String, sampleRate: Int, channels: Int,
      frameSizes: Seq[Int], frames: Int, crc: Boolean = false,
      mpeg2: Boolean = false, rawDataBlocks: Int = 1): Array[Byte] = {
    require(frames > 0 && frameSizes.nonEmpty)
    require(rawDataBlocks >= 1 && rawDataBlocks <= 4)
    // multi-rdb CRC frames carry per-block CRCs (13818-7 §6.2.2) —
    // out of scope for a header-walk fixture; keep the spellings apart
    require(!(crc && rawDataBlocks > 1), "crc fixtures use single-rdb frames")
    val profIdx = Profiles.indexOf(profile)
    require(profIdx >= 0, s"unknown profile $profile")
    val srIdx = SampleRates.indexOf(sampleRate)
    require(srIdx >= 0, s"unknown sample rate $sampleRate")
    require(channels >= 1 && channels <= 7)
    val headerLen = if (crc) 9 else 7
    val out = new java.io.ByteArrayOutputStream(4096)
    var f = 0
    while (f < frames) {
      val payload = frameSizes(f % frameSizes.size)
      val frameLen = headerLen + payload
      require(frameLen < (1 << 13), s"frame too long: $frameLen")
      val h = new Array[Byte](frameLen)
      h(0) = 0xff.toByte
      h(1) = (0xf0 | ((if (mpeg2) 1 else 0) << 3) |
        (if (crc) 0 else 1)).toByte
      h(2) = ((profIdx << 6) | (srIdx << 2) | ((channels >> 2) & 1)).toByte
      h(3) = (((channels & 3) << 6) | ((frameLen >> 11) & 3)).toByte
      h(4) = ((frameLen >> 3) & 0xff).toByte
      h(5) = (((frameLen & 7) << 5) | 0x1f).toByte // buffer fullness hi
      h(6) = (0xfc | (rawDataBlocks - 1)).toByte // fullness lo + rdb
      out.write(h, 0, frameLen)
      f += 1
    }
    out.toByteArray
  }
}
