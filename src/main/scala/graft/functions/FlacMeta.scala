package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** flac_meta(content binary) → struct<sample_rate_hz, channels,
  * bits_per_sample, total_samples, duration_ms, title, artist> —
  * metadata-block-only FLAC inspection: O(header) cost regardless of
  * audio size, the curation-side complement of the FULL sample decoder
  * in [[graft.operators.FlacCodec]] (which this deliberately does not
  * touch — filtering 100 TB on duration/tags must not pay rice
  * decoding).
  *
  * The public FLAC stream layout: `fLaC` magic, then metadata blocks
  * (1-byte last-flag+type, 24-bit big-endian length) — STREAMINFO
  * (type 0, must come first: rate 20 bits, channels-1 3, bits-1 5,
  * total samples 36) and VORBIS_COMMENT (type 4: the same vendor +
  * `KEY=value` structure Ogg codecs wrap, shared via
  * [[OggMeta.vorbisComments]]). Unknown block types skip by length;
  * type 127 is invalid per spec and refuses. total_samples 0 means
  * "unknown" → NULL duration (never a guess). Non-FLAC payloads →
  * NULL. Static-invoke codegen, per-row, zero shuffle.
  */
case class FlacMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = FlacMeta.schema
  override def prettyName: String = "flac_meta"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    FlacMeta.parseRow(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.FlacMeta.parseRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FlacMeta {

  val schema: StructType = StructType(Seq(
    StructField("sample_rate_hz", IntegerType),
    StructField("channels", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("total_samples", LongType),
    StructField("duration_ms", LongType),
    StructField("title", StringType),
    StructField("artist", StringType)))

  final case class Meta(sampleRate: Int, channels: Int, bits: Int,
      totalSamples: Long, durationMs: Long, title: String, artist: String)

  def parseRow(b: Array[Byte]): InternalRow = {
    val m = parse(b)
    if (m == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m.sampleRate, m.channels, m.bits,
        if (m.totalSamples == 0) null else m.totalSamples,
        if (m.durationMs < 0) null else m.durationMs,
        if (m.title == null) null else UTF8String.fromString(m.title),
        if (m.artist == null) null else UTF8String.fromString(m.artist)))
  }

  private def be24(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i + 2) & 0xff)

  /** Metadata from the block walk, or null for non-FLAC payloads. */
  def parse(b: Array[Byte]): Meta = {
    if (b == null || b.length < 42) return null
    if (!(b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C')) return null
    var i = 4
    var last = false
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var totalSamples = 0L
    var sawInfo = false
    var title: String = null
    var artist: String = null
    while (!last) {
      if (i + 4 > b.length) return null
      val hdr = b(i) & 0xff
      last = (hdr & 0x80) != 0
      val btype = hdr & 0x7f
      val len = be24(b, i + 1)
      if (i + 4 + len.toLong > b.length) return null
      if (btype == 0) { // STREAMINFO (must be first, exactly once)
        if (len < 34 || sawInfo || i != 4) return null
        val o = i + 4
        var packed = 0L
        var k = 0
        while (k < 8) { packed = (packed << 8) | (b(o + 10 + k) & 0xff); k += 1 }
        sampleRate = (packed >>> 44).toInt
        channels = ((packed >>> 41) & 7).toInt + 1
        bits = ((packed >>> 36) & 31).toInt + 1
        totalSamples = packed & ((1L << 36) - 1)
        sawInfo = true
      } else if (btype == 4) { // VORBIS_COMMENT
        val (t, a) = OggMeta.vorbisComments(
          java.util.Arrays.copyOfRange(b, i + 4, i + 4 + len), 0)
        if (title == null) title = t
        if (artist == null) artist = a
      } else if (btype == 127) return null // invalid per spec
      i += 4 + len
    }
    if (!sawInfo || sampleRate < 1 || channels < 1) return null
    Meta(sampleRate, channels, bits, totalSamples,
      if (totalSamples == 0) -1L else totalSamples * 1000L / sampleRate,
      title, artist)
  }

  // ------------------------------------------------- fixture helper

  /** Splice a VORBIS_COMMENT (and optional PADDING) block into a real
    * [[graft.operators.FlacCodec.encodeFlac]] stream: the STREAMINFO
    * last-flag clears, the new blocks follow it. The result stays a
    * fully decodable FLAC file — FlacCodec skips unknown block types. */
  def withComments(flac: Array[Byte], title: String, artist: String,
      padding: Int = 0, lastIsPadding: Boolean = false): Array[Byte] = {
    require(flac.length > 42 && flac(0) == 'f' && (flac(4) & 0x80) != 0,
      "expected a single-STREAMINFO FLAC stream")
    val siLen = be24(flac, 5)
    val headEnd = 8 + siLen
    val body = OggMeta.encodeComments(title, artist)
    val out = new java.io.ByteArrayOutputStream(flac.length + body.length + 16)
    out.write(flac, 0, headEnd)
    val withPad = padding > 0 || lastIsPadding
    // comment block header: last only when no padding follows
    out.write(if (withPad) 0x04 else 0x84)
    out.write((body.length >> 16) & 0xff)
    out.write((body.length >> 8) & 0xff)
    out.write(body.length & 0xff)
    out.write(body, 0, body.length)
    if (withPad) {
      val padLen = math.max(padding, 0)
      out.write(0x81) // PADDING, last
      out.write((padLen >> 16) & 0xff)
      out.write((padLen >> 8) & 0xff)
      out.write(padLen & 0xff)
      out.write(new Array[Byte](padLen), 0, padLen)
    }
    out.write(flac, headEnd, flac.length - headEnd)
    val result = out.toByteArray
    result(4) = (result(4) & 0x7f).toByte // STREAMINFO is no longer last
    result
  }
}
