package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** mkv_meta(content binary) → struct<doctype, duration_ms, title,
  * tracks, video_codec, width, height, audio_codec, sample_rate_hz,
  * channels> — REAL container metadata for Matroska/WebM files, the
  * [[Mp4Meta]] treatment for the EBML container family: at 100 TB a
  * video-curation pipeline filters on geometry / duration / codec id
  * BEFORE paying any decode (frame payloads stay honestly stubbed —
  * see [[graft.operators.VideoCodec]] for the codec-bound boundary).
  *
  * A real EBML walk (RFC 8794 + the public Matroska element registry),
  * not a sniff:
  *
  *  - VINT ids (marker bit kept) and sizes (marker stripped); the
  *    all-ones UNKNOWN size is honored for Segment — the live-muxed
  *    spelling — by extending to EOF;
  *  - EBML header → DocType ("matroska" / "webm"; anything else →
  *    NULL);
  *  - Segment → Info: TimestampScale (default 1,000,000 ns),
  *    Duration (4- or 8-byte IEEE float, in scale units), Title;
  *  - Segment → Tracks → TrackEntry: TrackType, CodecID, Video
  *    {PixelWidth, PixelHeight}, Audio {SamplingFrequency (float),
  *    Channels (default 1)} — first video and first audio track win;
  *  - Cluster payloads are SKIPPED by size, never entered — the walk
  *    cost is O(header), independent of media size.
  *
  * Malformed ids/sizes/overruns end the walk with what was honestly
  * parsed; a payload that never yields a DocType → NULL, never an
  * exception. Static-invoke codegen, per-row, zero shuffle.
  */
case class MkvMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MkvMeta.schema
  override def prettyName: String = "mkv_meta"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    MkvMeta.parseRow(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MkvMeta.parseRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MkvMeta {

  val schema: StructType = StructType(Seq(
    StructField("doctype", StringType),
    StructField("duration_ms", LongType),
    StructField("title", StringType),
    StructField("tracks", IntegerType),
    StructField("video_codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("audio_codec", StringType),
    StructField("sample_rate_hz", IntegerType),
    StructField("channels", IntegerType)))

  final case class Meta(doctype: String, durationMs: Long, title: String,
      tracks: Int, videoCodec: String, width: Int, height: Int,
      audioCodec: String, sampleRate: Int, channels: Int)

  def parseRow(b: Array[Byte]): InternalRow = {
    val m = parse(b)
    if (m == null) null
    else {
      def s(v: String) = if (v == null) null else UTF8String.fromString(v)
      def i(v: Int): Any = if (v <= 0) null else v
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](s(m.doctype),
          if (m.durationMs < 0) null else m.durationMs,
          s(m.title), m.tracks, s(m.videoCodec), i(m.width), i(m.height),
          s(m.audioCodec), i(m.sampleRate), i(m.channels)))
    }
  }

  // element ids (Matroska registry; VINT marker bit included)
  private val IdEbml = 0x1a45dfa3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549a966L
  private val IdTimestampScale = 0x2ad7b1L
  private val IdDuration = 0x4489L
  private val IdTitle = 0x7ba9L
  private val IdTracks = 0x1654ae6bL
  private val IdTrackEntry = 0xaeL
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xe0L
  private val IdPixelWidth = 0xb0L
  private val IdPixelHeight = 0xbaL
  private val IdAudio = 0xe1L
  private val IdSamplingFreq = 0xb5L
  private val IdChannels = 0x9fL

  /** VINT at `pos`: (value, bytesUsed, allOnes) or null on overrun.
    * `keepMarker` distinguishes element ids from sizes. */
  private def vint(b: Array[Byte], pos: Int,
      keepMarker: Boolean): (Long, Int, Boolean) = {
    if (pos >= b.length) return null
    val first = b(pos) & 0xff
    if (first == 0) return null
    var len = 1
    var mask = 0x80
    while ((first & mask) == 0) { len += 1; mask >>= 1 }
    if (len > 8 || pos.toLong + len > b.length) return null
    var v = (if (keepMarker) first else first & (mask - 1)).toLong
    var ones = !keepMarker && (first & (mask - 1)) == mask - 1
    var i = 1
    while (i < len) {
      val byte = b(pos + i) & 0xff
      if (byte != 0xff) ones = false
      v = (v << 8) | byte
      i += 1
    }
    (v, len, ones)
  }

  private def uintAt(b: Array[Byte], pos: Int, len: Int): Long = {
    var v = 0L
    var i = 0
    while (i < len && i < 8) { v = (v << 8) | (b(pos + i) & 0xff); i += 1 }
    v
  }

  private def floatAt(b: Array[Byte], pos: Int, len: Int): Double =
    if (len == 4) java.lang.Float.intBitsToFloat(uintAt(b, pos, 4).toInt).toDouble
    else if (len == 8) java.lang.Double.longBitsToDouble(uintAt(b, pos, 8))
    else -1.0

  private def strAt(b: Array[Byte], pos: Int, len: Int): String =
    new String(b, pos, len, java.nio.charset.StandardCharsets.UTF_8)

  /** Metadata from the EBML walk, or null for non-Matroska payloads. */
  def parse(b: Array[Byte]): Meta = {
    if (b == null || b.length < 8) return null
    var doctype: String = null
    var scale = 1000000L // ns per timestamp unit (spec default)
    var durationUnits = -1.0
    var title: String = null
    var tracks = 0
    var videoCodec: String = null
    var width = 0
    var height = 0
    var audioCodec: String = null
    var sampleRate = 0
    var channels = 0

    // walk children of [from, to); `handler` returns true to DESCEND
    def walk(from: Int, to: Int, depth: Int)(
        handler: (Long, Int, Int) => Boolean): Unit = {
      if (depth > 8) return
      var pos = from
      var steps = 0
      while (pos < to && steps < 100000) {
        steps += 1
        val id = vint(b, pos, keepMarker = true)
        if (id == null) return
        val size = vint(b, pos + id._2, keepMarker = false)
        if (size == null) return
        val dataStart = pos + id._2 + size._2
        if (dataStart > to) return
        // unknown size extends to the enclosing bound (the live-muxed
        // Segment spelling); a declared size past the bound CLAMPS —
        // truncated files keep their leading metadata, the demuxer way
        val dataEnd =
          if (size._3) to
          else math.min(dataStart.toLong + size._1, to.toLong).toInt
        if (handler(id._1, dataStart, dataEnd)) () // handler descended
        pos = dataEnd
      }
    }

    var inTrackType = 0
    var entryCodec: String = null

    walk(0, b.length, 0) { (id, s, e) =>
      if (id == IdEbml) {
        walk(s, e, 1) { (id2, s2, e2) =>
          if (id2 == IdDocType && doctype == null)
            doctype = strAt(b, s2, e2 - s2)
          false
        }
      } else if (id == IdSegment) {
        walk(s, e, 1) { (id2, s2, e2) =>
          if (id2 == IdInfo) {
            walk(s2, e2, 2) { (id3, s3, e3) =>
              if (id3 == IdTimestampScale) scale = uintAt(b, s3, e3 - s3)
              else if (id3 == IdDuration) durationUnits = floatAt(b, s3, e3 - s3)
              else if (id3 == IdTitle && title == null)
                title = strAt(b, s3, e3 - s3)
              false
            }
          } else if (id2 == IdTracks) {
            walk(s2, e2, 2) { (id3, s3, e3) =>
              if (id3 == IdTrackEntry) {
                tracks += 1
                inTrackType = 0
                entryCodec = null
                var w = 0; var h = 0; var sr = 0; var ch = 0
                walk(s3, e3, 3) { (id4, s4, e4) =>
                  if (id4 == IdTrackType) inTrackType = uintAt(b, s4, e4 - s4).toInt
                  else if (id4 == IdCodecId) entryCodec = strAt(b, s4, e4 - s4)
                  else if (id4 == IdVideo) {
                    walk(s4, e4, 4) { (id5, s5, e5) =>
                      if (id5 == IdPixelWidth) w = uintAt(b, s5, e5 - s5).toInt
                      else if (id5 == IdPixelHeight) h = uintAt(b, s5, e5 - s5).toInt
                      false
                    }
                  } else if (id4 == IdAudio) {
                    walk(s4, e4, 4) { (id5, s5, e5) =>
                      if (id5 == IdSamplingFreq)
                        sr = math.round(floatAt(b, s5, e5 - s5)).toInt
                      else if (id5 == IdChannels) ch = uintAt(b, s5, e5 - s5).toInt
                      false
                    }
                  }
                  false
                }
                if (inTrackType == 1 && videoCodec == null) {
                  videoCodec = entryCodec; width = w; height = h
                } else if (inTrackType == 2 && audioCodec == null) {
                  audioCodec = entryCodec; sampleRate = sr
                  channels = if (ch == 0) 1 else ch // spec default 1
                }
              }
              false
            }
          }
          // Clusters and everything else: skipped by size, never entered
          false
        }
      }
      false
    }

    if (doctype == null ||
        (doctype != "matroska" && doctype != "webm")) return null
    val durationMs =
      if (durationUnits < 0 || scale <= 0) -1L
      else math.round(durationUnits * scale / 1e6)
    Meta(doctype, durationMs, title, tracks, videoCodec, width, height,
      audioCodec, sampleRate, channels)
  }

  // ------------------------------------------------- fixture encoder

  private def vintSizeB(v: Long): Array[Byte] = {
    // shortest size VINT encoding (marker bit in the first byte)
    var len = 1
    while (len <= 8 && v >= (1L << (7 * len)) - 1) len += 1
    require(len <= 8, s"size too large: $v")
    val out = new Array[Byte](len)
    var i = len - 1
    var rest = v
    while (i >= 0) {
      out(i) = (rest & 0xff).toByte
      rest >>= 8
      i -= 1
    }
    out(0) = (out(0) | (0x80 >> (len - 1))).toByte
    out
  }

  private def idB(id: Long): Array[Byte] = {
    var len = 1
    while (len <= 4 && id >= (1L << (8 * len))) len += 1
    val out = new Array[Byte](len)
    var i = len - 1
    var rest = id
    while (i >= 0) { out(i) = (rest & 0xff).toByte; rest >>= 8; i -= 1 }
    out
  }

  private def el(id: Long, payload: Array[Byte]): Array[Byte] =
    idB(id) ++ vintSizeB(payload.length.toLong) ++ payload

  private def uintB(v: Long): Array[Byte] = {
    var len = 1
    while (len < 8 && v >= (1L << (8 * len))) len += 1
    val out = new Array[Byte](len)
    var i = len - 1
    var rest = v
    while (i >= 0) { out(i) = (rest & 0xff).toByte; rest >>= 8; i -= 1 }
    out
  }

  private def floatB(v: Double, wide: Boolean): Array[Byte] =
    if (wide) {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 to 7).map(i => ((bits >> (8 * (7 - i))) & 0xff).toByte).toArray
    } else {
      val bits = java.lang.Float.floatToIntBits(v.toFloat)
      (0 to 3).map(i => ((bits >> (8 * (3 - i))) & 0xff).toByte).toArray
    }

  /** Write a REAL Matroska/WebM header: EBML + Segment(Info, Tracks,
    * stub Clusters). `unknownSegmentSize` writes the live-muxed
    * all-ones Segment size; `wideFloats` spells Duration/
    * SamplingFrequency as 8-byte floats; `explicitScale` emits
    * TimestampScale even at the default. Cluster payloads are junk
    * bytes the walk must skip by size. */
  def encode(doctype: String, durationMs: Long, title: String = null,
      videoCodec: String = null, width: Int = 0, height: Int = 0,
      audioCodec: String = null, sampleRate: Int = 0, channels: Int = 2,
      unknownSegmentSize: Boolean = false, wideFloats: Boolean = false,
      explicitScale: Boolean = true, scaleNs: Long = 1000000L,
      clusters: Int = 2): Array[Byte] = {
    val header = el(IdEbml,
      el(0x4286L, uintB(1)) ++ // EBMLVersion
        el(0x42f7L, uintB(1)) ++ // EBMLReadVersion
        el(0x42f2L, uintB(4)) ++ // EBMLMaxIDLength
        el(0x42f3L, uintB(8)) ++ // EBMLMaxSizeLength
        el(IdDocType, doctype.getBytes("UTF-8")) ++
        el(0x4287L, uintB(4)) ++ // DocTypeVersion
        el(0x4285L, uintB(2))) // DocTypeReadVersion
    val info = el(IdInfo,
      (if (explicitScale) el(IdTimestampScale, uintB(scaleNs))
       else Array.emptyByteArray) ++
        el(IdDuration,
          floatB(durationMs * 1e6 / scaleNs, wideFloats)) ++
        (if (title == null) Array.emptyByteArray
         else el(IdTitle, title.getBytes("UTF-8"))))
    def trackEntry(tpe: Int, codec: String, extra: Array[Byte],
        num: Int): Array[Byte] =
      el(IdTrackEntry,
        el(0xd7L, uintB(num)) ++ // TrackNumber
          el(0x73c5L, uintB(num)) ++ // TrackUID
          el(IdTrackType, uintB(tpe)) ++
          el(IdCodecId, codec.getBytes("UTF-8")) ++ extra)
    val entries = new java.io.ByteArrayOutputStream(128)
    var trackNum = 1
    if (videoCodec != null) {
      entries.write(trackEntry(1, videoCodec,
        el(IdVideo, el(IdPixelWidth, uintB(width)) ++
          el(IdPixelHeight, uintB(height))), trackNum))
      trackNum += 1
    }
    if (audioCodec != null) {
      entries.write(trackEntry(2, audioCodec,
        el(IdAudio,
          el(IdSamplingFreq, floatB(sampleRate.toDouble, wideFloats)) ++
            (if (channels == 1) Array.emptyByteArray // spec default
             else el(IdChannels, uintB(channels)))), trackNum))
      trackNum += 1
    }
    val tracksEl = el(IdTracks, entries.toByteArray)
    val clusterBytes = new java.io.ByteArrayOutputStream(256)
    var c = 0
    while (c < clusters) {
      // Timestamp + a junk SimpleBlock the walk must never enter
      val junk = new Array[Byte](64 + 7 * c)
      java.util.Arrays.fill(junk, 0xa5.toByte)
      clusterBytes.write(el(0x1f43b675L,
        el(0xe7L, uintB(c * 1000L)) ++ el(0xa3L, junk)))
      c += 1
    }
    val segPayload = info ++ tracksEl ++ clusterBytes.toByteArray
    val segment =
      if (!unknownSegmentSize) el(IdSegment, segPayload)
      else idB(IdSegment) ++
        Array.fill(8)(0xff.toByte).updated(0, 0x01.toByte) ++ segPayload
    header ++ segment
  }
}
