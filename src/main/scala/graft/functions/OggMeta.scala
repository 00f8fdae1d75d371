package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** ogg_meta(content binary) → struct<codec, sample_rate_hz, channels,
  * pages, duration_ms, title, artist> — REAL container metadata for
  * Ogg streams (RFC 3533 framing; Vorbis I and RFC 7845 Opus header
  * packets) whose sample synthesis stays honestly stubbed, completing
  * the [[Mp3Meta]] / [[AacMeta]] / [[Mp4Meta]] audio-metadata family.
  *
  * The walk is the real Ogg machinery, not a sniff:
  *
  *  - page framing: "OggS" capture pattern, version 0, the 27-byte
  *    header, lacing-value segment table; every page's CRC-32 is
  *    VERIFIED (the Ogg polynomial 0x04C11DB7, unreflected, zero init
  *    and xorout, CRC field zeroed during the sum) — a corrupt page
  *    ends the walk and the result covers the honestly-walked prefix;
  *  - logical stream: the FIRST beginning-of-stream page's serial
  *    number selects the stream (the common single-stream layout;
  *    multiplexed siblings are skipped, not mis-merged);
  *  - packet assembly: lacing values reassemble packets across page
  *    boundaries (a 255 run continues, the continued-packet flag is
  *    honored), capped at 16 MB against hostile laces;
  *  - packet 1 identifies the codec: `\x01vorbis` (version 0) or
  *    `OpusHead` (version 1) — channels, rate, and Opus pre-skip come
  *    from the public header layouts; anything else → NULL (Theora
  *    and friends are not audio metadata);
  *  - packet 2 is the comment header (`\x03vorbis` / `OpusTags`):
  *    vendor string skipped, TITLE= and ARTIST= extracted
  *    case-insensitively from the UTF-8 user comments;
  *  - duration: the last non-(-1) granule position of the stream —
  *    PCM samples for Vorbis (ms = granule·1000/rate), 48 kHz samples
  *    minus pre-skip for Opus (RFC 7845 §4.2).
  *
  * Non-Ogg payloads, bad CRCs on the first page, truncation before
  * the id packet → NULL, never an exception. Static-invoke codegen,
  * per-row, zero shuffle.
  */
case class OggMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = OggMeta.schema
  override def prettyName: String = "ogg_meta"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    OggMeta.parseRow(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.OggMeta.parseRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object OggMeta {

  val schema: StructType = StructType(Seq(
    StructField("codec", StringType),
    StructField("sample_rate_hz", IntegerType),
    StructField("channels", IntegerType),
    StructField("pages", LongType),
    StructField("duration_ms", LongType),
    StructField("title", StringType),
    StructField("artist", StringType)))

  final case class Meta(codec: String, sampleRate: Int, channels: Int,
      pages: Long, durationMs: Long, title: String, artist: String)

  def parseRow(b: Array[Byte]): InternalRow = {
    val m = parse(b)
    if (m == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(m.codec), m.sampleRate, m.channels,
        m.pages, m.durationMs,
        if (m.title == null) null else UTF8String.fromString(m.title),
        if (m.artist == null) null else UTF8String.fromString(m.artist)))
  }

  // Ogg CRC-32: polynomial 0x04C11DB7, unreflected, init 0, xorout 0
  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var r = i << 24
      var j = 0
      while (j < 8) {
        r = if ((r & 0x80000000) != 0) (r << 1) ^ 0x04c11db7 else r << 1
        j += 1
      }
      t(i) = r
      i += 1
    }
    t
  }

  /** Page CRC with the 4 CRC bytes (offset 22..25 from `off`) read as
    * zero — exactly how the spec defines the page checksum. */
  private[functions] def pageCrc(b: Array[Byte], off: Int, len: Int): Int = {
    var crc = 0
    var i = 0
    while (i < len) {
      val byte = if (i >= 22 && i < 26) 0 else b(off + i) & 0xff
      crc = (crc << 8) ^ CrcTable(((crc >>> 24) ^ byte) & 0xff)
      i += 1
    }
    crc
  }

  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private def le64(b: Array[Byte], i: Int): Long =
    (le32(b, i) & 0xffffffffL) | (le32(b, i + 4).toLong << 32)

  private val MaxPacket = 16 << 20

  /** The Vorbis-comment structure (shared verbatim by Vorbis, Opus,
    * and FLAC): vendor_len + vendor, count, then len-prefixed UTF-8
    * `KEY=value` entries. Returns (TITLE, ARTIST), either null. */
  private[functions] def vorbisComments(c: Array[Byte],
      tagOff: Int): (String, String) = {
    var title: String = null
    var artist: String = null
    if (tagOff + 4 <= c.length) {
      var p = tagOff
      val vendorLen = le32(c, p); p += 4
      if (vendorLen >= 0 && p.toLong + vendorLen + 4 <= c.length) {
        p += vendorLen
        val n = le32(c, p); p += 4
        var i = 0
        while (i < n && i < 1000 && p + 4 <= c.length) {
          val len = le32(c, p); p += 4
          if (len < 0 || p.toLong + len > c.length) { i = n }
          else {
            val s = new String(c, p, len,
              java.nio.charset.StandardCharsets.UTF_8)
            val eq = s.indexOf('=')
            if (eq > 0) {
              val key = s.substring(0, eq).toUpperCase(java.util.Locale.ROOT)
              if (key == "TITLE" && title == null) title = s.substring(eq + 1)
              else if (key == "ARTIST" && artist == null)
                artist = s.substring(eq + 1)
            }
            p += len
            i += 1
          }
        }
      }
    }
    (title, artist)
  }

  /** A raw Vorbis-comment body (no codec-specific prefix) — the block
    * FLAC embeds directly and Ogg codecs wrap. */
  private[functions] def encodeComments(title: String,
      artist: String): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(128)
    val vendor = "graft fixture".getBytes("UTF-8")
    o.write(le32b(vendor.length)); o.write(vendor)
    val tags = Seq(
      Option(title).map(t => s"TITLE=$t"),
      Option(artist).map(a => s"ARTIST=$a"),
      Some("ENCODER=graft")).flatten
    o.write(le32b(tags.size))
    tags.foreach { t =>
      val bs = t.getBytes("UTF-8")
      o.write(le32b(bs.length)); o.write(bs)
    }
    o.toByteArray
  }

  /** Metadata from the page walk, or null for non-Ogg payloads. */
  def parse(b: Array[Byte]): Meta = {
    if (b == null || b.length < 28) return null
    var pos = 0
    var serial = 0
    var haveSerial = false
    var pages = 0L
    var lastGranule = -1L
    // packet assembly for the selected stream (only until packet 2)
    val packets = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var current = new java.io.ByteArrayOutputStream(64)
    var walking = true
    while (walking && pos + 27 <= b.length && pages < 10000000) {
      if (!(b(pos) == 'O' && b(pos + 1) == 'g' && b(pos + 2) == 'g' &&
          b(pos + 3) == 'S') || b(pos + 4) != 0) walking = false
      else {
        val nSegs = b(pos + 26) & 0xff
        if (pos.toLong + 27 + nSegs > b.length) walking = false
        else {
          var payload = 0
          var s = 0
          while (s < nSegs) { payload += b(pos + 27 + s) & 0xff; s += 1 }
          val pageLen = 27 + nSegs + payload
          if (pos.toLong + pageLen > b.length) walking = false
          else if (pageCrc(b, pos, pageLen) != le32(b, pos + 22)) walking = false
          else {
            val hdrType = b(pos + 5) & 0xff
            val granule = le64(b, pos + 6)
            val pageSerial = le32(b, pos + 14)
            if (!haveSerial && (hdrType & 0x02) != 0) {
              serial = pageSerial; haveSerial = true
            }
            if (haveSerial && pageSerial == serial) {
              pages += 1
              if (granule != -1L) lastGranule = granule
              // reassemble packets until we hold the comment header
              if (packets.size < 2) {
                if ((hdrType & 0x01) == 0 && current.size() > 0) {
                  // a fresh page while mid-packet: stream is damaged
                  current = new java.io.ByteArrayOutputStream(64)
                }
                var dataOff = pos + 27 + nSegs
                var si = 0
                while (si < nSegs && packets.size < 2) {
                  val lace = b(pos + 27 + si) & 0xff
                  if (current.size() + lace > MaxPacket) return null
                  current.write(b, dataOff, lace)
                  dataOff += lace
                  if (lace < 255) {
                    packets += current.toByteArray
                    current = new java.io.ByteArrayOutputStream(64)
                  }
                  si += 1
                }
              }
            }
            pos += pageLen
          }
        }
      }
    }
    if (packets.isEmpty) return null
    val id = packets.head
    var codec: String = null
    var rate = 0
    var channels = 0
    var preSkip = 0
    if (id.length >= 30 && id(0) == 1 && id(1) == 'v' && id(2) == 'o' &&
        id(3) == 'r' && id(4) == 'b' && id(5) == 'i' && id(6) == 's' &&
        le32(id, 7) == 0) {
      codec = "vorbis"
      channels = id(11) & 0xff
      rate = le32(id, 12)
    } else if (id.length >= 19 && id(0) == 'O' && id(1) == 'p' &&
        id(2) == 'u' && id(3) == 's' && id(4) == 'H' && id(5) == 'e' &&
        id(6) == 'a' && id(7) == 'd' && (id(8) & 0xff) <= 15) {
      codec = "opus"
      channels = id(9) & 0xff
      preSkip = (id(10) & 0xff) | ((id(11) & 0xff) << 8)
      rate = le32(id, 12) // the INPUT rate; Opus granules tick at 48 kHz
    } else return null
    if (rate <= 0 || channels <= 0) return null

    // comment header: vendor string, then TITLE= / ARTIST= user tags
    var title: String = null
    var artist: String = null
    if (packets.size >= 2) {
      val c = packets(1)
      val tagOff =
        if (codec == "vorbis" && c.length >= 7 && c(0) == 3 &&
            c(1) == 'v') 7
        else if (codec == "opus" && c.length >= 8 && c(0) == 'O' &&
            c(4) == 'T' && c(5) == 'a' && c(6) == 'g' && c(7) == 's') 8
        else -1
      if (tagOff >= 0) {
        val (t, a) = vorbisComments(c, tagOff)
        title = t; artist = a
      }
    }
    val durationMs =
      if (lastGranule <= 0) 0L
      else if (codec == "opus") math.max(0L, lastGranule - preSkip) * 1000L / 48000L
      else lastGranule * 1000L / rate
    Meta(codec, rate, channels, pages, durationMs, title, artist)
  }

  // ------------------------------------------------- fixture encoder

  private def le32b(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le64b(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte,
    ((v >> 32) & 0xff).toByte, ((v >> 40) & 0xff).toByte,
    ((v >> 48) & 0xff).toByte, ((v >> 56) & 0xff).toByte)

  /** One page: packets may be marked as continuing beyond this page
    * (`openEnd`) or continuing INTO it (`continued`). Lacing is exact:
    * 255-runs plus the terminal value, including the required zero
    * lace for length ≡ 0 (mod 255). The CRC is computed for real. */
  private def page(serial: Int, seq: Int, granule: Long, hdrType: Int,
      segments: Seq[(Array[Byte], Boolean)]): Array[Byte] = {
    val laces = scala.collection.mutable.ArrayBuffer.empty[Int]
    segments.foreach { case (data, openEnd) =>
      var rest = data.length
      while (rest >= 255) { laces += 255; rest -= 255 }
      if (!openEnd) laces += rest
      else require(rest == 0, "open-ended segment must be a 255 multiple")
    }
    require(laces.size <= 255, "too many lacing values for one page")
    val payload = segments.map(_._1.length).sum
    val out = new Array[Byte](27 + laces.size + payload)
    out(0) = 'O'; out(1) = 'g'; out(2) = 'g'; out(3) = 'S'
    out(4) = 0
    out(5) = hdrType.toByte
    System.arraycopy(le64b(granule), 0, out, 6, 8)
    System.arraycopy(le32b(serial), 0, out, 14, 4)
    System.arraycopy(le32b(seq), 0, out, 18, 4)
    out(26) = laces.size.toByte
    var i = 0
    while (i < laces.size) { out(27 + i) = laces(i).toByte; i += 1 }
    var off = 27 + laces.size
    segments.foreach { case (data, _) =>
      System.arraycopy(data, 0, out, off, data.length); off += data.length
    }
    val crc = pageCrc(out, 0, out.length)
    System.arraycopy(le32b(crc), 0, out, 22, 4)
    out
  }

  /** Write a REAL Ogg stream: id + comment (+ Vorbis setup) header
    * pages, then `audioPages` zero-payload audio pages with advancing
    * granules (samples honestly stubbed), EOS on the last. `samples`
    * is the final granule (for Opus the encoder adds `preSkip`, the
    * RFC 7845 convention). `splitComment` pads the comment packet to
    * a 255-lace multiple and continues it onto a second page — the
    * continued-packet spelling. */
  def encode(codec: String, sampleRate: Int, channels: Int, samples: Long,
      title: String = null, artist: String = null, audioPages: Int = 3,
      preSkip: Int = 312, splitComment: Boolean = false,
      serial: Int = 0x67726166): Array[Byte] = {
    require(audioPages >= 1)
    val out = new java.io.ByteArrayOutputStream(4096)
    val idPacket: Array[Byte] = codec match {
      case "vorbis" =>
        val o = new java.io.ByteArrayOutputStream(30)
        o.write(1); o.write("vorbis".getBytes("US-ASCII"))
        o.write(le32b(0)) // version
        o.write(channels)
        o.write(le32b(sampleRate))
        o.write(le32b(0)); o.write(le32b(0)); o.write(le32b(0)) // bitrates
        o.write(0xb8) // blocksizes 2^8 / 2^11
        o.write(1) // framing
        o.toByteArray
      case "opus" =>
        val o = new java.io.ByteArrayOutputStream(19)
        o.write("OpusHead".getBytes("US-ASCII"))
        o.write(1) // version
        o.write(channels)
        o.write(preSkip & 0xff); o.write((preSkip >> 8) & 0xff)
        o.write(le32b(sampleRate))
        o.write(0); o.write(0) // output gain
        o.write(0) // channel mapping family
        o.toByteArray
      case other => throw new IllegalArgumentException(other)
    }
    val commentPacket: Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream(128)
      if (codec == "vorbis") { o.write(3); o.write("vorbis".getBytes("US-ASCII")) }
      else o.write("OpusTags".getBytes("US-ASCII"))
      val vendor = "graft fixture".getBytes("UTF-8")
      o.write(le32b(vendor.length)); o.write(vendor)
      val tags = Seq(
        Option(title).map(t => s"TITLE=$t"),
        Option(artist).map(a => s"ARTIST=$a"),
        Some("ENCODER=graft")).flatten
      o.write(le32b(tags.size))
      tags.foreach { t =>
        val bs = t.getBytes("UTF-8")
        o.write(le32b(bs.length)); o.write(bs)
      }
      if (codec == "vorbis") o.write(1) // framing bit
      var packet = o.toByteArray
      if (splitComment) {
        // pad ignorable tail (an extra comment would change the count;
        // instead extend the LAST tag's value with spaces) so the
        // packet length is a 255 multiple and must continue
        val pad = (255 - packet.length % 255) % 255
        if (pad > 0 || packet.length == 0) {
          // re-emit with the encoder padding folded into ENCODER tag
          val o2 = new java.io.ByteArrayOutputStream(packet.length + pad)
          if (codec == "vorbis") { o2.write(3); o2.write("vorbis".getBytes("US-ASCII")) }
          else o2.write("OpusTags".getBytes("US-ASCII"))
          o2.write(le32b(vendor.length)); o2.write(vendor)
          val padded = tags.init :+ (tags.last + (" " * pad))
          o2.write(le32b(padded.size))
          padded.foreach { t =>
            val bs = t.getBytes("UTF-8")
            o2.write(le32b(bs.length)); o2.write(bs)
          }
          if (codec == "vorbis") o2.write(1)
          packet = o2.toByteArray
          // padding the value shifts length by `pad` exactly (ASCII)
          require(packet.length % 255 == 0,
            s"split-comment padding failed: ${packet.length}")
        }
      }
      packet
    }
    var seq = 0
    // BOS page: the id packet alone (the spec's required layout)
    out.write(page(serial, seq, 0L, 0x02, Seq((idPacket, false)))); seq += 1
    if (splitComment) {
      // comment packet spans two pages: all-255 laces, then a closer
      out.write(page(serial, seq, -1L, 0x00, Seq((commentPacket, true))))
      seq += 1
      val closer: Seq[(Array[Byte], Boolean)] =
        if (codec == "vorbis")
          Seq((Array.emptyByteArray, false), ("setup-stub".getBytes, false))
        else Seq((Array.emptyByteArray, false))
      out.write(page(serial, seq, 0L, 0x01, closer)); seq += 1
    } else {
      val segs: Seq[(Array[Byte], Boolean)] =
        if (codec == "vorbis") Seq((commentPacket, false),
          ("setup-stub".getBytes, false))
        else Seq((commentPacket, false))
      out.write(page(serial, seq, 0L, 0x00, segs)); seq += 1
    }
    // audio pages: zeroed packets, granule advances to `samples`
    val granuleBase = if (codec == "opus") preSkip.toLong else 0L
    var pageIdx = 0
    while (pageIdx < audioPages) {
      val granule = granuleBase +
        samples * (pageIdx + 1) / audioPages
      val eos = pageIdx == audioPages - 1
      val packet = new Array[Byte](40 + pageIdx)
      out.write(page(serial, seq, granule, if (eos) 0x04 else 0x00,
        Seq((packet, false))))
      seq += 1
      pageIdx += 1
    }
    out.toByteArray
  }
}
