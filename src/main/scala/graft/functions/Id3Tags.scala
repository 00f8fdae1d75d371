package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** id3_tags(content binary) → struct<version, title, artist, album> —
  * the MP3 counterpart of [[OggMeta]]'s comment tags: the metadata an
  * audio-curation pipeline joins on without touching a single sample.
  *
  * Pure byte arithmetic over the public ID3 layouts:
  *
  *  - ID3v2.2 / v2.3 / v2.4 header: "ID3", version, flags, 4-byte
  *    synchsafe size; the v2.3 global and v2.4 per-frame
  *    UNSYNCHRONISATION schemes are undone (FF 00 → FF); extended
  *    headers are skipped (v2.3 plain size, v2.4 synchsafe);
  *  - frames: 4-byte ids + 4-byte sizes (plain big-endian in v2.3,
  *    synchsafe in v2.4) + 2 flag bytes; v2.2 uses 3-byte ids and
  *    3-byte sizes with no flags;
  *  - text frames TIT2/TPE1/TALB (TT2/TP1/TAL in v2.2) decode per the
  *    leading encoding byte: 0 = ISO-8859-1, 1 = UTF-16 with BOM,
  *    2 = UTF-16BE (v2.4), 3 = UTF-8 (v2.4); trailing NULs trimmed;
  *  - compressed/encrypted frames are skipped (their flag bits);
  *  - no v2 tag → the ID3v1 TAIL fallback: a 128-byte "TAG" block at
  *    EOF with fixed-width ISO-8859-1 title/artist/album fields.
  *
  * Payloads with neither tag → NULL (absence of metadata is data).
  * Missing individual fields are NULL columns. Static-invoke codegen,
  * per-row, zero shuffle.
  */
case class Id3TagsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Id3Tags.schema
  override def prettyName: String = "id3_tags"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Id3Tags.parseRow(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Id3Tags.parseRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Id3Tags {

  val schema: StructType = StructType(Seq(
    StructField("version", StringType),
    StructField("title", StringType),
    StructField("artist", StringType),
    StructField("album", StringType)))

  final case class Tags(version: String, title: String, artist: String,
      album: String)

  def parseRow(b: Array[Byte]): InternalRow = {
    val t = parse(b)
    if (t == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(t.version),
        if (t.title == null) null else UTF8String.fromString(t.title),
        if (t.artist == null) null else UTF8String.fromString(t.artist),
        if (t.album == null) null else UTF8String.fromString(t.album)))
  }

  private def synchsafe(b: Array[Byte], i: Int): Int =
    ((b(i) & 0x7f) << 21) | ((b(i + 1) & 0x7f) << 14) |
      ((b(i + 2) & 0x7f) << 7) | (b(i + 3) & 0x7f)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** Undo unsynchronisation: every FF 00 pair collapses to FF. */
  private def deUnsync(b: Array[Byte], from: Int, len: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(len)
    var i = from
    val end = from + len
    while (i < end) {
      out.write(b(i))
      if ((b(i) & 0xff) == 0xff && i + 1 < end && b(i + 1) == 0) i += 2
      else i += 1
    }
    out.toByteArray
  }

  private def decodeText(b: Array[Byte], from: Int, len: Int): String = {
    if (len < 1) return null
    val enc = b(from) & 0xff
    var s = from + 1
    var l = len - 1
    val cs = enc match {
      case 0 => java.nio.charset.StandardCharsets.ISO_8859_1
      case 1 => java.nio.charset.StandardCharsets.UTF_16 // BOM-driven
      case 2 => java.nio.charset.StandardCharsets.UTF_16BE
      case 3 => java.nio.charset.StandardCharsets.UTF_8
      case _ => return null
    }
    // trim the encoding's NUL terminator(s)
    if (enc == 1 || enc == 2) {
      while (l >= 2 && b(s + l - 1) == 0 && b(s + l - 2) == 0) l -= 2
    } else {
      while (l >= 1 && b(s + l - 1) == 0) l -= 1
    }
    if (l <= 0) return null
    val out = new String(b, s, l, cs)
    if (out.isEmpty) null else out
  }

  /** Tags from the v2 header or the v1 tail, or null when neither. */
  def parse(b: Array[Byte]): Tags = {
    if (b == null) return null
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3' &&
        (b(3) & 0xff) <= 4 && (b(3) & 0xff) >= 2) {
      val major = b(3) & 0xff
      val flags = b(5) & 0xff
      val size = synchsafe(b, 6)
      val end = math.min(10L + size, b.length).toInt
      // v2.3 global unsync applies to the whole tag body
      val body =
        if ((flags & 0x80) != 0 && major == 3) deUnsync(b, 10, end - 10)
        else java.util.Arrays.copyOfRange(b, 10, end)
      var p = 0
      // extended header: v2.3 size EXCLUDES its own 4 bytes (plain BE),
      // v2.4 size INCLUDES itself (synchsafe)
      if ((flags & 0x40) != 0 && body.length >= 4) {
        p = if (major == 4) synchsafe(body, 0)
            else 4 + be32(body, 0)
        if (p < 0 || p > body.length) return null
      }
      var title: String = null
      var artist: String = null
      var album: String = null
      val idLen = if (major == 2) 3 else 4
      val hdrLen = if (major == 2) 6 else 10
      var go = true
      while (go && p + hdrLen <= body.length) {
        if (body(p) == 0) go = false // padding
        else {
          val id = new String(body, p, idLen,
            java.nio.charset.StandardCharsets.US_ASCII)
          val fsize =
            if (major == 2)
              ((body(p + 3) & 0xff) << 16) | ((body(p + 4) & 0xff) << 8) |
                (body(p + 5) & 0xff)
            else if (major == 4) synchsafe(body, p + 4)
            else be32(body, p + 4)
          if (fsize < 0 || p.toLong + hdrLen + fsize > body.length) go = false
          else {
            val fflags = if (major == 2) 0 else body(p + 9) & 0xff
            // v2.4 frame format flags: 0x08 compression, 0x04 encryption,
            // 0x02 per-frame unsync; v2.3: 0x80 compression, 0x40 encrypt
            val skip =
              if (major == 4) (fflags & 0x0c) != 0
              else if (major == 3) (fflags & 0xc0) != 0
              else false
            val frame =
              if (major == 4 && (fflags & 0x02) != 0)
                deUnsync(body, p + hdrLen, fsize)
              else java.util.Arrays.copyOfRange(body, p + hdrLen,
                p + hdrLen + fsize)
            if (!skip) {
              val text = () => decodeText(frame, 0, frame.length)
              id match {
                case "TIT2" | "TT2" => if (title == null) title = text()
                case "TPE1" | "TP1" => if (artist == null) artist = text()
                case "TALB" | "TAL" => if (album == null) album = text()
                case _ => ()
              }
            }
            p += hdrLen + fsize
          }
        }
      }
      return Tags(s"2.$major", title, artist, album)
    }
    // ID3v1: the 128-byte "TAG" tail
    if (b.length >= 128) {
      val t = b.length - 128
      if (b(t) == 'T' && b(t + 1) == 'A' && b(t + 2) == 'G') {
        def field(off: Int, len: Int): String = {
          var l = len
          while (l > 0 && (b(t + off + l - 1) == 0 ||
              b(t + off + l - 1) == ' ')) l -= 1
          if (l == 0) null
          else new String(b, t + off, l,
            java.nio.charset.StandardCharsets.ISO_8859_1)
        }
        return Tags("1", field(3, 30), field(33, 30), field(63, 30))
      }
    }
    null
  }

  // ------------------------------------------------- fixture encoder

  private def synchsafeB(v: Int): Array[Byte] = Array(
    ((v >> 21) & 0x7f).toByte, ((v >> 14) & 0x7f).toByte,
    ((v >> 7) & 0x7f).toByte, (v & 0x7f).toByte)

  /** One v2 text frame in the requested encoding (0/1/2/3). */
  private def textFrame(major: Int, id: String, text: String,
      enc: Int): Array[Byte] = {
    val payload = new java.io.ByteArrayOutputStream(64)
    payload.write(enc)
    enc match {
      case 0 => payload.write(text.getBytes(
        java.nio.charset.StandardCharsets.ISO_8859_1))
      case 1 =>
        payload.write(0xfe); payload.write(0xff)
        payload.write(text.getBytes(
          java.nio.charset.StandardCharsets.UTF_16BE))
      case 2 => payload.write(text.getBytes(
        java.nio.charset.StandardCharsets.UTF_16BE))
      case _ => payload.write(text.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    }
    val data = payload.toByteArray
    val out = new java.io.ByteArrayOutputStream(data.length + 10)
    if (major == 2) {
      out.write(id.getBytes("US-ASCII"), 0, 3)
      out.write((data.length >> 16) & 0xff)
      out.write((data.length >> 8) & 0xff)
      out.write(data.length & 0xff)
    } else {
      out.write(id.getBytes("US-ASCII"), 0, 4)
      if (major == 4) out.write(synchsafeB(data.length), 0, 4)
      else {
        out.write((data.length >> 24) & 0xff); out.write((data.length >> 16) & 0xff)
        out.write((data.length >> 8) & 0xff); out.write(data.length & 0xff)
      }
      out.write(0); out.write(0) // frame flags
    }
    out.write(data, 0, data.length)
    out.toByteArray
  }

  /** A REAL ID3v2 tag block (prepend to an audio stream). `enc`
    * selects the text encoding; v2.2 uses 3-char ids; `unsync = true`
    * (v2.3 only here) applies global unsynchronisation. */
  def encodeV2(major: Int, title: String = null, artist: String = null,
      album: String = null, enc: Int = 0, unsync: Boolean = false,
      padding: Int = 16): Array[Byte] = {
    require(major >= 2 && major <= 4)
    require(!unsync || major == 3, "global unsync fixture is v2.3-only")
    require(enc <= 1 || major == 4, "encodings 2/3 are v2.4-only")
    val frames = new java.io.ByteArrayOutputStream(256)
    def f(id4: String, id3: String, v: String): Unit =
      if (v != null)
        frames.write(textFrame(major,
          if (major == 2) id3 else id4, v, enc))
    f("TIT2", "TT2", title)
    f("TPE1", "TP1", artist)
    f("TALB", "TAL", album)
    frames.write(new Array[Byte](padding), 0, padding)
    var body = frames.toByteArray
    if (unsync) {
      val o = new java.io.ByteArrayOutputStream(body.length + 8)
      var i = 0
      while (i < body.length) {
        o.write(body(i))
        if ((body(i) & 0xff) == 0xff) o.write(0)
        i += 1
      }
      body = o.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream(body.length + 10)
    out.write('I'); out.write('D'); out.write('3')
    out.write(major); out.write(0)
    out.write(if (unsync) 0x80 else 0)
    out.write(synchsafeB(body.length), 0, 4)
    out.write(body, 0, body.length)
    out.toByteArray
  }

  /** A REAL ID3v1 128-byte tail (append to an audio stream). */
  def encodeV1(title: String = null, artist: String = null,
      album: String = null): Array[Byte] = {
    val out = new Array[Byte](128)
    out(0) = 'T'; out(1) = 'A'; out(2) = 'G'
    def put(off: Int, v: String): Unit =
      if (v != null) {
        val bs = v.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        System.arraycopy(bs, 0, out, off, math.min(30, bs.length))
      }
    put(3, title); put(33, artist); put(63, album)
    out(127) = 255.toByte // genre: none
    out
  }
}
