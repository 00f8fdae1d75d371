package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** mp4_meta(content binary) → struct<brand, duration_ms, codec, width,
  * height> — REAL container metadata for the video slice whose frame
  * payload stays honestly stubbed (H.264/HEVC/VP9 entropy decode needs
  * codec machinery out of scope). At 100 TB, geometry / duration /
  * codec are what a curation pipeline filters on BEFORE paying any
  * decode: drop tiny thumbnails, cap durations, route by codec.
  *
  * ISO base media file format (ISO/IEC 14496-12) box walk, pure byte
  * arithmetic:
  *
  *  - boxes are 32-bit BE size + fourcc; size 1 → 64-bit largesize,
  *    size 0 → extends to EOF; `moov`/`trak`/`mdia`/`minf`/`stbl`
  *    containers are descended, everything else skipped by size;
  *  - `ftyp` → major brand; `mvhd` → timescale + duration (version 0
  *    and 1 layouts), reported as integer milliseconds (duration·1000 /
  *    timescale, floor);
  *  - the first `stsd` whose sample entry is a VISUAL entry (nonzero
  *    16-bit width/height at entry offsets 32/34 — 8-byte box header +
  *    6 reserved + 2 data_reference_index + 16 pre_defined/reserved,
  *    ISO 14496-12 §12.1.3) supplies codec fourcc
  *    + pixel dimensions — `avc1`, `hev1`, `hvc1`, `vp09`, `av01`,
  *    `mp4v`, whatever the file declares.
  *
  * Anything malformed / not ISO-BMFF → NULL, never an exception.
  * Static-invoke codegen, per-row, zero shuffle (the [[ImageMeta]]
  * shape).
  */
case class Mp4MetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Mp4Meta.schema
  override def prettyName: String = "mp4_meta"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Mp4Meta.parseRow(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.Mp4Meta.parseRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Mp4Meta {

  val schema: StructType = StructType(Seq(
    StructField("brand", StringType),
    StructField("duration_ms", LongType),
    StructField("codec", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  def parseRow(b: Array[Byte]): InternalRow = {
    val m = parse(b)
    if (m == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(m._1), m._2,
        if (m._3 == null) null else UTF8String.fromString(m._3), m._4, m._5))
  }

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be64(b: Array[Byte], i: Int): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "ISO-8859-1")

  /** (brand, duration_ms, codec, width, height) or null. Codec/geometry
    * stay null-ish (codec null, dims 0) when no visual track exists. */
  def parse(b: Array[Byte]): (String, Long, String, Int, Int) = {
    if (b == null || b.length < 16) return null
    if (fourcc(b, 4) != "ftyp") return null
    var brand: String = null
    var durationMs = -1L
    var codec: String = null
    var w = 0
    var h = 0

    def walk(from: Long, to: Long, depth: Int): Boolean = {
      if (depth > 8) return false
      var i = from
      while (i + 8 <= to) {
        var size = be32(b, i.toInt)
        val typ = fourcc(b, i.toInt + 4)
        var hdr = 8L
        if (size == 1) {
          if (i + 16 > to) return false
          size = be64(b, i.toInt + 8)
          hdr = 16L
        } else if (size == 0) size = to - i // extends to end
        if (size < hdr || i + size > to) return false
        val body = i + hdr
        typ match {
          case "ftyp" =>
            if (size < hdr + 4) return false
            brand = fourcc(b, body.toInt)
          case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
            if (!walk(body, i + size, depth + 1)) return false
          case "mvhd" =>
            if (size < hdr + 4) return false
            val version = b(body.toInt) & 0xff
            if (version == 0) {
              if (size < hdr + 20) return false
              val timescale = be32(b, body.toInt + 12)
              val duration = be32(b, body.toInt + 16)
              if (timescale > 0) durationMs = duration * 1000L / timescale
            } else if (version == 1) {
              if (size < hdr + 28) return false
              val timescale = be32(b, body.toInt + 20)
              val duration = be64(b, body.toInt + 24)
              if (timescale > 0) durationMs = duration * 1000L / timescale
            }
          case "stsd" if codec == null =>
            // version/flags(4) + entry_count(4) + first sample entry
            if (size >= hdr + 8 + 8) {
              val entry = body + 8
              val esize = be32(b, entry.toInt)
              val etype = fourcc(b, entry.toInt + 4)
              // a visual sample entry carries nonzero 16-bit dims at
              // entry offsets 32/34 (8 hdr + 6 reserved + 2 dri + 16)
              if (esize >= 36 && entry + 36 <= i + size) {
                val ew = be16(b, entry.toInt + 32)
                val eh = be16(b, entry.toInt + 34)
                if (ew > 0 && eh > 0) { codec = etype; w = ew; h = eh }
              }
            }
          case _ => () // mdat, free, udta, … skipped by size
        }
        i += size
      }
      true
    }
    if (!walk(0, b.length.toLong, 0)) return null
    if (brand == null) return null
    (brand, durationMs, codec, w, h)
  }

  // ------------------------------------------------------------- encode

  /** Minimal-but-real ISO-BMFF bytes for fixtures + tests: ftyp + moov
    * (mvhd v0 + one video trak with an stsd sample entry) + an empty
    * mdat. `codec` is the sample-entry fourcc (e.g. "avc1"). */
  def encode(brand: String, durationMs: Long, codec: String,
      width: Int, height: Int, timescale: Int = 1000): Array[Byte] = {
    require(brand.length == 4 && codec.length == 4 && durationMs >= 0 &&
      width > 0 && width <= 0xffff && height > 0 && height <= 0xffff)
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + payload.length)
      val size = out.length
      out(0) = (size >> 24).toByte; out(1) = (size >> 16).toByte
      out(2) = (size >> 8).toByte; out(3) = size.toByte
      (0 until 4).foreach(k => out(4 + k) = typ.charAt(k).toByte)
      System.arraycopy(payload, 0, out, 8, payload.length)
      out
    }
    def be32a(v: Long): Array[Byte] =
      Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be16a(v: Int): Array[Byte] = Array((v >> 8).toByte, v.toByte)

    val ftyp = box("ftyp",
      brand.getBytes("ISO-8859-1") ++ be32a(0) ++ "isom".getBytes("ISO-8859-1"))
    val duration = durationMs * timescale / 1000
    val mvhd = box("mvhd",
      be32a(0) ++ be32a(0) ++ be32a(0) ++ // version/flags, ctime, mtime
        be32a(timescale) ++ be32a(duration) ++
        be32a(0x00010000L) ++ Array[Byte](1, 0, 0, 0) ++ // rate, volume+rsv
        new Array[Byte](8) ++ // reserved
        (be32a(0x00010000L) ++ be32a(0) ++ be32a(0) ++
          be32a(0) ++ be32a(0x00010000L) ++ be32a(0) ++
          be32a(0) ++ be32a(0) ++ be32a(0x40000000L)) ++ // unity matrix
        new Array[Byte](24) ++ be32a(2)) // predefined, next track id
    val sampleEntry = {
      val p = new java.io.ByteArrayOutputStream()
      p.write(new Array[Byte](6)); p.write(be16a(1)) // reserved + dri
      p.write(new Array[Byte](16)) // predefined/reserved
      p.write(be16a(width)); p.write(be16a(height))
      p.write(be32a(0x00480000L)); p.write(be32a(0x00480000L)) // 72 dpi
      p.write(be32a(0)); p.write(be16a(1)) // reserved, frame count
      p.write(new Array[Byte](32)) // compressor name
      p.write(be16a(24)); p.write(be16a(0xffff)) // depth, predefined
      box(codec, p.toByteArray)
    }
    val stsd = box("stsd", be32a(0) ++ be32a(1) ++ sampleEntry)
    val stbl = box("stbl", stsd)
    val minf = box("minf", stbl)
    val hdlr = box("hdlr",
      be32a(0) ++ be32a(0) ++ "vide".getBytes("ISO-8859-1") ++
        new Array[Byte](12) ++ Array[Byte](0))
    val mdia = box("mdia", hdlr ++ minf)
    val tkhd = box("tkhd",
      be32a(7) ++ be32a(0) ++ be32a(0) ++ be32a(1) ++ be32a(0) ++ // flags…
        be32a(duration) ++ new Array[Byte](8) ++
        be16a(0) ++ be16a(0) ++ be16a(0) ++ be16a(0) ++ // layer…volume
        (be32a(0x00010000L) ++ be32a(0) ++ be32a(0) ++
          be32a(0) ++ be32a(0x00010000L) ++ be32a(0) ++
          be32a(0) ++ be32a(0) ++ be32a(0x40000000L)) ++
        be32a(width.toLong << 16) ++ be32a(height.toLong << 16))
    val trak = box("trak", tkhd ++ mdia)
    val moov = box("moov", mvhd ++ trak)
    val mdat = box("mdat", Array.emptyByteArray)
    ftyp ++ moov ++ mdat
  }
}
