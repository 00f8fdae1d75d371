package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** exif_meta(content binary) → struct<orientation, datetime, make,
  * model, gps_lat, gps_lon> — EXIF inspection for image curation,
  * where the load-bearing use at corpus scale is PRIVACY: GPS tags
  * must be FOUND before they can be stripped or filtered, capture
  * timestamps drive dedup windows, and orientation feeds the decode
  * pipeline. Pure byte arithmetic over the public layouts:
  *
  *  - JPEG: the APP1 segment ("Exif\0\0" signature) located by a
  *    marker walk from SOI — entropy-coded payloads are never
  *    scanned; TIFF files carry the same structure at offset 0;
  *  - the TIFF IFD machinery (both byte orders, value-or-offset
  *    encoding for BYTE/ASCII/SHORT/LONG/RATIONAL): IFD0 tags
  *    0x0112 Orientation, 0x0132 DateTime, 0x010F Make, 0x0110
  *    Model, plus the 0x8769 Exif-IFD pointer (0x9003
  *    DateTimeOriginal wins over IFD0's file-modified DateTime) and
  *    the 0x8825 GPS-IFD pointer;
  *  - GPS: latitude/longitude as the spec's 3-RATIONAL
  *    degrees/minutes/seconds, signed by the N/S / E/W refs, emitted
  *    as decimal degrees (d + m/60 + s/3600 in that exact order —
  *    bit-reproducible);
  *  - hostile offsets/counts clamp or refuse the FIELD, never the
  *    row; images without EXIF → NULL row (absence is data).
  *
  * Per-row inside the scan projection, zero shuffle at any scale.
  */
case class ExifMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ExifMeta.schema
  override def prettyName: String = "exif_meta"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    ExifMeta.parseRow(input.asInstanceOf[Array[Byte]])

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ExifMeta.parseRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExifMeta {

  val schema: StructType = StructType(Seq(
    StructField("orientation", IntegerType),
    StructField("datetime", StringType),
    StructField("make", StringType),
    StructField("model", StringType),
    StructField("gps_lat", DoubleType),
    StructField("gps_lon", DoubleType)))

  final case class Meta(orientation: Int, datetime: String, make: String,
      model: String, gpsLat: java.lang.Double, gpsLon: java.lang.Double)

  def parseRow(b: Array[Byte]): InternalRow = {
    val m = parse(b)
    if (m == null) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        if (m.orientation <= 0) null else m.orientation,
        if (m.datetime == null) null else UTF8String.fromString(m.datetime),
        if (m.make == null) null else UTF8String.fromString(m.make),
        if (m.model == null) null else UTF8String.fromString(m.model),
        m.gpsLat, m.gpsLon))
  }

  /** The EXIF TIFF body inside a payload: offset 0 for TIFF files,
    * the APP1 "Exif\0\0" body for JPEG; -1 when absent. */
  private def exifBodyAt(b: Array[Byte]): Int = {
    if (b.length >= 8 && ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))) return 0
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return -1 // not JPEG
    var i = 2
    var steps = 0
    while (i + 4 <= b.length && steps < 64) {
      steps += 1
      if ((b(i) & 0xff) != 0xff) return -1
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return -1 // EOI / SOS: no EXIF
      val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
      if (len < 2 || i + 2 + len > b.length) return -1
      if (marker == 0xe1 && len >= 8 &&
          b(i + 4) == 'E' && b(i + 5) == 'x' && b(i + 6) == 'i' &&
          b(i + 7) == 'f' && b(i + 8) == 0 && b(i + 9) == 0)
        return i + 10
      i += 2 + len
    }
    -1
  }

  private final class Tiff(b: Array[Byte], base: Int, le: Boolean) {
    val limit: Int = b.length
    // All bounds arithmetic in Long: off/count are attacker-controlled
    // 32-bit fields, so Int sums can wrap negative and pass the guard.
    def u16(off: Int): Int = {
      val oL = base.toLong + off
      if (oL < 0 || oL + 2 > limit) return -1
      val o = oL.toInt
      if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    }
    def u32(off: Int): Long = {
      val oL = base.toLong + off
      if (oL < 0 || oL + 4 > limit) return -1L
      val o = oL.toInt
      if (le) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
      else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    }
    def ascii(off: Int, count: Int): String = {
      val oL = base.toLong + off
      if (oL < 0 || count <= 0 || oL + count > limit) return null
      val o = oL.toInt
      var n = count
      while (n > 0 && b(o + n - 1) == 0) n -= 1 // trim NUL terminator(s)
      new String(b, o, n, java.nio.charset.StandardCharsets.US_ASCII)
    }
  }

  /** One IFD as tag → (type, count, valueOffset-within-body). The
    * value cell holds the data when ≤4 bytes, else a body offset. */
  private def readIfd(t: Tiff, at: Int): Map[Int, (Int, Int, Int)] = {
    val n = t.u16(at)
    if (n < 0 || n > 512) return Map.empty
    var m = Map.empty[Int, (Int, Int, Int)]
    var i = 0
    while (i < n) {
      val e = at + 2 + i * 12
      val tag = t.u16(e)
      val tpe = t.u16(e + 2)
      val count = t.u32(e + 4).toInt
      if (tag >= 0 && tpe >= 0 && count >= 0)
        m = m.updated(tag, (tpe, count, e + 8))
      i += 1
    }
    m
  }

  private def typeSize(tpe: Int): Int = tpe match {
    case 1 | 2 | 6 | 7 => 1 // BYTE / ASCII / SBYTE / UNDEFINED
    case 3 | 8 => 2 // SHORT
    case 4 | 9 => 4 // LONG
    case 5 | 10 => 8 // RATIONAL
    case _ => 0
  }

  /** The body offset where a field's data lives (inline when ≤4B). */
  private def dataAt(t: Tiff, field: (Int, Int, Int)): Int = {
    val (tpe, count, cell) = field
    val sz = typeSize(tpe)
    if (sz == 0 || count < 0 || count > (1 << 20)) -1
    else if (sz * count <= 4) cell
    else t.u32(cell).toInt
  }

  private def shortOrLong(t: Tiff, field: (Int, Int, Int)): Int = {
    val at = dataAt(t, field)
    if (at < 0) -1
    else if (field._1 == 3) t.u16(at)
    else if (field._1 == 4) t.u32(at).toInt
    else -1
  }

  private def asciiField(t: Tiff, field: (Int, Int, Int)): String = {
    if (field._1 != 2) return null
    val at = dataAt(t, field)
    if (at < 0) null else t.ascii(at, field._2)
  }

  /** DMS rationals → decimal degrees, in the documented exact order. */
  private def dms(t: Tiff, field: (Int, Int, Int)): java.lang.Double = {
    if (field._1 != 5 || field._2 < 3) return null
    val at = dataAt(t, field)
    if (at < 0) return null
    def rat(i: Int): Double = {
      val num = t.u32(at + i * 8)
      val den = t.u32(at + i * 8 + 4)
      if (num < 0 || den <= 0) Double.NaN else num.toDouble / den.toDouble
    }
    val v = rat(0) + rat(1) / 60.0 + rat(2) / 3600.0
    if (java.lang.Double.isNaN(v)) null else v
  }

  /** EXIF fields, or null when the payload carries no EXIF body. */
  def parse(b: Array[Byte]): Meta = {
    if (b == null || b.length < 12) return null
    val base = exifBodyAt(b)
    if (base < 0) return null
    val le = b(base) == 'I'
    if (!((b(base) == 'I' && b(base + 1) == 'I') ||
        (b(base) == 'M' && b(base + 1) == 'M'))) return null
    val t = new Tiff(b, base, le)
    if (t.u16(2) != 42) return null
    val ifd0At = t.u32(4).toInt
    if (ifd0At < 0) return null
    val ifd0 = readIfd(t, ifd0At)
    if (ifd0.isEmpty) return null
    val orientation = ifd0.get(0x0112).map(shortOrLong(t, _)).getOrElse(-1)
    var datetime = ifd0.get(0x0132).map(asciiField(t, _)).orNull
    val make = ifd0.get(0x010f).map(asciiField(t, _)).orNull
    val model = ifd0.get(0x0110).map(asciiField(t, _)).orNull
    // Exif sub-IFD: DateTimeOriginal (capture time) wins over IFD0's
    // file-modified DateTime
    ifd0.get(0x8769).foreach { f =>
      val at = shortOrLong(t, (4, 1, f._3)) // pointer is a LONG
      if (at > 0) {
        val sub = readIfd(t, at)
        val original = sub.get(0x9003).map(asciiField(t, _)).orNull
        if (original != null) datetime = original
      }
    }
    var lat: java.lang.Double = null
    var lon: java.lang.Double = null
    ifd0.get(0x8825).foreach { f =>
      val at = shortOrLong(t, (4, 1, f._3))
      if (at > 0) {
        val gps = readIfd(t, at)
        val latRef = gps.get(0x0001).map(asciiField(t, _)).orNull
        val lonRef = gps.get(0x0003).map(asciiField(t, _)).orNull
        val lat0 = gps.get(0x0002).map(dms(t, _)).orNull
        val lon0 = gps.get(0x0004).map(dms(t, _)).orNull
        if (lat0 != null)
          lat = if (latRef == "S") -lat0.doubleValue() else lat0.doubleValue()
        if (lon0 != null)
          lon = if (lonRef == "W") -lon0.doubleValue() else lon0.doubleValue()
      }
    }
    Meta(orientation, datetime, make, model, lat, lon)
  }

  // ------------------------------------------------- fixture encoder

  /** An EXIF APP1 body (TIFF structure) with IFD0 + Exif + GPS IFDs.
    * `le` selects the byte order spelling. GPS rationals carry whole
    * d/m/s with denominator 1. */
  def encodeExifBody(le: Boolean, orientation: Int, datetime: String,
      make: String, model: String,
      gps: Option[(Int, Int, Int, Boolean, Int, Int, Int, Boolean)],
      dateTimeOriginal: String = null): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(512)
    def w16(v: Int): Unit =
      if (le) { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      else { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Long): Unit =
      if (le) { out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
        out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt) }
      else { out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt) }
    // layout plan: header(8) IFD0 at 8; strings + sub-IFDs after.
    // entries: orientation, DateTime, Make, Model, [ExifIFD], [GpsIFD]
    val dtBytes = (datetime + " ").getBytes("US-ASCII")
    val makeBytes = (make + " ").getBytes("US-ASCII")
    val modelBytes = (model + " ").getBytes("US-ASCII")
    val hasDto = dateTimeOriginal != null
    // the encoder always writes these via offsets — keep them out of
    // the ≤4-byte inline lane the reader would otherwise use
    require(dtBytes.length > 4 && makeBytes.length > 4 &&
      modelBytes.length > 4, "fixture strings must exceed 4 bytes")
    val dtoBytes =
      if (hasDto) (dateTimeOriginal + " ").getBytes("US-ASCII")
      else Array.emptyByteArray
    val n0 = 4 + (if (hasDto) 1 else 0) + (if (gps.isDefined) 1 else 0)
    val ifd0Size = 2 + n0 * 12 + 4
    var cursor = 8 + ifd0Size // data area starts here
    val dtOff = cursor; cursor += dtBytes.length
    val makeOff = cursor; cursor += makeBytes.length
    val modelOff = cursor; cursor += modelBytes.length
    val exifIfdOff = if (hasDto) { val o = cursor; cursor += 2 + 12 + 4; o } else 0
    val dtoOff = if (hasDto) { val o = cursor; cursor += dtoBytes.length; o } else 0
    val gpsIfdOff = if (gps.isDefined) { val o = cursor; cursor += 2 + 4 * 12 + 4; o } else 0
    val latOff = if (gps.isDefined) { val o = cursor; cursor += 24; o } else 0
    val lonOff = if (gps.isDefined) { val o = cursor; cursor += 24; o } else 0

    // TIFF header
    out.write(if (le) 'I' else 'M'); out.write(if (le) 'I' else 'M')
    w16(42); w32(8)
    // IFD0
    w16(n0)
    def entry(tag: Int, tpe: Int, count: Int)(value: => Unit): Unit = {
      w16(tag); w16(tpe); w32(count)
      val before = out.size()
      value
      // inline values pad to 4 bytes
      while (out.size() < before + 4) out.write(0)
    }
    entry(0x010f, 2, makeBytes.length) { w32(makeOff) }
    entry(0x0110, 2, modelBytes.length) { w32(modelOff) }
    entry(0x0112, 3, 1) { w16(orientation) }
    entry(0x0132, 2, dtBytes.length) { w32(dtOff) }
    if (hasDto) entry(0x8769, 4, 1) { w32(exifIfdOff) }
    if (gps.isDefined) entry(0x8825, 4, 1) { w32(gpsIfdOff) }
    w32(0) // next IFD
    out.write(dtBytes); out.write(makeBytes); out.write(modelBytes)
    if (hasDto) {
      w16(1)
      entry(0x9003, 2, dtoBytes.length) { w32(dtoOff) }
      w32(0)
      out.write(dtoBytes)
    }
    gps.foreach { case (latD, latM, latS, south, lonD, lonM, lonS, west) =>
      w16(4)
      entry(0x0001, 2, 2) { out.write(if (south) 'S' else 'N'); out.write(0) }
      entry(0x0002, 5, 3) { w32(latOff) }
      entry(0x0003, 2, 2) { out.write(if (west) 'W' else 'E'); out.write(0) }
      entry(0x0004, 5, 3) { w32(lonOff) }
      w32(0)
      Seq(latD, latM, latS).foreach { v => w32(v); w32(1) }
      Seq(lonD, lonM, lonS).foreach { v => w32(v); w32(1) }
    }
    val body = out.toByteArray
    require(body.length == cursor, s"layout drift: ${body.length} vs $cursor")
    body
  }

  /** Splice an EXIF APP1 segment into a REAL JPEG right after SOI —
    * the photo-file shape. The JPEG stays fully decodable. */
  def withExif(jpeg: Array[Byte], body: Array[Byte]): Array[Byte] = {
    require(jpeg.length > 2 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "expected a JPEG")
    val sig = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0)
    val segLen = 2 + sig.length + body.length
    require(segLen <= 0xffff, "EXIF body too large for one APP1")
    val out = new java.io.ByteArrayOutputStream(jpeg.length + segLen + 2)
    out.write(jpeg, 0, 2)
    out.write(0xff); out.write(0xe1)
    out.write((segLen >> 8) & 0xff); out.write(segLen & 0xff)
    out.write(sig, 0, sig.length)
    out.write(body, 0, body.length)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }
}
