package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** image_meta(content binary) → struct<format string, width int, height int>.
  *
  * REAL multimodal metadata extraction with zero codec libraries: image
  * container headers are pure byte arithmetic, so format detection and
  * pixel dimensions come straight off the binary column —
  *
  *  - PNG: 8-byte signature, then the IHDR chunk's big-endian
  *    width/height at offsets 16/20 (PNG spec §11.2.2);
  *  - JPEG: SOI marker, then a segment walk to the first SOFn
  *    (baseline C0, progressive C2, … — everything in C0–CF except the
  *    non-frame C4/C8/CC), whose payload is precision(1) + height(2 BE) +
  *    width(2 BE) (ITU T.81 §B.2.2). APP/quantization/comment segments of
  *    any length are skipped by their declared size, so real camera files
  *    with EXIF blocks parse the same as minimal fixtures;
  *  - GIF: "GIF87a"/"GIF89a", then little-endian width/height at 6/8.
  *
  * Anything else — truncated headers, unknown magic, a JPEG with no frame
  * header — yields NULL, never an exception: corrupt media in a 100 TB
  * crawl is data, not an error. Per-row, no shuffle; the expression runs
  * inside the scan's projection, so a metadata-only pipeline (filter by
  * dimensions, group by format) never moves the payload bytes.
  */
case class ImageMetaExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ImageMeta.schema
  override def prettyName: String = "image_meta"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    ImageMeta.parse(input.asInstanceOf[Array[Byte]]) match {
      case null => null
      case (fmt, w, h) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(fmt), w, h))
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageMeta {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** (format, width, height) or null when unrecognized/corrupt. */
  def parse(b: Array[Byte]): (String, Int, Int) = {
    if (b == null) return null
    if (isPng(b)) {
      val w = be32(b, 16); val h = be32(b, 20)
      if (w > 0 && h > 0) ("png", w, h) else null
    } else if (isGif(b)) {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w > 0 && h > 0) ("gif", w, h) else null
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      parseJpeg(b)
    } else null
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 &&
      java.util.Arrays.equals(b.take(8), PngSig) &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** Segment walk to the first frame header (SOFn). Markers C4 (Huffman
    * table), C8 (reserved), CC (arithmetic conditioning) sit inside the
    * C0–CF range but are NOT frame headers; standalone markers (RSTn,
    * TEM) carry no length field. */
  private def parseJpeg(b: Array[Byte]): (String, Int, Int) = {
    var i = 2
    while (i + 1 < b.length) {
      if ((b(i) & 0xff) != 0xff) return null // lost marker alignment
      // fill bytes: any number of FFs may pad before a marker
      while (i + 1 < b.length && (b(i + 1) & 0xff) == 0xff) i += 1
      if (i + 1 >= b.length) return null
      val m = b(i + 1) & 0xff
      if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
        if (i + 9 > b.length) return null // truncated frame header
        val h = be16(b, i + 5); val w = be16(b, i + 7)
        return if (w > 0 && h > 0) ("jpeg", w, h) else null
      } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        i += 2 // standalone marker, no length field
      } else if (m == 0xd9) {
        return null // EOI before any frame header
      } else {
        if (i + 4 > b.length) return null
        val len = be16(b, i + 2)
        if (len < 2) return null
        i += 2 + len
      }
    }
    null
  }

  // ------------------------------------------------------- fixture encoder

  /** Minimal-but-real container bytes for tests/fixtures: actual PNG
    * signature + IHDR (+ IEND), a JPEG with an APP0 segment BEFORE the
    * SOF0 (so parsers must really walk segments), a GIF89a logical screen
    * descriptor + trailer. Deterministic for a given (format, w, h). */
  def encode(format: String, width: Int, height: Int): Array[Byte] = {
    require(width > 0 && width <= 0xffff && height > 0 && height <= 0xffff,
      s"fixture dimensions out of range: ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wbe16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def wbe32(v: Int): Unit = { w8(v >> 24); w8(v >> 16); w8(v >> 8); w8(v) }
    def wle16(v: Int): Unit = { w8(v); w8(v >> 8) }
    format match {
      case "png" =>
        out.write(PngSig)
        wbe32(13); out.write("IHDR".getBytes("US-ASCII"))
        wbe32(width); wbe32(height)
        w8(8); w8(2); w8(0); w8(0); w8(0) // depth 8, truecolor
        wbe32(0) // CRC not validated by header readers
        wbe32(0); out.write("IEND".getBytes("US-ASCII")); wbe32(0)
      case "jpeg" =>
        w8(0xff); w8(0xd8) // SOI
        w8(0xff); w8(0xe0); wbe16(16) // APP0/JFIF, 16-byte segment
        out.write("JFIF".getBytes("US-ASCII")); w8(0)
        w8(1); w8(1); w8(0); wbe16(1); wbe16(1); w8(0); w8(0)
        w8(0xff); w8(0xc0); wbe16(17) // SOF0, 3 components
        w8(8); wbe16(height); wbe16(width); w8(3)
        w8(1); w8(0x22); w8(0); w8(2); w8(0x11); w8(1); w8(3); w8(0x11); w8(1)
        w8(0xff); w8(0xd9) // EOI
      case "gif" =>
        out.write("GIF89a".getBytes("US-ASCII"))
        wle16(width); wle16(height)
        w8(0); w8(0); w8(0) // no GCT, bg 0, square pixels
        w8(0x3b) // trailer
      case other =>
        throw new IllegalArgumentException(s"unknown fixture format: $other")
    }
    out.toByteArray
  }
}
