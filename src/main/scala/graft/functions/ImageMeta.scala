package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
  *  - GIF: "GIF87a"/"GIF89a", then little-endian width/height at 6/8;
  *  - WebP: RIFF container ("RIFF" size "WEBP"), then the first chunk
  *    decides the flavor — "VP8 " lossy (3-byte frame tag, 9D 01 2A sync
  *    code, then 14-bit LE width/height), "VP8L" lossless (0x2F
  *    signature byte, then width-1/height-1 as consecutive 14-bit fields
  *    of a 32-bit LE word), "VP8X" extended (24-bit LE canvas
  *    width-1/height-1 after the 4 flag bytes);
  *  - BMP: "BM" file header, then a BITMAPINFOHEADER-or-later DIB header
  *    (size ≥ 40) with signed LE32 width at 18 / height at 22 — a
  *    negative height is the top-down layout flag, so its magnitude is
  *    the pixel height;
  *  - TIFF (round 18): II/MM byte-order mark + magic 42, then the first
  *    IFD's ImageWidth/ImageLength entries (tags 256/257, SHORT or LONG,
  *    both endians).
  *
  * Anything else — truncated headers, unknown magic, a JPEG with no frame
  * header — yields NULL, never an exception: corrupt media in a 100 TB
  * crawl is data, not an error. Per-row, no shuffle; the expression runs
  * inside the scan's projection with REAL `doGenCode` (a static-invoke
  * kernel, same shape as [[IntersectSize]]), so a metadata-only pipeline
  * (filter by dimensions, group by format) stays inside whole-stage
  * codegen and never moves the payload bytes.
  */
case class ImageMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageMeta.schema
  override def prettyName: String = "image_meta"

  // corrupt/unknown bytes parse to NULL even when the input is non-null
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects binary content, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    ImageMeta.parseRow(input.asInstanceOf[Array[Byte]])

  // static-invoke codegen: the header walk runs as one static call inside
  // the whole-stage loop; the kernel itself decides post-call nullness
  // (unrecognized bytes → null row → null result)
  override def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.ImageMeta.parseRow($c);
      ${ev.isNull} = ${ev.value} == null;""")

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
  private def le24(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** The eval/codegen kernel: parsed struct as an InternalRow, or null. */
  def parseRow(b: Array[Byte]): InternalRow = parse(b) match {
    case null => null
    case (fmt, w, h) =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(fmt), w, h))
  }

  /** (format, width, height) or null when unrecognized/corrupt. */
  def parse(b: Array[Byte]): (String, Int, Int) = {
    if (b == null) return null
    if (isPng(b)) {
      val w = be32(b, 16); val h = be32(b, 20)
      if (w > 0 && h > 0) ("png", w, h) else null
    } else if (isGif(b)) {
      val w = le16(b, 6); val h = le16(b, 8)
      if (w > 0 && h > 0) ("gif", w, h) else null
    } else if (isWebp(b)) {
      parseWebp(b)
    } else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') {
      parseBmp(b)
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      parseJpeg(b)
    } else if (b.length >= 8 &&
        ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
         (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))) {
      parseTiff(b)
    } else if (b.length >= 6 && b(0) == 'P' && b(1) >= '1' && b(1) <= '6' &&
        (b(2) == '\n' || b(2) == ' ' || b(2) == '\t' || b(2) == '\r')) {
      parsePnm(b)
    } else null
  }

  /** Netpbm header (round 18): magic P1–P6, then width and height as
    * the next two decimal tokens (comments and whitespace skipped). */
  private def parsePnm(b: Array[Byte]): (String, Int, Int) = {
    var i = 2
    def token(): Int = {
      var v = -1
      while (i < b.length) {
        val c = b(i) & 0xff
        if (c == '#' && v < 0) { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c >= '0' && c <= '9') {
          v = (if (v < 0) 0 else v) * 10 + (c - '0')
          if (v > 0xffffff) return -1
          i += 1
        } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') {
          if (v >= 0) return v else i += 1
        } else return -1
      }
      v
    }
    val w = token()
    val h = token()
    if (w > 0 && h > 0) ("pnm", w, h) else null
  }

  /** First-IFD walk for ImageWidth (256) / ImageLength (257), both
    * endians, SHORT or LONG entry types (TIFF 6.0 §2). */
  private def parseTiff(b: Array[Byte]): (String, Int, Int) = {
    val le = b(0) == 'I'
    def u16(i: Int): Int = if (le) le16(b, i) else be16(b, i)
    def u32(i: Int): Int = if (le) le32(b, i) else be32(b, i)
    val ifd = u32(4)
    if (ifd < 8 || ifd + 2 > b.length) return null
    val n = u16(ifd)
    if (n < 1 || ifd + 2 + 12L * n > b.length) return null
    var w = 0
    var h = 0
    var e = 0
    while (e < n) {
      val at = ifd + 2 + 12 * e
      val tag = u16(at)
      if (tag == 256 || tag == 257) {
        val typ = u16(at + 2)
        // inline value: SHORT left-justified in the 4-byte field, LONG full
        val v = typ match {
          case 3 => u16(at + 8)
          case 4 => u32(at + 8)
          case _ => return null
        }
        if (tag == 256) w = v else h = v
      }
      e += 1
    }
    if (w > 0 && h > 0) ("tiff", w, h) else null
  }

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 &&
      java.util.Arrays.equals(b.take(8), PngSig) &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def isWebp(b: Array[Byte]): Boolean =
    b.length >= 16 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F' && b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P'

  /** First RIFF chunk after "WEBP" picks the bitstream flavor; all three
    * carry dimensions in their first payload bytes (WebP container spec):
    * lossy "VP8 " = frame tag(3) + sync 9D 01 2A + 14-bit LE w/h;
    * lossless "VP8L" = 0x2F + (w-1 | (h-1)<<14) packed LE32;
    * extended "VP8X" = flags(4) + 24-bit LE (w-1)/(h-1) canvas size. */
  private def parseWebp(b: Array[Byte]): (String, Int, Int) = {
    if (b.length < 20) return null // need the first chunk's tag + size
    val tag = new String(b, 12, 4, "US-ASCII")
    tag match {
      case "VP8 " => // payload at 20: frame tag(3), sync code(3), dims
        if (b.length < 30) return null
        if ((b(23) & 0xff) != 0x9d || (b(24) & 0xff) != 0x01 ||
            (b(25) & 0xff) != 0x2a) return null
        val w = le16(b, 26) & 0x3fff
        val h = le16(b, 28) & 0x3fff
        if (w > 0 && h > 0) ("webp", w, h) else null
      case "VP8L" => // payload at 20: 0x2F signature, packed dims LE32
        if (b.length < 25) return null
        if ((b(20) & 0xff) != 0x2f) return null
        val bits = le32(b, 21)
        val w = (bits & 0x3fff) + 1
        val h = ((bits >>> 14) & 0x3fff) + 1
        ("webp", w, h)
      case "VP8X" => // payload at 20: flags(4), 24-bit LE canvas dims - 1
        if (b.length < 30) return null
        val w = le24(b, 24) + 1
        val h = le24(b, 27) + 1
        ("webp", w, h)
      case _ => null
    }
  }

  /** BITMAPINFOHEADER and later (V4/V5 — DIB size ≥ 40): signed LE32
    * dimensions; |height| because negative flags top-down row order. */
  private def parseBmp(b: Array[Byte]): (String, Int, Int) = {
    if (b.length < 26) return null
    val dibSize = le32(b, 14)
    if (dibSize < 40) return null // core/OS2 headers out of scope
    val w = le32(b, 18)
    val h = le32(b, 22)
    if (w > 0 && h != 0 && h != Int.MinValue) ("bmp", w, math.abs(h)) else null
  }

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
    * descriptor + trailer, a lossy-WebP RIFF container with a real VP8
    * keyframe header, a BMP with a BITMAPINFOHEADER. Deterministic for a
    * given (format, w, h). */
  def encode(format: String, width: Int, height: Int): Array[Byte] = {
    // lossy WebP carries 14-bit dimensions; the other containers 16-bit
    val cap = if (format == "webp") 0x3fff else 0xffff
    require(width > 0 && width <= cap && height > 0 && height <= cap,
      s"fixture dimensions out of range for $format: ${width}x$height")
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def wbe16(v: Int): Unit = { w8(v >> 8); w8(v) }
    def wbe32(v: Int): Unit = { w8(v >> 24); w8(v >> 16); w8(v >> 8); w8(v) }
    def wle16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def wle24(v: Int): Unit = { w8(v); w8(v >> 8); w8(v >> 16) }
    def wle32(v: Int): Unit = { w8(v); w8(v >> 8); w8(v >> 16); w8(v >> 24) }
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
      case "webp" =>
        // lossy VP8 : 10-byte payload = frame tag + sync + dims
        val payload = 10
        out.write("RIFF".getBytes("US-ASCII"))
        wle32(4 + 8 + payload) // "WEBP" + chunk header + payload
        out.write("WEBP".getBytes("US-ASCII"))
        out.write("VP8 ".getBytes("US-ASCII"))
        wle32(payload)
        w8(0); w8(0); w8(0) // keyframe frame tag (version 0, show_frame 0)
        w8(0x9d); w8(0x01); w8(0x2a) // sync code
        wle16(width); wle16(height) // 14-bit dims, scale bits 0
      case "bmp" =>
        // size fields in Long: 65535×65535 at 24bpp is ~12.9 GB of pixel
        // data, which wraps negative in Int math. A u32-unrepresentable
        // size is written as 0 — legal for biSizeImage with BI_RGB, and
        // the sloppy-but-conventional choice for bfSize (parsers,
        // including ours, derive geometry from the info header).
        val rowBytes = ((width.toLong * 3 + 3) / 4) * 4 // 24bpp, 4-byte aligned
        val pixelBytes = rowBytes * height
        def szOrZero(v: Long): Int = if (v <= 0xFFFFFFFFL) v.toInt else 0
        out.write("BM".getBytes("US-ASCII"))
        wle32(szOrZero(14 + 40 + pixelBytes)) // declared file size
        wle16(0); wle16(0); wle32(14 + 40) // reserved, pixel offset
        wle32(40) // BITMAPINFOHEADER
        wle32(width); wle32(height)
        wle16(1); wle16(24) // planes, bpp
        wle32(0); wle32(szOrZero(pixelBytes)) // BI_RGB, image size
        wle32(2835); wle32(2835); wle32(0); wle32(0) // 72 dpi, no palette
      case "tiff" =>
        // little-endian header + one IFD carrying just the geometry —
        // metadata fixtures need no pixel strips
        out.write("II".getBytes("US-ASCII")); wle16(42); wle32(8)
        wle16(2) // two entries
        wle16(256); wle16(3); wle32(1); wle16(width); wle16(0)
        wle16(257); wle16(4); wle32(1); wle32(height) // LONG spelling too
        wle32(0) // no next IFD
      case "pnm" =>
        out.write(s"P6\n# fixture\n$width $height\n255\n"
          .getBytes("US-ASCII")) // header only: meta parsing needs no raster
      case other =>
        throw new IllegalArgumentException(s"unknown fixture format: $other")
    }
    out.toByteArray
  }
}
