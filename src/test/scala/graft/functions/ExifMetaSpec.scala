package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** exif_meta: EXIF/GPS extraction. Fixtures splice real APP1 bodies
  * (both byte orders) into REAL JPEGs from the in-house encoder, and
  * each spliced file must still pixel-decode; GPS decimal degrees and
  * the DateTimeOriginal-wins rule are pinned.
  */
class ExifMetaSpec extends AnyFunSuite {

  private def jpeg: Array[Byte] =
    graft.operators.JpegCodec.encodeJpeg(16, 16,
      (x, y) => ((x * 16) % 256, (y * 16) % 256, 128))

  test("JPEG APP1 walk, both byte orders, full field set") {
    for (le <- Seq(true, false)) {
      val body = ExifMeta.encodeExifBody(le, orientation = 6,
        datetime = "2024:05:17 10:30:00", make = "GraftCam",
        model = "GC-1000",
        gps = Some((52, 30, 36, false, 13, 24, 54, false)))
      val m = ExifMeta.parse(ExifMeta.withExif(jpeg, body))
      assert(m != null, s"le=$le")
      assert(m.orientation == 6, s"le=$le")
      assert(m.datetime == "2024:05:17 10:30:00", s"le=$le")
      assert(m.make == "GraftCam" && m.model == "GC-1000", s"le=$le")
      assert(m.gpsLat == 52 + 30 / 60.0 + 36 / 3600.0, s"le=$le")
      assert(m.gpsLon == 13 + 24 / 60.0 + 54 / 3600.0, s"le=$le")
    }
  }

  test("southern/western hemispheres negate; spliced JPEG still decodes") {
    val body = ExifMeta.encodeExifBody(le = true, orientation = 1,
      datetime = "2020:01:01 00:00:00", make = "GraftCam", model = "GC-2",
      gps = Some((33, 51, 54, true, 151, 12, 36, false)))
    val tagged = ExifMeta.withExif(jpeg, body)
    val m = ExifMeta.parse(tagged)
    assert(m.gpsLat == -(33 + 51 / 60.0 + 54 / 3600.0))
    assert(m.gpsLon == 151 + 12 / 60.0 + 36 / 3600.0)
    // the EXIF segment must not break pixel decode
    val decoded = graft.operators.JpegCodec.decode(tagged)
    assert(decoded.isDefined)
  }

  test("DateTimeOriginal (capture time) wins over IFD0 DateTime") {
    val body = ExifMeta.encodeExifBody(le = true, orientation = 1,
      datetime = "2024:06:01 09:00:00", make = "GraftCam", model = "GC-3",
      gps = None, dateTimeOriginal = "2019:12:31 23:59:59")
    val m = ExifMeta.parse(ExifMeta.withExif(jpeg, body))
    assert(m.datetime == "2019:12:31 23:59:59")
  }

  test("bare TIFF-structure payloads parse at offset 0") {
    val body = ExifMeta.encodeExifBody(le = false, orientation = 3,
      datetime = "2021:07:04 12:00:00", make = "ScanrX", model = "S-9000",
      gps = None)
    val m = ExifMeta.parse(body)
    assert(m != null && m.orientation == 3 && m.make == "ScanrX")
    assert(m.gpsLat == null && m.gpsLon == null)
  }

  test("images without EXIF and non-images refuse to NULL") {
    assert(ExifMeta.parse(null) == null)
    assert(ExifMeta.parse(Array.emptyByteArray) == null)
    assert(ExifMeta.parse(jpeg) == null) // a real JPEG, no APP1
    assert(ExifMeta.parse("PNG-ish not a jpeg at all".getBytes) == null)
  }

  test("hostile offsets refuse the field, never the row") {
    val body = ExifMeta.encodeExifBody(le = true, orientation = 8,
      datetime = "2022:02:02 02:02:02", make = "GraftCam", model = "GC-4",
      gps = Some((1, 2, 3, false, 4, 5, 6, false)))
    val tagged = ExifMeta.withExif(jpeg, body)
    // blow up the GPS IFD pointer value (points past the payload)
    val s = tagged.clone()
    // find the GPS tag 0x8825 little-endian (25 88) and wreck its value
    var at = -1
    for (i <- 0 until s.length - 12)
      if (at < 0 && (s(i) & 0xff) == 0x25 && (s(i + 1) & 0xff) == 0x88)
        at = i
    assert(at > 0)
    s(at + 8) = 0xff.toByte; s(at + 9) = 0xff.toByte
    val m = ExifMeta.parse(s)
    assert(m != null && m.orientation == 8) // row survives
    assert(m.gpsLat == null && m.gpsLon == null) // field refuses
  }

  test("value offsets near Int.MaxValue cannot wrap the bounds math") {
    // Make (ASCII, count 64) pointing at 0x7ffffff0: base+off stays
    // positive but off+count wraps an Int sum negative, which would
    // pass the old o+count>limit guard and index out of bounds.
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val body = "II".getBytes("US-ASCII") ++ le16(42) ++ le32(8) ++
      le16(1) ++ // one IFD0 entry
      le16(0x010f) ++ le16(2) ++ le32(64) ++ le32(0x7ffffff0) ++
      le32(0) // no next IFD
    val m = ExifMeta.parse(ExifMeta.withExif(jpeg, body))
    assert(m != null) // row survives
    assert(m.make == null) // hostile field refuses
  }
}
