package graft.functions

/** mp4_meta: ISO-BMFF box walk — fixture round trips, version-1 mvhd,
  * largesize and to-EOF boxes, audio-only files, refusal matrix, and
  * the codegen path. */
class Mp4MetaSpec extends graft.SparkFunSuite {

  test("fixture round trip across codecs, durations, geometries, timescales") {
    for {
      codec <- Seq("avc1", "hev1", "vp09", "av01")
      (ms, ts) <- Seq((1000L, 1000), (90000L, 90000), (12345L, 600))
    } {
      val b = Mp4Meta.encode("isom", ms, codec, 1920, 1080, timescale = ts)
      val m = Mp4Meta.parse(b)
      assert(m != null, s"$codec/$ts")
      val (brand, dur, c, w, h) = m
      assert(brand == "isom" && c == codec && w == 1920 && h == 1080)
      // duration round-trips through the timescale with floor rounding
      assert(math.abs(dur - ms) <= (1000 / math.min(ts, 1000)).max(1),
        s"dur=$dur ms=$ms ts=$ts")
    }
    // exact when the timescale divides 1000
    val exact = Mp4Meta.parse(Mp4Meta.encode("mp42", 4321, "avc1", 320, 180))
    assert(exact._1 == "mp42" && exact._2 == 4321)
  }

  test("version-1 mvhd, 64-bit largesize, and to-EOF boxes parse") {
    def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >> 32) ++ be32(v & 0xffffffffL)
    // hand-built: ftyp, then an mvhd v1 inside a moov with largesize,
    // then an mdat with size 0 (extends to EOF)
    val ftyp = be32(16) ++ "ftypisom".getBytes("ISO-8859-1") ++ be32(0)
    val mvhdPayload = Array[Byte](1, 0, 0, 0) ++ // version 1
      be64(0) ++ be64(0) ++ be32(1000) ++ be64(7500) ++ new Array[Byte](80)
    val mvhd = be32(8 + mvhdPayload.length) ++ "mvhd".getBytes("ISO-8859-1") ++
      mvhdPayload
    val moovInner = mvhd
    val moov = be32(1) ++ "moov".getBytes("ISO-8859-1") ++
      be64(16 + moovInner.length) ++ moovInner // largesize spelling
    val mdat = be32(0) ++ "mdat".getBytes("ISO-8859-1") ++
      Array[Byte](1, 2, 3) // size 0: to EOF
    val m = Mp4Meta.parse(ftyp ++ moov ++ mdat)
    assert(m != null)
    assert(m._1 == "isom" && m._2 == 7500 && m._3 == null && m._4 == 0)
  }

  test("refusals: non-bmff, truncated boxes, lying sizes") {
    assert(Mp4Meta.parse("RIFF....WEBP definitely".getBytes("US-ASCII")) == null)
    assert(Mp4Meta.parse(null) == null)
    val ok = Mp4Meta.encode("isom", 1000, "avc1", 64, 64)
    // a cut inside the metadata refuses; a cut that only clips the
    // trailing mdat payload still yields full metadata (tolerance a
    // crawl wants — media bytes truncate constantly, headers survive)
    for (cut <- Seq(ok.length / 2, 10))
      assert(Mp4Meta.parse(ok.take(cut)) == null, s"cut=$cut")
    assert(Mp4Meta.parse(ok.take(ok.length - 1)) != null)
    val lying = ok.clone()
    lying(0) = 0x7f // ftyp size becomes enormous
    assert(Mp4Meta.parse(lying) == null)
  }

  test("mp4_meta through a parquet scan under codegen; NULL for junk") {
    import spark.implicits._
    Registry.install(spark)
    val dir = scratch("mp4meta")
    Seq(
      (1L, Mp4Meta.encode("isom", 2500, "hev1", 640, 360)),
      (2L, "junk".getBytes("US-ASCII")))
      .toDF("id", "content").write.parquet(dir)
    val rows = spark.read.parquet(dir)
      .selectExpr("id", "mp4_meta(content) AS m")
      .selectExpr("id", "m.brand", "m.duration_ms", "m.codec", "m.width")
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "isom" && rows(0).getLong(2) == 2500 &&
      rows(0).getString(3) == "hev1" && rows(0).getInt(4) == 640)
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(3))
  }
}
