package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Systematic never-throw fuzz over EVERY binary parser and decoder
  * (round 20). The per-parser specs pin exact semantics; this spec pins
  * the one contract they all share — hostile bytes refuse (NULL/None/
  * empty), never throw — by mutating REAL valid payloads from the
  * in-house encoders, which reaches deep parse paths that pure random
  * bytes never enter (length fields, offset tables, nested containers).
  *
  * Mutation classes per seed, deterministic (fixed-seed RNG):
  *  - byte flips (1–8 random positions);
  *  - truncation at a random cut;
  *  - a random 4-byte window overwritten with 0xFF / 0x7F 0xFF 0xFF 0xFF
  *    (the length-field overflow shapes the round-20 ADVICE fixes
  *    hardened against);
  *  - a splice of two different seeds at random offsets;
  *  - random garbage of the seed's length.
  *
  * A failure prints the parser, mutation class, and a reproducible
  * hex prefix.
  */
class ParserFuzzSpec extends AnyFunSuite {

  private val VariantsPerSeed = 120

  private def jpegSeed: Array[Byte] =
    graft.operators.JpegCodec.encodeJpeg(16, 16,
      (x, y) => ((x * 16) % 256, (y * 16) % 256, 128))

  private def emlSeed: Array[Byte] =
    EmlText.encodeEml("Fuzz subject", "f@example.com",
      "Thu, 01 Feb 2024 10:00:00 +0000", "A plain body with café text.")

  // (name, seeds, parse) — parse must refuse hostile input, never throw
  private lazy val parsers: Seq[(String, Seq[Array[Byte]], Array[Byte] => Any)] = Seq(
    ("mp3_meta", Seq(
      Mp3Meta.encode("1", 3, 44100, Seq(128), frames = 6),
      Mp3Meta.encode("2.5", 3, 8000, Seq(32, 64), frames = 9, xing = true,
        id3Size = 64)),
      Mp3Meta.parse),
    ("aac_meta", Seq(
      AacMeta.encode("LC", 44100, 2, frameSizes = Seq(250), frames = 8),
      AacMeta.encode("LC", 48000, 1, Seq(100), frames = 5, crc = true)),
      AacMeta.parse),
    ("ogg_meta", Seq(
      OggMeta.encode("vorbis", 44100, 2, samples = 44100,
        title = "T", artist = "A"),
      OggMeta.encode("opus", 48000, 1, samples = 9600, preSkip = 312)),
      OggMeta.parse),
    ("id3_tags", Seq(
      Id3Tags.encodeV2(3, title = "Title", artist = "Artist", album = "Al"),
      Id3Tags.encodeV2(4, title = "Tï", artist = "A"),
      Id3Tags.encodeV1(title = "Old", artist = "Tag")),
      Id3Tags.parse),
    ("mkv_meta", Seq(MkvMeta.encode("matroska", 5000, title = "Fuzz")),
      MkvMeta.parse),
    ("mp4_meta", Seq(Mp4Meta.encode("isom", 1000, "avc1", 640, 480)),
      Mp4Meta.parse),
    ("flac_meta", Seq(graft.operators.FlacCodec.encodeFlac(8000, 1, 16,
      Array.tabulate(512)(i => ((i * 37) % 256) - 128))),
      FlacMeta.parse),
    ("exif_meta", Seq(ExifMeta.withExif(jpegSeed,
      ExifMeta.encodeExifBody(le = true, orientation = 6,
        datetime = "2024:05:17 10:30:00", make = "GraftCam", model = "GC-1",
        gps = Some((52, 30, 36, false, 13, 24, 54, false))))),
      ExifMeta.parse),
    ("pdf_text", Seq(
      PdfText.encodePdf(Seq("hello fuzz world")),
      // the deep container spellings: xref STREAMS with predictors +
      // object streams, CID fonts through ToUnicode, and an AES-256
      // encrypted body — mutations of these reach the decrypt/inflate/
      // CMap paths plain seeds never enter
      PdfText.encodePdf(Seq(Seq("xref stream page")), xrefStream = true,
        xrefPredictor = true, objStm = true),
      PdfText.encodePdf(Seq(Seq("cid text")), cidFont = true,
        cidToUnicode = true),
      PdfText.encodePdf(Seq(Seq("secret body")), encrypt = "aes256")),
      PdfText.pdfText),
    ("docx_text", Seq(OfficeText.encodeDocx(Seq("alpha beta", "gamma"))),
      OfficeText.docxText),
    ("epub_text", Seq(OfficeText.encodeEpub(Seq("chapter one", "two"))),
      OfficeText.epubText),
    ("xlsx_text", Seq(OfficeText.encodeXlsx(Seq(
      Seq(Seq(("s", "alpha"), ("num", "42")), Seq(("inline", "in line"))),
      Seq(Seq(("str", "=f")))), richShared = true)),
      OfficeText.xlsxText),
    ("pptx_text", Seq(OfficeText.encodePptx(Seq(Seq("slide one", "para"),
      Seq("slide two")))),
      OfficeText.pptxText),
    ("sniff_text", Seq(
      "<html><head><meta charset=\"windows-1252\"></head>café"
        .getBytes(java.nio.charset.Charset.forName("windows-1252")),
      Array[Byte](-1, -2, 104, 0, 105, 0)), // UTF-16LE BOM
      CharsetSniff.sniff),
    ("sitemap_urls", Seq(
      Sitemap.encodeSitemap(Seq(("https://a.com/x", "2024-01-01", "daily",
        java.lang.Double.valueOf(0.5)), ("https://a.com/y", null, null, null))),
      Sitemap.encodeSitemap(Seq(("https://a.com/s.xml.gz", null, null, null)),
        index = true, gz = true)),
      Sitemap.parse),
    ("mbox_split", Seq(MboxSplit.encodeMbox(Seq(
      ("a@b.c Thu Jan  1 00:00:00 2024", emlSeed),
      ("d@e.f Fri Jan  2 00:00:00 2024", emlSeed)))),
      MboxSplit.split),
    ("eml_text", Seq(emlSeed), EmlText.parse),
    ("jpeg_decode", Seq(jpegSeed), graft.operators.JpegCodec.decode),
    ("pixel_decode", Seq(
      graft.operators.PixelCodec.encodePng(8, 8, (x, y) => (x * 30, y * 30, 7)),
      graft.operators.PixelCodec.encodeBmp(8, 8, (x, y) => (x, y, 0)),
      graft.operators.PixelCodec.encodeGif(8, 8,
        (x, y) => ((x * 30) % 256, (y * 30) % 256, 9))),
      graft.operators.PixelCodec.decode),
    ("webp_decode", Seq(graft.operators.WebpCodec.encodeWebpLossless(8, 8,
      (x, y) => (x * 31 % 256, y * 29 % 256, 5))),
      graft.operators.WebpCodec.decode),
    ("tiff_decode", Seq(
      graft.operators.TiffCodec.encodeTiffGray(8, 8,
        (x, y) => (x * 31 + y * 7) % 256, compression = "lzw"),
      graft.operators.TiffCodec.encodeTiffG4(16, 8,
        (x, y) => (x + y) % 3 == 0)),
      graft.operators.TiffCodec.decode),
    ("audio_decode", Seq(
      graft.operators.AudioCodec.encodeWav(8000, 1,
        Array.tabulate(256)(i => ((i * 97) % 4096) - 2048)),
      graft.operators.AudioCodec.encodeWavUlaw(8000,
        Array.tabulate(64)(i => (i * 3).toByte))),
      graft.operators.AudioCodec.decode),
    ("video_decode", Seq(
      graft.operators.VideoCodec.encodeAvi(8, 8, 3,
        (f, x, y) => ((x * 20 + f) % 256, (y * 20) % 256, 10)),
      graft.operators.VideoCodec.encodeGifAnim(8, 8, 3,
        (f, x, y) => ((x * 30 + f * 5) % 256, (y * 30) % 256, 9)),
      graft.operators.VideoCodec.encodeWebpAnim(8, 8, Seq(
        graft.operators.VideoCodec.WebpFrame(0, 0, 8, 8,
          argb = (x, y) => 0xff000000 | ((x * 20) << 16) | ((y * 20) << 8) | 5),
        graft.operators.VideoCodec.WebpFrame(2, 2, 4, 4,
          argb = (_, _) => 0xffc8d2dc)))),
      (b: Array[Byte]) => graft.operators.VideoCodec.decodeSampled(b, 1)))

  private def hex(b: Array[Byte], n: Int = 48): String =
    b.take(n).map(x => f"${x & 0xff}%02x").mkString

  test("mutated valid payloads never throw out of any parser") {
    val rnd = new scala.util.Random(20240816L)
    val allSeeds = parsers.flatMap(_._2)
    for ((name, seeds, parse) <- parsers; (seed, si) <- seeds.zipWithIndex) {
      for (v <- 0 until VariantsPerSeed) {
        val kind = v % 5
        val b: Array[Byte] = kind match {
          case 0 => // byte flips
            val m = seed.clone()
            for (_ <- 0 to rnd.nextInt(8))
              if (m.nonEmpty) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
            m
          case 1 => // truncation
            java.util.Arrays.copyOf(seed, rnd.nextInt(seed.length max 1))
          case 2 => // length-field overflow window
            val m = seed.clone()
            if (m.length >= 4) {
              val at = rnd.nextInt(m.length - 3)
              val pat =
                if (rnd.nextBoolean()) Array[Byte](-1, -1, -1, -1)
                else Array[Byte](0x7f, -1, -1, -1)
              System.arraycopy(pat, 0, m, at, 4)
            }
            m
          case 3 => // splice two seeds
            val other = allSeeds(rnd.nextInt(allSeeds.length))
            val cutA = rnd.nextInt(seed.length max 1)
            val cutB = rnd.nextInt(other.length max 1)
            seed.take(cutA) ++ other.drop(cutB)
          case _ => // pure garbage, seed-sized
            val m = new Array[Byte](seed.length min 4096)
            rnd.nextBytes(m)
            m
        }
        try parse(b)
        catch {
          case e: Throwable =>
            fail(s"$name seed=$si variant=$v kind=$kind threw $e; " +
              s"payload[${b.length}]=${hex(b)}")
        }
      }
      // null and empty are always refusals, never throws
      if (name != "mbox_split") // split takes non-null per its Expr contract
        try { parse(Array.emptyByteArray); () }
        catch { case e: Throwable => fail(s"$name threw on empty: $e") }
    }
  }

  test("string parsers never throw on hostile text") {
    val rnd = new scala.util.Random(77L)
    val seeds = Seq(
      "<html><body><p>hello <a href=x>link</a></p><nav>menu</nav></body>",
      "https://user:p@ss@exämple.com:8080/a/../b/./c?q=1#frag",
      "User-agent: *\nDisallow: /private$\nAllow: /private/ok*",
      "Subject: =?UTF-8?B?Zm9v?=\n\nbody")
    def mutate(s: String): String = {
      val cs = s.toCharArray
      for (_ <- 0 to rnd.nextInt(6))
        if (cs.nonEmpty)
          cs(rnd.nextInt(cs.length)) = (rnd.nextInt(0xfff) + 1).toChar
      new String(cs).take(rnd.nextInt(s.length max 1))
    }
    for (_ <- 0 until 300; s0 <- seeds) {
      val s = mutate(s0)
      try {
        HtmlText.extract(s); MainText.extract(s); UrlParts.parse(s)
        RobotsTxt.allowed(s, "bot", "/a/b"); ()
      } catch {
        case e: Throwable => fail(s"string parser threw on ${s.take(60)}: $e")
      }
    }
  }
}
