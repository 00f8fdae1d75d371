package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.plans.{Qualify, QueryCompiler}

/** Property-based invariants (ScalaCheck) for the pure transforms and the
  * native expressions. Runs the checker directly (the scalatest bridge
  * artifact is not in the offline cache). */
class PropertySpec extends SparkFunSuite {

  private def check(p: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val ident: Gen[String] =
    Gen.identifier.suchThat(_.nonEmpty).map(_.take(12))

  test("property: SQL without QUALIFY always passes through unchanged") {
    check(Prop.forAll(ident, ident, Gen.choose(0, 1000)) { (t, c, n) =>
      val sql = s"SELECT $c FROM $t WHERE $c > $n ORDER BY $c LIMIT 10"
      Qualify.desugar(sql) == sql
    })
  }

  test("property: QUALIFY predicate always lands in the outer WHERE") {
    check(Prop.forAll(ident, Gen.choose(1, 99)) { (c, k) =>
      val out = Qualify.desugar(
        s"SELECT $c, row_number() OVER (ORDER BY $c) AS rn FROM t QUALIFY rn <= $k")
      out.contains(s"__qualify WHERE rn <= $k") &&
        !out.toUpperCase.split("__QUALIFY")(1).contains("QUALIFY ")
    })
  }

  test("property: AT(TIMESTAMP => e) rewrite preserves the inner expression") {
    val exprGen = Gen.oneOf(
      "'2024-01-30'",
      "CURRENT_TIMESTAMP()",
      "CURRENT_TIMESTAMP() - INTERVAL 1 DAY",
      "to_timestamp('2024-01-30 00:00:00')")
    check(Prop.forAll(ident, exprGen) { (t, e) =>
      QueryCompiler.compile(s"SELECT * FROM $t AT(TIMESTAMP => $e)") ==
        s"SELECT * FROM $t TIMESTAMP AS OF $e"
    })
  }

  test("property: cosine_sim is symmetric, bounded, and scale-invariant") {
    graft.functions.Registry.install(spark)
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.choose(-10.0, 10.0))
      .suchThat(v => v.exists(math.abs(_) > 1e-3))
    check(Prop.forAll(vecGen, vecGen, Gen.choose(0.5, 4.0)) { (a, b, s) =>
      val df = Seq((a.toArray, b.toArray, a.map(_ * s).toArray)).toDF("a", "b", "a2")
      val row = df.selectExpr(
        "cosine_sim(a, b)", "cosine_sim(b, a)", "cosine_sim(a2, b)").head()
      val (ab, ba, a2b) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      ab == ba &&
        ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9 &&
        math.abs(ab - a2b) < 1e-9 // positive scaling preserves cosine
    }, n = 20)
  }

  test("property: minhash bands are deterministic with the declared band count") {
    graft.functions.Registry.install(spark)
    import spark.implicits._
    val shingleSet = Gen.nonEmptyListOf(Gen.identifier.map(_.take(8))).map(_.distinct)
    check(Prop.forAll(shingleSet) { sh =>
      val df = Seq((1L, sh), (2L, sh)).toDF("id", "sh")
      val out = df.selectExpr("minhash_bands(sh, 64, 16) AS b")
        .collect().map(_.getSeq[Long](0))
      out(0).length == 16 && out(0) == out(1)
    }, n = 15)
  }

  test("property: partition fields round-trip through their serialized form") {
    import graft.table.PartitionFields
    val field = Gen.oneOf(
      ident.map(PartitionFields.Identity(_): PartitionFields.Field),
      Gen.zip(Gen.choose(1, 4096), ident)
        .map { case (n, c) => PartitionFields.Bucket(n, c): PartitionFields.Field },
      Gen.zip(Gen.choose(1, 4096), ident)
        .map { case (w, c) => PartitionFields.Truncate(w, c): PartitionFields.Field },
      Gen.zip(Gen.oneOf("hours", "days", "months", "years"), ident)
        .map { case (u, c) => PartitionFields.TimeUnit(u, c): PartitionFields.Field })
    check(Prop.forAll(field) { f =>
      PartitionFields.parse(f.name) == f &&
        !f.dirKey.exists("(),".contains(_)) // dir keys never need path escaping
    })
  }

  test("property: bucket ids are in range and match pmod(hash(col), n)") {
    import graft.table.BucketFunction
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(24, Gen.long), Gen.choose(1, 256)) { (vs, n) =>
      val got = vs.map(v => BucketFunction.bucketId(java.lang.Long.valueOf(v), n))
      val expected = vs.toDF("v")
        .selectExpr(s"pmod(hash(v), $n)").collect().map(_.getInt(0)).toList
      got.forall(b => b >= 0 && b < n) && got == expected
    }, n = 10)
  }

  test("property: graft stream offsets round-trip through JSON") {
    import graft.table.GraftStreamOffset
    check(Prop.forAll(Gen.choose(-1, Int.MaxValue), Gen.choose(0, Int.MaxValue)) {
      (v, f) =>
        val o = GraftStreamOffset(v, f)
        GraftStreamOffset.fromJson(o.json()) == o
    })
    // pre-admission-control checkpoints (no files field) parse as
    // version-fully-consumed
    assert(GraftStreamOffset.fromJson("""{"version":7}""") ==
      GraftStreamOffset(7, Int.MaxValue))
  }

  test("property: pixel codecs round-trip random images, and ImageIO agrees") {
    import graft.operators.PixelCodec
    // random dims and a random color generator: every encoder/decoder
    // pair must reproduce the exact pixels, and the JDK's independent
    // readers must see the same ones (no compensating-bug pairs)
    val dimGen = Gen.choose(1, 20)
    val seedGen = Gen.choose(0, 1000000)
    def pxFor(seed: Int): (Int, Int) => (Int, Int, Int) = (x, y) => {
      val h = seed * 31 + x * 131 + y * 17
      ((h & 0xff), ((h >> 8) & 0xff), ((h >> 16) & 0xff))
    }
    def imageIoRgb(bytes: Array[Byte]): Array[Byte] = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val out = new Array[Byte](img.getWidth * img.getHeight * 3)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val argb = img.getRGB(x, y)
        val i = (y * img.getWidth + x) * 3
        out(i) = ((argb >> 16) & 0xff).toByte
        out(i + 1) = ((argb >> 8) & 0xff).toByte
        out(i + 2) = (argb & 0xff).toByte
      }
      out
    }
    check(Prop.forAll(dimGen, dimGen, seedGen, Gen.choose(0, 3)) {
      (w, h, seed, fmt) =>
        // GIF needs ≤256 distinct colors, so its generator is quantized
        val px: (Int, Int) => (Int, Int, Int) =
          if (fmt == 2) (x, y) => {
            val t = pxFor(seed)(x, y); (t._1 & 0xf0, t._2 & 0xf0, 0)
          }
          else pxFor(seed)
        val bytes = fmt match {
          case 0 => PixelCodec.encodeBmp(w, h, px, topDown = seed % 2 == 0)
          case 1 => PixelCodec.encodePng(w, h, px, withAlpha = seed % 2 == 0)
          case 2 => PixelCodec.encodeGif(w, h, px)
          case _ => graft.operators.WebpCodec.encodeWebpLossless(w, h, px,
            subtractGreen = seed % 2 == 0)
        }
        val img = PixelCodec.decode(bytes).get
        val expected = new Array[Byte](w * h * 3)
        for (y <- 0 until h; x <- 0 until w) {
          val (r, g, b) = px(x, y)
          expected((y * w + x) * 3) = r.toByte
          expected((y * w + x) * 3 + 1) = g.toByte
          expected((y * w + x) * 3 + 2) = b.toByte
        }
        img.width == w && img.height == h &&
          img.rgb.sameElements(expected) &&
          // no JDK WebP reader: VP8L skips the ImageIO cross-check and
          // relies on WebpCodecSpec's hand-crafted spec streams instead
          (fmt == 3 || imageIoRgb(bytes).sameElements(expected))
    }, n = 80)
  }

  test("property: block-constant JPEGs round-trip bit-exactly at any shape") {
    import graft.operators.{JpegCodec, PixelCodec}
    // all-ones quant + per-8x8-block-constant image → DC-only blocks →
    // exact decode for ANY dims/base (the q47 oracle's foundation)
    check(Prop.forAll(Gen.choose(1, 40), Gen.choose(1, 25),
      Gen.choose(0, 200)) { (w, h, base) =>
      val px = (x: Int, y: Int) => {
        val v = base + 5 * (x / 8) + 3 * (y / 8)
        (v, v, v)
      }
      val img = PixelCodec.decode(JpegCodec.encodeJpeg(w, h, px, gray = true)).get
      img.width == w && img.height == h &&
        (0 until h).forall(y => (0 until w).forall { x =>
          (img.rgb((y * w + x) * 3) & 0xff) == base + 5 * (x / 8) + 3 * (y / 8)
        })
    }, n = 40)
  }

  test("property: WAV PCM round-trips exactly for random samples") {
    import graft.operators.AudioCodec
    check(Prop.forAll(Gen.choose(1, 200), Gen.choose(1, 3),
      Gen.choose(0, 1000000)) { (frames, ch, seed) =>
      val rnd = new scala.util.Random(seed)
      val samples = Array.fill(frames * ch)(rnd.nextInt(65536) - 32768)
      val clip = AudioCodec.decode(
        AudioCodec.encodeWav(8000 + seed % 40000, ch, samples)).get
      clip.channels == ch && clip.frames == frames &&
        clip.samples.sameElements(samples)
    }, n = 60)
  }

  test("property: video frame sampling returns exactly the right frames") {
    import graft.operators.VideoCodec
    // both containers, random frame counts and strides: sampled indices
    // must be 0, s, 2s, … and each sampled frame must be the RIGHT one
    check(Prop.forAll(Gen.choose(1, 12), Gen.choose(1, 13),
      Gen.choose(0, 1), Gen.choose(0, 150)) { (nf, stride, kind, base) =>
      val px = (f: Int, x: Int, y: Int) =>
        (base / 2 + 7 * f + x, 10 + y, 20 + f)
      val bytes =
        if (kind == 0) VideoCodec.encodeAvi(5, 4, nf, px)
        else VideoCodec.encodeGifAnim(5, 4, nf, px)
      val clip = VideoCodec.decodeSampled(bytes, stride).get
      val wantIdx = (0 until nf by stride).toArray
      clip.totalFrames == nf && clip.sampledIdx.sameElements(wantIdx) &&
        clip.frames.zip(wantIdx).forall { case (frame, fi) =>
          // spot-check a pixel that encodes the frame index
          (frame.rgb(2) & 0xff) == 20 + fi &&
            (frame.rgb(0) & 0xff) == base / 2 + 7 * fi
        }
    }, n = 60)
  }

  test("property: resizeBox2 equals the naive per-block reference") {
    import graft.operators.PixelCodec
    check(Prop.forAll(Gen.choose(1, 17), Gen.choose(1, 13),
      Gen.choose(0, 1000000)) { (w, h, seed) =>
      val rnd = new scala.util.Random(seed)
      val rgb = Array.fill[Byte](w * h * 3)(rnd.nextInt(256).toByte)
      val img = PixelCodec.PixelImage(w, h, rgb)
      val small = PixelCodec.resizeBox2(img)
      val ow = (w + 1) / 2
      val oh = (h + 1) / 2
      small.width == ow && small.height == oh &&
        (0 until oh).forall(j => (0 until ow).forall { i =>
          (0 until 3).forall { c =>
            val xs = Seq(2 * i, 2 * i + 1).filter(_ < w)
            val ys = Seq(2 * j, 2 * j + 1).filter(_ < h)
            val vals = for (y <- ys; x <- xs) yield rgb((y * w + x) * 3 + c) & 0xff
            (small.rgb((j * ow + i) * 3 + c) & 0xff) == vals.sum / vals.size
          }
        })
    }, n = 60)
  }

  test("property: corrupt media bytes never throw in any codec") {
    import graft.operators.{PixelCodec, JpegCodec, WebpCodec, AudioCodec, VideoCodec}
    // the 100 TB contract: corrupt media is DATA — every decoder returns
    // None (or a structurally valid result) on arbitrary mutations of
    // valid payloads, never an exception. Mutations hit header, tables,
    // and entropy regions alike.
    val px = (x: Int, y: Int) => (10 + x, 20 + y, 30 + x + y)
    val valid: Seq[Array[Byte]] = Seq(
      PixelCodec.encodeBmp(6, 5, px),
      PixelCodec.encodePng(6, 5, px),
      PixelCodec.encodeGif(6, 5, px),
      JpegCodec.encodeJpeg(16, 16, px, gray = true),
      WebpCodec.encodeWebpLossless(6, 5, px),
      AudioCodec.encodeWav(8000, 2, Array.tabulate(40)(i => i * 7 - 100)),
      VideoCodec.encodeAvi(4, 3, 3, (f, x, y) => px(x + f, y)))
    check(Prop.forAll(Gen.choose(0, valid.size - 1), Gen.choose(0, 1000000),
      Gen.choose(1, 6)) { (which, seed, nFlips) =>
      val b = valid(which).clone()
      val rnd = new scala.util.Random(seed)
      for (_ <- 0 until nFlips)
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      // decode through every entry point: must return, not throw
      PixelCodec.decode(b)
      AudioCodec.decode(b)
      VideoCodec.decodeSampled(b, 2)
      true
    }, n = 200)
  }

  test("property: word_shingles == first-occurrence-distinct(word_ngrams) on random texts") {
    import org.apache.spark.unsafe.types.UTF8String
    val word: Gen[String] = Gen.choose(1, 4)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("ab".toSeq)).map(_.mkString))
    val text: Gen[String] = Gen.choose(0, 12)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    check(Prop.forAll(text, Gen.choose(1, 4)) { (t, n) =>
      val u = UTF8String.fromString(t)
      val grams = graft.functions.WordNgrams.compute(u, n)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString)
      val shingles = graft.functions.WordShingles.compute(u, n)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString)
      // the dedup relationship the two kernels promise by construction
      shingles.toSeq == grams.toSeq.distinct &&
        // gram count: max(words - n + 1, 0) with multiplicity
        grams.length == math.max(t.split(" ", -1).length - n + 1, 0)
    }, n = 200)
  }

  test("property: top_gram_frac is in [1/grams, 1] and 1.0 iff all grams equal") {
    import org.apache.spark.unsafe.types.UTF8String
    val word: Gen[String] = Gen.oneOf("x", "y", "z")
    val text: Gen[String] = Gen.choose(1, 20)
      .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))
    check(Prop.forAll(text, Gen.choose(1, 3)) { (t, n) =>
      val u = UTF8String.fromString(t)
      val grams = graft.functions.WordNgrams.compute(u, n)
        .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString)
      val f = graft.functions.TopGramFrac.compute(u, n)
      if (grams.isEmpty) f == 0.0
      else f >= 1.0 / grams.length - 1e-12 && f <= 1.0 &&
        ((f == 1.0) == grams.toSet.size.==(1))
    }, n = 200)
  }

  test("property: scale-probe substitution targets are pairwise distinct") {
    // the probe's linear-scaling claim for near-dup queries rests on
    // copies being decorrelated: two copies sharing a substitution would
    // be full cross-copy near-dups and quadratically inflate pair counts
    val targets = (0 until 200).map(ScaleProbe.substFor)
    assert(targets.distinct.size == targets.size,
      s"colliding substitutions: ${targets.groupBy(identity).filter(_._2.size > 1).keys}")
    // and every target is 5 lowercase letters (tokenizers must not split)
    assert(targets.forall(t => t.length == 5 && t.forall(c => c >= 'a' && c <= 'z')))
  }
}
