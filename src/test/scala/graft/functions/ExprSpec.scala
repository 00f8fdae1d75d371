package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class ExprSpec extends SparkFunSuite {
  import spark.implicits._

  test("cosine_sim matches a hand-computed value and is symmetric") {
    Registry.install(spark)
    val df = Seq((Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0))).toDF("a", "b")
    val Array(row) = df.selectExpr("cosine_sim(a, b)", "cosine_sim(b, a)").collect()
    val expected = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(row.getDouble(0) - expected) < 1e-12)
    assert(row.getDouble(0) == row.getDouble(1))
  }

  test("cosine_sim of identical vectors is 1") {
    Registry.install(spark)
    val df = Seq(Tuple1(Array.tabulate(64)(i => i / 7.0 + 0.1))).toDF("a")
    val sim = df.selectExpr("cosine_sim(a, a)").as[Double].head()
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("image_meta parses real container headers and nulls corrupt bytes") {
    Registry.install(spark)
    // round-trip through the fixture encoder for each container
    val fixtures = Seq(
      ("png", 640, 480), ("jpeg", 1, 1), ("jpeg", 1920, 1080),
      ("gif", 320, 200), ("png", 65535, 1),
      ("webp", 800, 600), ("webp", 1, 1), ("webp", 16383, 16383),
      ("bmp", 1024, 768), ("bmp", 1, 1), ("bmp", 65535, 65535),
      ("tiff", 2480, 3508), ("tiff", 1, 1), ("tiff", 65535, 65535),
      ("pnm", 640, 480), ("pnm", 1, 1))
    val enc = fixtures.map { case (f, w, h) => (f, w, h, ImageMeta.encode(f, w, h)) }
    val got = enc.toDF("f", "w", "h", "content")
      .selectExpr("f", "w", "h", "image_meta(content) AS m")
      .selectExpr("f", "w", "h", "m.format", "m.width", "m.height")
      .collect()
    got.foreach { r =>
      assert(r.getString(3) == r.getString(0), s"format mismatch: $r")
      assert(r.getInt(4) == r.getInt(1) && r.getInt(5) == r.getInt(2),
        s"dimensions mismatch: $r")
    }

    // a PROGRESSIVE jpeg (SOF2) and one with extra leading segments must
    // parse through the segment walk, not a fixed offset
    val base = ImageMeta.encode("jpeg", 123, 45)
    val progressive = base.clone(); progressive(21) = 0xc2.toByte // SOF0→SOF2
    val comment = Array(0xff, 0xfe, 0x00, 0x05, 'h', 'i', '!').map(_.toByte)
    val shifted = base.take(2) ++ comment ++ base.drop(2) // COM before APP0
    val special = Seq(Tuple1(progressive), Tuple1(shifted)).toDF("content")
      .selectExpr("image_meta(content) AS m")
      .selectExpr("m.width", "m.height").collect()
    special.foreach(r => assert(r.getInt(0) == 123 && r.getInt(1) == 45, r))

    // a LOSSLESS (VP8L) and an EXTENDED (VP8X) webp must parse too —
    // hand-built since the fixture encoder emits the lossy flavor
    def riff(tag: String, payload: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit =
        o.write(Array(v, v >> 8, v >> 16, v >> 24).map(_.toByte))
      o.write("RIFF".getBytes("US-ASCII")); le32(4 + 8 + payload.length)
      o.write("WEBP".getBytes("US-ASCII")); o.write(tag.getBytes("US-ASCII"))
      le32(payload.length); o.write(payload)
      o.toByteArray
    }
    val vp8lBits = (99 - 1) | ((77 - 1) << 14) // 99x77
    val vp8l = riff("VP8L", Array[Byte](0x2f,
      (vp8lBits & 0xff).toByte, ((vp8lBits >> 8) & 0xff).toByte,
      ((vp8lBits >> 16) & 0xff).toByte, ((vp8lBits >> 24) & 0xff).toByte, 0))
    val vp8x = riff("VP8X", Array[Byte](0, 0, 0, 0, // flags + reserved
      ((300 - 1) & 0xff).toByte, ((300 - 1) >> 8).toByte, 0, // 24-bit LE w-1
      ((200 - 1) & 0xff).toByte, ((200 - 1) >> 8).toByte, 0)) // 24-bit LE h-1
    val flavors = Seq(Tuple1(vp8l), Tuple1(vp8x)).toDF("content")
      .selectExpr("image_meta(content) AS m")
      .selectExpr("m.format", "m.width", "m.height").collect()
    assert(flavors(0).getString(0) == "webp" &&
      flavors(0).getInt(1) == 99 && flavors(0).getInt(2) == 77, flavors(0))
    assert(flavors(1).getString(0) == "webp" &&
      flavors(1).getInt(1) == 300 && flavors(1).getInt(2) == 200, flavors(1))

    // a TOP-DOWN bmp (negative height) reports the magnitude
    val topDown = ImageMeta.encode("bmp", 64, 32)
    val negH = -32
    topDown(22) = (negH & 0xff).toByte; topDown(23) = ((negH >> 8) & 0xff).toByte
    topDown(24) = ((negH >> 16) & 0xff).toByte; topDown(25) = ((negH >> 24) & 0xff).toByte
    val td = Seq(Tuple1(topDown)).toDF("content")
      .selectExpr("image_meta(content) AS m")
      .selectExpr("m.format", "m.width", "m.height").head()
    assert(td.getString(0) == "bmp" && td.getInt(1) == 64 && td.getInt(2) == 32, td)

    // corrupt/unknown content yields NULL, never an exception — at least
    // one corrupt case per supported container
    val badVp8 = ImageMeta.encode("webp", 10, 10)
    badVp8(24) = 0x00 // break the VP8 keyframe sync code
    val coreBmp = ImageMeta.encode("bmp", 10, 10)
    coreBmp(14) = 12; coreBmp(15) = 0 // BITMAPCOREHEADER: out of scope
    val bad = Seq(
      Array.empty[Byte],
      "plain text, no magic".getBytes("UTF-8"),
      ImageMeta.encode("png", 10, 10).take(12), // truncated before IHDR
      Array(0xff, 0xd8, 0xff, 0xd9).map(_.toByte), // SOI then EOI, no frame
      Array(0xff, 0xd8, 0x00, 0x00).map(_.toByte), // lost marker alignment
      "GIF89a".getBytes("US-ASCII"), // truncated before the descriptor
      ImageMeta.encode("webp", 10, 10).take(18), // truncated RIFF chunk
      riff("ALPH", Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0, 0)), // no bitstream chunk first
      badVp8,
      ImageMeta.encode("bmp", 10, 10).take(20), // truncated DIB header
      coreBmp)
    val nulls = bad.map(Tuple1(_)).toDF("content")
      .selectExpr("image_meta(content) AS m").collect()
    nulls.foreach(r => assert(r.isNullAt(0), s"expected NULL meta, got $r"))
  }

  test("image_meta compiles under codegen-only mode (no fallback)") {
    // the expression claims real doGenCode — CODEGEN_ONLY with fallback
    // off fails the query if the emitted Java doesn't compile, and the
    // mixed valid/corrupt input exercises the post-call null branch
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.fallback", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    Registry.install(s2)
    import s2.implicits._
    val rows = Seq(
      ImageMeta.encode("png", 12, 34), ImageMeta.encode("webp", 56, 78),
      ImageMeta.encode("bmp", 9, 9), "not an image".getBytes("UTF-8"))
      .map(Tuple1(_)).toDF("content")
      .selectExpr("image_meta(content) AS m")
      .selectExpr("m.format", "m.width").collect()
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(rows.filter(!_.isNullAt(0)).map(_.getString(0)).toSet ==
      Set("png", "webp", "bmp"))
  }

  test("minhash_bands: deterministic, band count respected, permutation-sensitive") {
    Registry.install(spark)
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("a b c", "b c d", "c d e")),
      (3L, Seq("x y z", "y z w", "z w v"))).toDF("id", "sh")
    val out = df.selectExpr("id", "minhash_bands(sh, 128, 32) AS bands")
      .as[(Long, Seq[Long])].collect().toMap
    assert(out(1L).size == 32)
    assert(out(1L) == out(2L)) // identical input → identical bands
    assert(out(1L) != out(3L)) // different shingles → different bands
  }

  test("minhash band collision rate tracks Jaccard similarity") {
    Registry.install(spark)
    // ~90% overlapping shingle sets should collide in many bands;
    // disjoint sets in none.
    val near = (1 to 20).map(i => s"sh$i")
    val df = Seq(
      (1L, near), (2L, near.drop(2) ++ Seq("other1", "other2")),
      (3L, (1 to 20).map(i => s"zz$i"))).toDF("id", "sh")
    val out = df.selectExpr("id", "minhash_bands(sh, 128, 32) AS bands")
      .as[(Long, Seq[Long])].collect().toMap
    val nearCollisions = out(1L).zip(out(2L)).count { case (a, b) => a == b }
    val farCollisions = out(1L).zip(out(3L)).count { case (a, b) => a == b }
    assert(nearCollisions > 0)
    assert(farCollisions == 0)
  }

  test("fingerprint equals the HOF formulation on real documents") {
    Registry.install(spark)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(100)
    val mismatches = docs
      .withColumn("native", expr("fingerprint(text, 8)"))
      .withColumn("hof", expr(
        """array_min(transform(sequence(1, greatest(length(text) - 7, 1)),
          |                    i -> md5(substring(text, i, 8))))""".stripMargin))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(mismatches == 0)
  }

  test("fingerprint handles short and empty texts like the SQL form") {
    Registry.install(spark)
    val df = Seq("", "a", "exactly8", "nine char").toDF("text")
    val rows = df.selectExpr(
      "fingerprint(text, 8) AS native",
      """array_min(transform(sequence(1, greatest(length(text) - 7, 1)),
        |                    i -> md5(substring(text, i, 8)))) AS hof""".stripMargin)
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("simhash32 equals the explode/vote SQL formulation on real documents") {
    Registry.install(spark)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(100)
    // the two-shuffle formulation q36 used before the native expression:
    // explode distinct words × 32 bit positions, vote by md5 hex digits,
    // pack per-doc — must be bit-identical to the one-pass expression
    val words = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("h8", substring(md5(col("w")), 1, 8))
    val sqlForm = words
      .select(col("doc_id"), col("h8"), explode(expr("sequence(0, 31)")).as("pos"))
      .withColumn("digit", expr(
        "instr('0123456789abcdef', substring(h8, CAST(pos div 4 AS INT) + 1, 1)) - 1"))
      .withColumn("vote", expr("2 * ((digit div CAST(pow(2, pos % 4) AS INT)) % 2) - 1"))
      .groupBy("doc_id", "pos").agg(sum(col("vote")).as("v"))
      .groupBy("doc_id")
      .agg(sum(expr("CASE WHEN v >= 0 THEN CAST(pow(2, pos) AS BIGINT) ELSE 0 END"))
        .as("sql_hash"))
    val native = docs.select(col("doc_id"),
      expr("simhash32(array_distinct(split(text, ' ')))").as("native_hash"))
    val mismatches = native.join(sqlForm, "doc_id")
      .filter(col("native_hash") =!= col("sql_hash")).count()
    assert(mismatches == 0)
  }

  test("simhash32: empty array gives all-ones hash, null elements skipped") {
    Registry.install(spark)
    // zero words → every vote total is 0 → every bit set (>= 0 rule)
    val rows = Seq(Seq.empty[String], Seq("hello"))
      .toDF("w").selectExpr("simhash32(w)").as[Long].collect()
    assert(rows(0) == 0xFFFFFFFFL)
    val withNull = spark.sql("SELECT simhash32(array('hello', NULL))").as[Long].head()
    val without = spark.sql("SELECT simhash32(array('hello'))").as[Long].head()
    assert(withNull == without)
  }

  test("interleave_bits: exact bit layout, 2-4 columns, nulls code as 0") {
    Registry.install(spark)
    def one(sql: String): Long = spark.sql(s"SELECT $sql").as[Long].head()
    // two columns: c0's bits land on even positions, c1's on odd
    assert(one("interleave_bits(65535, 0)") == 0x55555555L)
    assert(one("interleave_bits(0, 65535)") == 0xAAAAAAAAL)
    assert(one("interleave_bits(65535, 65535)") == 0xFFFFFFFFL)
    // three columns: stride 3
    assert(one("interleave_bits(1, 0, 0)") == 1L)
    assert(one("interleave_bits(0, 1, 0)") == 2L)
    assert(one("interleave_bits(0, 0, 1)") == 4L)
    // only the low 16 bits participate
    assert(one("interleave_bits(65536, 0)") == 0L)
    // nulls cluster with the minimum
    assert(one("interleave_bits(CAST(NULL AS INT), 9)") == one("interleave_bits(0, 9)"))
    // monotone along each axis with the other fixed → the curve preserves
    // per-dimension ordering inside a fixed cell of the other dimension
    val zs = (0 until 16).map(i => one(s"interleave_bits($i, 7)"))
    assert(zs == zs.sorted)
  }

  test("word_shingles equals the HOF formulation on real documents") {
    Registry.install(spark)
    val hof =
      """array_distinct(transform(sequence(1, size(split(text, ' ')) - 2),
        |  i -> concat_ws(' ', element_at(split(text, ' '), i),
        |                      element_at(split(text, ' '), i + 1),
        |                      element_at(split(text, ' '), i + 2))))""".stripMargin
    val mismatches = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(200)
      .filter(size(split(col("text"), " ")) >= 3)
      .withColumn("native", expr("word_shingles(text, 3)"))
      .withColumn("hof", expr(hof))
      .filter(col("native") =!= col("hof")) // same elements, same order
      .count()
    assert(mismatches == 0)
  }

  test("word_shingles: short texts empty, duplicates collapsed, empty tokens kept") {
    Registry.install(spark)
    import scala.jdk.CollectionConverters._
    def one(text: String, n: Int): Seq[String] =
      spark.sql(s"SELECT word_shingles('$text', $n)")
        .head().getList[String](0).asScala.toSeq
    assert(one("one two", 3).isEmpty) // fewer than n words
    assert(one("a b c d", 3) == Seq("a b c", "b c d"))
    assert(one("a b a b a b", 2) == Seq("a b", "b a")) // distinct, first-occurrence order
    // consecutive spaces tokenize as empty strings, like split(text, ' ')
    assert(one("a  b", 2) == Seq("a ", " b"))
  }

  test("lsh_bucket: deterministic per table, within bit range") {
    Registry.install(spark)
    val v = Array.tabulate(64)(i => math.sin(i.toDouble))
    val df = Seq(Tuple1(v), Tuple1(v)).toDF("v")
    val buckets = df.selectExpr(
      "lsh_bucket(v, 6, 0) AS b0", "lsh_bucket(v, 6, 1) AS b1")
      .as[(Long, Long)].collect()
    assert(buckets(0) == buckets(1)) // deterministic
    assert(buckets(0)._1 >= 0 && buckets(0)._1 < 64) // 6 bits
  }

  test("word_shingles and cosine_sim compile under codegen-only mode (no fallback)") {
    // CODEGEN_ONLY + fallback off: a doGenCode that emits uncompilable
    // Java fails the query instead of silently degrading to interpreted
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.fallback", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    Registry.install(s2)
    val shingled = graft.Tables.load(s2, sf, "documents").limit(50)
      .selectExpr("size(word_shingles(text, 3)) AS n")
      .agg(sum(col("n"))).head().getLong(0)
    assert(shingled > 0)
    import s2.implicits._
    val sim = Seq((Array(1.0, 0.0), Array(1.0, 0.0))).toDF("a", "b")
      .selectExpr("cosine_sim(a, b)").head().getDouble(0)
    assert(math.abs(sim - 1.0) < 1e-12)
  }

  test("hash64_sorted/intersect_size-long/token_histogram compile codegen-only and agree with eval") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.fallback", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    Registry.install(s2)
    // hashed intersection equals string intersection on real documents
    // (the exactness contract of the hashed near-dup pipeline)
    // ≤255 tokens keeps the byte sketches non-NULL (oversized docs get a
    // NULL histogram by design — covered in NearDupSpec); filter BEFORE
    // limit so a fixture regeneration can't shrink the sample to nothing
    val rows = graft.Tables.load(s2, sf, "documents")
      .selectExpr("doc_id", "array_sort(word_shingles(text, 3)) AS sh")
      .where("size(sh) BETWEEN 1 AND 255")
      .limit(30)
      .selectExpr("doc_id", "sh", "hash64_sorted(sh) AS hs")
    val both = rows.as("a").crossJoin(rows.as("b"))
      .selectExpr(
        "intersect_size(a.sh, b.sh) AS str_inter",
        "intersect_size(a.hs, b.hs) AS long_inter",
        "overlap_bound(token_histogram(a.sh, 256), token_histogram(b.sh, 256)) AS bound_str",
        "overlap_bound(token_histogram(a.hs, 256), token_histogram(b.hs, 256)) AS bound_long")
      .collect()
    assert(both.nonEmpty)
    assert(both.forall(r => r.getInt(0) == r.getInt(1)),
      "hashed-long intersection diverged from string intersection")
    assert(both.forall(r => r.getInt(2) >= r.getInt(0)),
      "string-histogram bound undercut a true intersection")
    assert(both.forall(r => r.getInt(3) >= r.getInt(1)),
      "long-histogram bound undercut a true intersection")
  }

  test("parameter arguments must be foldable positive ints (analysis error)") {
    Registry.install(spark)
    val docs = graft.Tables.load(spark, sf, "documents").limit(1)
    // a COLUMN as the tuning parameter: clear analysis failure, not an
    // unbound-attribute eval crash
    val colArg = intercept[org.apache.spark.sql.AnalysisException] {
      docs.selectExpr("word_shingles(text, CAST(doc_id AS INT))").collect()
    }
    assert(colArg.getMessage.contains("foldable"), colArg.getMessage)
    // a NULL literal: clear analysis failure, not n=0 emitting bogus
    // empty-string shingles
    val nullArg = intercept[org.apache.spark.sql.AnalysisException] {
      docs.selectExpr("word_shingles(text, CAST(NULL AS INT))").collect()
    }
    assert(nullArg.getMessage.contains("NULL"), nullArg.getMessage)
    // zero / negative: out of range
    val zeroArg = intercept[org.apache.spark.sql.AnalysisException] {
      docs.selectExpr("word_shingles(text, 0)").collect()
    }
    assert(zeroArg.getMessage.contains(">= 1"), zeroArg.getMessage)
    // same guard on the other parameterized functions
    intercept[org.apache.spark.sql.AnalysisException] {
      docs.selectExpr("minhash_bands(word_shingles(text, 3), CAST(doc_id AS INT), 16)")
        .collect()
    }
    // the banding RELATION too: numBands > numPerms would make
    // rowsPerBand 0 (all-zero hashes → every doc in every bucket), and a
    // non-divisible split silently drops trailing permutations
    val rel = intercept[org.apache.spark.sql.AnalysisException] {
      docs.selectExpr("minhash_bands(word_shingles(text, 3), 4, 8)").collect()
    }
    assert(rel.getMessage.contains("multiple"), rel.getMessage)
    intercept[org.apache.spark.sql.AnalysisException] {
      docs.selectExpr("minhash_bands(word_shingles(text, 3), 64, 24)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT lsh_bucket(array(1.0d, 2.0d), 4, -1)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      docs.selectExpr("fingerprint(text, CAST(NULL AS INT))").collect()
    }
    // table 0 stays valid for lsh_bucket
    spark.sql("SELECT lsh_bucket(array(1.0d, 2.0d), 4, 0)").collect()
    // the new parameterized text functions share the guard
    intercept[org.apache.spark.sql.AnalysisException] {
      docs.selectExpr("word_ngrams(text, 0)").collect()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      docs.selectExpr("top_gram_frac(text, CAST(doc_id AS INT))").collect()
    }
  }

  test("word_ngrams equals the HOF formulation WITH multiplicity on real documents") {
    Registry.install(spark)
    val hof =
      """transform(sequence(1, size(split(text, ' ')) - 1),
        |  i -> concat_ws(' ', element_at(split(text, ' '), i),
        |                      element_at(split(text, ' '), i + 1)))""".stripMargin
    val mismatches = graft.Tables.load(spark, sf, "documents")
      .select(col("text")).limit(200)
      .filter(size(split(col("text"), " ")) >= 2)
      .withColumn("native", expr("word_ngrams(text, 2)"))
      .withColumn("hof", expr(hof))
      .filter(col("native") =!= col("hof")) // duplicates kept, order kept
      .count()
    assert(mismatches == 0)
  }

  test("top_gram_frac equals the explode/count formulation, handles edges") {
    Registry.install(spark)
    // oracle per doc: max gram count / total gram count
    val docs200 = graft.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).limit(200)
    val viaAgg = docs200
      .select(col("doc_id"), explode(expr("word_ngrams(text, 2)")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg((max("c") * lit(1.0) / sum("c")).as("want"))
    val mismatches = docs200
      .withColumn("got", expr("top_gram_frac(text, 2)"))
      .join(viaAgg, "doc_id")
      .filter(abs(col("got") - col("want")) > 1e-12)
      .count()
    assert(mismatches == 0)
    // edges: all-identical doc → 1.0; all-distinct → 1/n; short text → 0.0
    val r = spark.sql(
      """SELECT top_gram_frac('x x x x', 1) AS a,
        |       top_gram_frac('a b c d', 1) AS b,
        |       top_gram_frac('one', 2) AS c""".stripMargin).head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.25 && r.getDouble(2) == 0.0)
  }

  test("word_ngrams and top_gram_frac compile under codegen-only mode (no fallback)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.codegen.fallback", "false")
    s2.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    Registry.install(s2)
    val n = graft.Tables.load(s2, sf, "documents").limit(50)
      .selectExpr("size(word_ngrams(text, 2)) AS n", "top_gram_frac(text, 2) AS f")
      .agg(sum(col("n")), max(col("f"))).head()
    assert(n.getLong(0) > 0 && n.getDouble(1) > 0.0 && n.getDouble(1) <= 1.0)
  }
}
