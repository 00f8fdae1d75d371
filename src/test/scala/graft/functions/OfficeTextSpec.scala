package graft.functions

/** docx_text: ZIP + WordprocessingML extraction — run concatenation,
  * paragraph/break separators, XML entity decode, refusal matrix, and
  * the codegen path. */
class OfficeTextSpec extends graft.SparkFunSuite {

  test("paragraphs round-trip; runs concatenate without separators") {
    val docx = OfficeText.encodeDocx(Seq(
      "Hello world from paragraph one",
      "and & <two> with specials",
      "third"))
    val got = OfficeText.docxText(docx)
    assert(got ==
      "Hello world from paragraph one and & <two> with specials third")
    // the encoder splits each paragraph into two runs MID-WORD: if the
    // extractor inserted a separator between runs, words would split
    assert(!got.contains("paragra ph") && !got.contains("wo rld"))
  }

  test("breaks, tabs, numeric references, and preserve-space semantics") {
    // hand-built document.xml exercising what the fixture encoder doesn't
    val doc =
      """<?xml version="1.0"?><w:document><w:body>""" +
        """<w:p><w:r><w:t>a</w:t><w:br/><w:t>b</w:t></w:r></w:p>""" +
        """<w:p><w:r><w:t>x&#65;&#x42;y</w:t><w:tab/><w:t>z</w:t></w:r></w:p>""" +
        """<w:p><w:r><w:t xml:space="preserve">  spaced  </w:t></w:r></w:p>""" +
        """</w:body></w:document>"""
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(doc.getBytes("UTF-8")); z.closeEntry(); z.close()
    assert(OfficeText.docxText(out.toByteArray) == "a b xABy z spaced")
  }

  test("refusals: non-zip, zip without document.xml, truncated zip, null") {
    assert(OfficeText.docxText("not a zip at all".getBytes("US-ASCII")) == null)
    assert(OfficeText.docxText(null) == null)
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    z.write("hi".getBytes); z.closeEntry(); z.close()
    assert(OfficeText.docxText(out.toByteArray) == null)
    val ok = OfficeText.encodeDocx(Seq("text"))
    assert(OfficeText.docxText(ok.take(ok.length / 2)) == null)
    // PK magic but garbage after
    assert(OfficeText.docxText(
      Array[Byte]('P', 'K', 3, 4, 9, 9, 9, 9, 9, 9)) == null)
  }

  test("epub_text: chapters join in zip order; mimetype gates detection") {
    val epub = OfficeText.encodeEpub(Seq(
      "First chapter & <tags>", "Second chapter"))
    assert(OfficeText.epubText(epub) ==
      "First chapter & <tags> Second chapter")
    // a ZIP without the OCF mimetype entry is NOT an epub (e.g. a docx)
    val docx = OfficeText.encodeDocx(Seq("word text"))
    assert(OfficeText.epubText(docx) == null)
    // …and a docx is not readable as epub nor vice versa
    assert(OfficeText.docxText(epub) == null)
    // a wrong mimetype refuses
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("mimetype"))
    z.write("application/zip".getBytes); z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("a.xhtml"))
    z.write("<p>x</p>".getBytes); z.closeEntry(); z.close()
    assert(OfficeText.epubText(out.toByteArray) == null)
    assert(OfficeText.epubText("no zip".getBytes) == null)
    assert(OfficeText.epubText(epub.take(epub.length / 3)) == null)
  }

  test("docx_text through a parquet scan under codegen; NULL for junk rows") {
    import spark.implicits._
    Registry.install(spark)
    val dir = scratch("docxtext")
    Seq(
      (1L, OfficeText.encodeDocx(Seq("alpha", "beta"))),
      (2L, "junk".getBytes("US-ASCII")))
      .toDF("id", "content").write.parquet(dir)
    val df = spark.read.parquet(dir)
      .selectExpr("id", "docx_text(content) AS t")
      .orderBy("id")
    val rows = df.collect()
    assert(rows(0).getString(1) == "alpha beta")
    assert(rows(1).isNullAt(1))
    val explained = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("[codegen id :"), explained)
  }

  test("xlsx_text: shared/inline/num/str cells, sheet order, rich runs") {
    // two sheets, all four cell kinds; shared strings dedupe
    val b = OfficeText.encodeXlsx(Seq(
      Seq(Seq(("s", "alpha"), ("num", "42")),
        Seq(("inline", "in<line>"), ("str", "=res & t"))),
      Seq(Seq(("s", "alpha"), ("s", "tail")))))
    assert(OfficeText.xlsxText(b) == "alpha 42 in<line> =res & t alpha tail")
    // rich-text shared entries (two <r><t> runs) concatenate seamlessly
    val rich = OfficeText.encodeXlsx(
      Seq(Seq(Seq(("s", "seamless")))), richShared = true)
    assert(OfficeText.xlsxText(rich) == "seamless")
  }

  test("xlsx_text refusals and hostile cells") {
    assert(OfficeText.xlsxText(null) == null)
    assert(OfficeText.xlsxText("not a zip".getBytes) == null)
    // a ZIP that isn't a workbook (DOCX) refuses as XLSX and vice versa
    val docx = OfficeText.encodeDocx(Seq("hello"))
    assert(OfficeText.xlsxText(docx) == null)
    val xlsx = OfficeText.encodeXlsx(Seq(Seq(Seq(("s", "x")))))
    assert(OfficeText.docxText(xlsx) == null)
    // out-of-range shared index drops the CELL, keeps the sheet
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    def put(n: String, c: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(c.getBytes("UTF-8")); z.closeEntry()
    }
    put("xl/workbook.xml", "<workbook><sheets/></workbook>")
    put("xl/sharedStrings.xml", "<sst><si><t>keep</t></si></sst>")
    put("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData><row><c t="s"><v>0</v></c>""" +
        """<c t="s"><v>99</v></c><c t="s"><v>junk</v></c>""" +
        "</row></sheetData></worksheet>")
    z.close()
    assert(OfficeText.xlsxText(out.toByteArray) == "keep")
  }

  test("pptx_text: slides in numeric order despite reverse zip order") {
    val b = OfficeText.encodePptx(Seq(
      Seq("First slide", "with two paragraphs"),
      Seq("Second & last")))
    // encoder writes slide2 BEFORE slide1; numeric sort restores order,
    // runs concatenate without separators, paragraphs add spaces
    assert(OfficeText.pptxText(b) ==
      "First slide with two paragraphs Second & last")
    assert(OfficeText.pptxText(OfficeText.encodeDocx(Seq("x"))) == null)
    assert(OfficeText.pptxText(Array[Byte](1, 2, 3)) == null)
  }

  test("a self-closing <w:t/> run never leaks surrounding raw text") {
    // real Word output writes empty self-closing runs; entering text
    // mode on one would emit everything to the next real </w:t> — e.g.
    // field instructions — as document text
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(("""<w:document><w:body><w:p>""" +
      """<w:r><w:t/></w:r>""" + // empty self-closing run
      """<w:fldSimple w:instr=" PAGE ">raw field text</w:fldSimple>""" +
      """<w:r><w:t>visible</w:t></w:r>""" +
      """</w:p></w:body></w:document>""").getBytes("UTF-8"))
    z.closeEntry(); z.close()
    assert(OfficeText.docxText(out.toByteArray) == "visible")
  }

  test("xlsx/pptx expressions through a parquet scan under codegen") {
    graft.functions.Registry.install(spark)
    import spark.implicits._
    val x = OfficeText.encodeXlsx(Seq(Seq(Seq(("s", "cell one"), ("num", "7")))))
    val p = OfficeText.encodePptx(Seq(Seq("deck text")))
    val dir = scratch("officetext-xp")
    Seq((1L, x), (2L, p), (3L, "junk".getBytes))
      .toDF("id", "content").write.mode("overwrite").parquet(dir)
    val rows = spark.read.parquet(dir)
      .selectExpr("id", "xlsx_text(content) AS xs", "pptx_text(content) AS ps")
      .orderBy("id").collect()
    assert(rows(0).getString(1) == "cell one 7" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getString(2) == "deck text")
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }
}
