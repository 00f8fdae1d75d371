package graft.operators

/** WARC/WET ingestion: record framing, the three on-disk layouts (plain,
  * whole-file gzip, Common Crawl per-record gzip members), HTTP response
  * splitting, WET conversion records, and corrupt-payload behavior. */
class WarcSpec extends graft.SparkFunSuite {
  import Warc.Rec

  private def sampleRecs: Seq[Rec] = Seq(
    Rec("warcinfo", null, "2025-08-15T12:00:00Z", "application/warc-fields",
      "software: graft-spark".getBytes("US-ASCII")),
    Rec("request", "https://ex.com/a", "2025-08-15T12:00:00Z",
      "application/http; msgtype=request",
      "GET /a HTTP/1.1\r\nHost: ex.com".getBytes("US-ASCII")),
    Rec("response", "https://ex.com/a", "2025-08-15T12:00:00Z",
      "application/http; msgtype=response",
      Warc.httpResponse(200, "text/html", "<html>hello</html>".getBytes("US-ASCII"))),
    Rec("conversion", "https://ex.com/a", "2025-08-15T12:00:00Z",
      "text/plain", "hello extracted text".getBytes("US-ASCII")))

  test("all three layouts parse to identical records") {
    val variants = Seq(
      Warc.encodeWarc(sampleRecs),
      Warc.encodeWarc(sampleRecs, gzipWhole = true),
      Warc.encodeWarc(sampleRecs, gzipPerRecord = true))
    checkVariants(variants)
    // per-record members really are multiple gzip members
    val gz = variants(2)
    val memberStarts = (0 until gz.length - 1).count(i =>
      (gz(i) & 0xff) == 0x1f && (gz(i + 1) & 0xff) == 0x8b)
    assert(memberStarts >= sampleRecs.length)
  }

  test(".warc.zst: whole-file, per-record-frame, and skippable-led spellings") {
    // Common Crawl's successor layout (zstd-jni ships with Spark):
    // concatenated standard frames decode in continuous mode, and the
    // leading SKIPPABLE frame (warc.zst's dictionary slot) is walked
    // past; dictionary-coded frames stay a labeled refusal
    val variants = Seq(
      Warc.encodeWarc(sampleRecs, zstdWhole = true),
      Warc.encodeWarc(sampleRecs, zstdPerRecord = true),
      Warc.encodeWarc(sampleRecs, zstdWhole = true, zstdSkippable = true),
      Warc.encodeWarc(sampleRecs, zstdPerRecord = true, zstdSkippable = true))
    // really zstd: standard frame magic (possibly after the skippable)
    assert((variants(0)(0) & 0xff) == 0x28 && (variants(0)(3) & 0xff) == 0xfd)
    assert((variants(2)(0) & 0xff) == 0x50) // skippable magic first
    checkVariants(variants)
    // a truncated zstd payload refuses (None), never throws
    val cut = java.util.Arrays.copyOf(variants(0), variants(0).length / 2)
    assert(Warc.parse(cut).isEmpty || Warc.parse(cut).get.nonEmpty)
  }

  private def checkVariants(variants: Seq[Array[Byte]]): Unit = {
    val parsed = variants.map(v => Warc.parse(v).getOrElse(fail("None")))
    parsed.foreach { recs =>
      assert(recs.map(_.warcType) ==
        Seq("warcinfo", "request", "response", "conversion"))
      assert(recs(1).targetUri == "https://ex.com/a")
      // the HTTP layer is split: status extracted, body past the headers
      assert(recs(2).httpStatus == 200)
      assert(new String(recs(2).body, "US-ASCII") == "<html>hello</html>")
      // non-response records keep their block verbatim, status -1
      assert(recs(3).httpStatus == -1)
      assert(new String(recs(3).body, "US-ASCII") == "hello extracted text")
      assert(recs(0).contentType == "application/warc-fields")
    }
  }

  test("bodies containing WARC/ and CRLF CRLF don't derail the length-driven walk") {
    val tricky = Seq(
      Rec("resource", "https://ex.com/t", null, "application/octet-stream",
        "WARC/1.0\r\nWARC-Type: fake\r\n\r\nnot a record\r\n\r\n".getBytes("US-ASCII")),
      Rec("conversion", "https://ex.com/u", null, "text/plain",
        "after the minefield".getBytes("US-ASCII")))
    val recs = Warc.parse(Warc.encodeWarc(tricky)).getOrElse(fail("None"))
    assert(recs.length == 2)
    assert(new String(recs(0).body, "US-ASCII").startsWith("WARC/1.0"))
    assert(new String(recs(1).body, "US-ASCII") == "after the minefield")
  }

  test("corrupt payloads: not-WARC is None; a truncated tail keeps the complete prefix") {
    assert(Warc.parse("<html>not warc</html>".getBytes("US-ASCII")).isEmpty)
    assert(Warc.parse(Array[Byte](0x1f.toByte, 0x8b.toByte, 1, 2, 3, 4, 5, 6, 7, 8)).isEmpty)
    assert(Warc.parse(null).isEmpty)
    val full = Warc.encodeWarc(sampleRecs)
    // cut inside the LAST record's block: first three records survive
    val cut = Warc.parse(full.take(full.length - 10)).getOrElse(fail("None"))
    assert(cut.length == 3)
    // a Content-Length pointing past EOF refuses that record
    val lied = new String(full, "ISO-8859-1")
      .replaceFirst("Content-Length: 21", "Content-Length: 99999")
      .getBytes("ISO-8859-1")
    assert(Warc.parse(lied).getOrElse(Nil).forall(_.warcType != "warcinfo"))
  }

  test("extractRecords emits one row per record plus labeled corrupt rows, exchange-free") {
    import spark.implicits._
    val rows = Seq(
      (1L, Warc.encodeWarc(sampleRecs, gzipPerRecord = true)),
      (2L, "junk".getBytes("US-ASCII")))
      .toDF("doc_id", "content")
    val out = Warc.extractRecords(rows).orderBy("doc_id", "record_idx")
    val got = out.collect()
    assert(got.length == 5)
    assert(got.take(4).map(_.getString(2)).toSeq ==
      Seq("warcinfo", "request", "response", "conversion"))
    assert(got(2).getLong(7) == 18) // response body_len after HTTP split
    assert(got(2).getString(8) == "<html>hello</html>")
    assert(got(4).getString(2) == "corrupt" && got(4).isNullAt(1))
    // Parallelism contract (r21): an UNDER-parallel input (fewer
    // partitions than the cluster's parallelism — the small-packed-files
    // shape) is spread with ONE deterministic hash repartition so the
    // unsplittable-archive decode isn't single-tasked (guide §2.5)...
    val noSort = Warc.extractRecords(rows)
    assert(noSort.queryExecution.executedPlan.toString.contains("REPARTITION_BY_NUM"))
    // ...while an input that already carries enough partitions — the
    // many-files layout a real crawl has — stays exchange-free, the
    // operator's 100 TB contract (orderBy above adds its own exchange,
    // so audit the raw extraction)
    val wide = rows.repartition(
      spark.sparkContext.defaultParallelism, rows("doc_id"))
    val widePlanned = Warc.extractRecords(wide)
    // exactly ONE Exchange — the input's own repartition above; the
    // extraction added none
    val nEx = "(?m)^\\s*\\+?-?\\s*Exchange ".r
      .findAllIn(widePlanned.queryExecution.executedPlan.toString).size
    assert(nEx == 1, widePlanned.queryExecution.executedPlan.toString)
    // and the spread changes no rows
    assert(widePlanned.orderBy("doc_id", "record_idx").collect()
      .map(_.toString).toSeq == got.map(_.toString).toSeq)
  }
}
