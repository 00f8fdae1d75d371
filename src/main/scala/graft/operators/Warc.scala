package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC/WET ingestion (round 18) — the container LLM training pipelines
  * actually read: Common Crawl ships WARC (raw HTTP captures) and WET
  * (extracted-text "conversion" records), both as sequences of ISO
  * 28500 records, usually with each record its own gzip member.
  *
  *  - Record layer: `WARC/1.x` version line, `Name: value` header lines
  *    terminated by an empty line, then exactly Content-Length block
  *    bytes, then CRLF CRLF. The walk is length-driven (never a body
  *    scan), so binary payloads containing "WARC/" don't derail it.
  *  - Compression: per-record gzip members concatenated (the Common
  *    Crawl layout — the JDK's GZIPInputStream consumes multi-member
  *    streams natively), whole-file single-member gzip, or plain.
  *  - HTTP layer: `response` records split their block at the first
  *    CRLF CRLF into status line (code extracted) + headers and body;
  *    `conversion` (WET) records carry the text block directly.
  *  - Output: one row per record — type, target URI, date, content
  *    type, HTTP status, body bytes + UTF-8 text (replacement-decoded)
  *    — plus a single `corrupt` row for payloads that don't parse:
  *    corrupt members in a 100 TB crawl are data, not errors.
  *
  * Scale design: extraction is exchange-free mapPartitions (one archive
  * at a time per executor thread, records streamed out as an iterator,
  * nothing driver-side); output rows are narrow except the body, which
  * downstream ops usually reduce immediately (dedup hash, quality
  * score, token count — the q73–q78 pipeline this feeds).
  *
  * Reference capability: corpus ingestion ahead of the documents-table
  * pipeline (BASELINE.md north star).
  */
object Warc {

  val recordSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("record_idx", LongType, nullable = true),
    StructField("warc_type", StringType, nullable = false),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("http_status", LongType, nullable = true),
    StructField("body_len", LongType, nullable = true),
    StructField("body_text", StringType, nullable = true)))

  /** One parsed record. `httpStatus` < 0 = not an HTTP response. */
  final case class WarcRecord(warcType: String, targetUri: String,
      warcDate: String, contentType: String, httpStatus: Int,
      body: Array[Byte])

  private val MaxArchiveBytes = 1 << 28 // decompressed cap per payload

  /** Parse a WARC archive (plain or gzipped, single- or multi-member).
    * None = not parseable as WARC at all; records that fail mid-stream
    * truncate the result (everything before them is kept). */
  /** Standard zstd frame magic (LE 0xFD2FB528)? */
  private def isZstd(b: Array[Byte], at: Int): Boolean =
    at + 4 <= b.length && (b(at) & 0xff) == 0x28 &&
      (b(at + 1) & 0xff) == 0xb5 && (b(at + 2) & 0xff) == 0x2f &&
      (b(at + 3) & 0xff) == 0xfd

  /** Skippable zstd frame (LE 0x184D2A50..5F — warc.zst puts its
    * optional dictionary in one)? */
  private def isZstdSkippable(b: Array[Byte], at: Int): Boolean =
    at + 8 <= b.length && ((b(at) & 0xf0) == 0x50) &&
      (b(at + 1) & 0xff) == 0x2a && (b(at + 2) & 0xff) == 0x4d &&
      (b(at + 3) & 0xff) == 0x18

  def parse(bytes: Array[Byte]): Option[Seq[WarcRecord]] = {
    if (bytes == null || bytes.length < 8) return None
    def drain(in: java.io.InputStream): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0 && out.size <= MaxArchiveBytes) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      if (out.size > MaxArchiveBytes) null // bomb: refuse
      else out.toByteArray
    }
    val data =
      if ((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
        try {
          val d = drain(new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(bytes)))
          if (d == null) return None
          d
        } catch { case _: java.io.IOException => return None }
      } else if (isZstd(bytes, 0) || isZstdSkippable(bytes, 0)) {
        // .warc.zst (Common Crawl's successor layout): standard frames,
        // possibly one per record (concatenated — continuous mode), with
        // LEADING skippable frames walked past by hand (the warc.zst
        // dictionary convention; zstd-jni ships with Spark). Frames that
        // REQUIRE that dictionary fail to decode → None, the labeled
        // corrupt row — dictionary training is out of scope.
        var at = 0
        while (isZstdSkippable(bytes, at)) {
          val sz = (bytes(at + 4) & 0xffL) | ((bytes(at + 5) & 0xffL) << 8) |
            ((bytes(at + 6) & 0xffL) << 16) | ((bytes(at + 7) & 0xffL) << 24)
          if (at + 8 + sz > bytes.length) return None
          at += 8 + sz.toInt
        }
        if (!isZstd(bytes, at)) return None
        try {
          val zin = new com.github.luben.zstd.ZstdInputStream(
            new java.io.ByteArrayInputStream(bytes, at, bytes.length - at))
          zin.setContinuous(true) // concatenated per-record frames
          val d = drain(zin)
          if (d == null) return None
          d
        } catch { case _: java.io.IOException => return None }
      } else bytes
    if (data.length < 8 || !startsWith(data, 0, "WARC/")) return None
    val records = Seq.newBuilder[WarcRecord]
    var i = 0
    var ok = true
    while (ok && i < data.length) {
      parseRecord(data, i) match {
        case null => ok = false // truncated/corrupt tail: keep the prefix
        case (rec, next) =>
          records += rec
          i = next
      }
      // skip inter-record blank lines
      while (i + 1 < data.length && data(i) == '\r' && data(i + 1) == '\n')
        i += 2
    }
    val out = records.result()
    if (out.isEmpty) None else Some(out)
  }

  private def startsWith(b: Array[Byte], at: Int, s: String): Boolean =
    at + s.length <= b.length &&
      (0 until s.length).forall(k => b(at + k) == s.charAt(k))

  /** One record at `at`; (record, offset past its trailing CRLFs) or
    * null when malformed. */
  private def parseRecord(data: Array[Byte], at: Int): (WarcRecord, Int) = {
    if (!startsWith(data, at, "WARC/")) return null
    var i = at
    var warcType: String = null
    var uri: String = null
    var date: String = null
    var ctype: String = null
    var clen = -1L
    var first = true
    var done = false
    while (!done) {
      val eol = lineEnd(data, i)
      if (eol < 0) return null
      val len = eol - i
      if (len == 0) done = true // blank line: headers finished
      else if (!first) {
        val line = new String(data, i, len, "ISO-8859-1")
        val colon = line.indexOf(':')
        if (colon > 0) {
          val name = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          name match {
            case "warc-type" => warcType = value
            case "warc-target-uri" => uri = value
            case "warc-date" => date = value
            case "content-type" => ctype = value
            case "content-length" =>
              clen = try value.toLong catch { case _: NumberFormatException => -1L }
            case _ => ()
          }
        }
      }
      first = false
      i = eol + 2
    }
    if (warcType == null || clen < 0 || i + clen > data.length) return null
    val body = java.util.Arrays.copyOfRange(data, i, (i + clen).toInt)
    var next = (i + clen).toInt
    // the record separator is CRLF CRLF; tolerate missing at EOF
    var sep = 0
    while (sep < 2 && next + 1 < data.length &&
        data(next) == '\r' && data(next + 1) == '\n') { next += 2; sep += 1 }
    val (status, httpBody) =
      if (warcType == "response" && startsWith(body, 0, "HTTP/"))
        splitHttp(body)
      else (-1, body)
    ((WarcRecord(warcType, uri, date, ctype, status, httpBody), next))
  }

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n') return i
      if (i - from > 8192) return -1 // a header line this long is corrupt
      i += 1
    }
    -1
  }

  /** Split an HTTP response block into (status code, body after the
    * header terminator); unparseable → (-1, whole block). */
  private def splitHttp(block: Array[Byte]): (Int, Array[Byte]) = {
    val eol = lineEnd(block, 0)
    if (eol < 0) return (-1, block)
    val statusLine = new String(block, 0, eol, "ISO-8859-1")
    val parts = statusLine.split(" ")
    val code =
      if (parts.length >= 2) try parts(1).toInt catch {
        case _: NumberFormatException => -1
      } else -1
    // find CRLF CRLF
    var i = eol
    while (i + 3 < block.length) {
      if (block(i) == '\r' && block(i + 1) == '\n' &&
          block(i + 2) == '\r' && block(i + 3) == '\n')
        return (code, java.util.Arrays.copyOfRange(block, i + 4, block.length))
      i += 1
    }
    (code, Array.emptyByteArray) // headers only, no body
  }

  /** Extract records from a (doc_id, content: binary) DataFrame of WARC
    * archives partition-wise — one row per record, a labeled `corrupt`
    * row for payloads that don't parse. Exchange-free. */
  def extractRecords(in: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    val narrow = in.select(col(idCol).cast("long").as(idCol), col(contentCol))
    // WARC members are gzip/zstd — unsplittable compressed payloads — so
    // the scan's split count IS the decode parallelism, and small packed
    // inputs land in ONE split (guide §2.5's "huge unsplittable file"
    // shape: fix at the source or repartition immediately after the read).
    // When the scan is under-parallel, spread archives across the
    // executors with a deterministic hash repartition on the id (never
    // round-robin: retried tasks must re-place rows identically). When the
    // input already carries enough partitions — the thousands-of-files
    // layout a real crawl has — this is a no-op and the path stays
    // exchange-free.
    val target = in.sparkSession.sparkContext.defaultParallelism
    val src =
      if (Spread.inputPartitions(narrow) >= target) narrow
      else narrow.repartition(target, col(idCol))
    implicit val enc = Encoders.row(recordSchema)
    src.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes =
          if (r.isNullAt(1)) Array.emptyByteArray
          else r.getAs[Array[Byte]](1)
        parse(bytes) match {
          case Some(recs) =>
            recs.iterator.zipWithIndex.map { case (rec, k) =>
              Row(id, k.toLong, rec.warcType, rec.targetUri, rec.warcDate,
                rec.contentType,
                if (rec.httpStatus < 0) null else rec.httpStatus.toLong,
                rec.body.length.toLong,
                new String(rec.body, java.nio.charset.StandardCharsets.UTF_8))
            }
          case None =>
            Iterator.single(Row(id, null, "corrupt", null, null, null,
              null, null, null))
        }
      }
    }
  }

  // ------------------------------------------------------------- encode

  /** One fixture record. */
  final case class Rec(warcType: String, uri: String, date: String,
      contentType: String, block: Array[Byte])

  /** Real WARC bytes: ISO 28500 record framing; `gzipPerRecord` emits
    * the Common Crawl layout (one gzip member per record, concatenated);
    * `gzipWhole` wraps the whole archive in a single member;
    * `zstdPerRecord`/`zstdWhole` are the .warc.zst spellings (one zstd
    * frame per record / one frame for the archive), optionally led by
    * an empty SKIPPABLE frame (`zstdSkippable`) the way warc.zst
    * carries its dictionary slot. */
  def encodeWarc(records: Seq[Rec], gzipPerRecord: Boolean = false,
      gzipWhole: Boolean = false, zstdPerRecord: Boolean = false,
      zstdWhole: Boolean = false, zstdSkippable: Boolean = false): Array[Byte] = {
    require(records.nonEmpty &&
      Seq(gzipPerRecord, gzipWhole, zstdPerRecord, zstdWhole).count(identity) <= 1)
    def one(r: Rec): Array[Byte] = {
      val h = new StringBuilder()
      h.append("WARC/1.0\r\n")
      h.append(s"WARC-Type: ${r.warcType}\r\n")
      if (r.uri != null) h.append(s"WARC-Target-URI: ${r.uri}\r\n")
      if (r.date != null) h.append(s"WARC-Date: ${r.date}\r\n")
      h.append(s"WARC-Record-ID: <urn:uuid:${r.warcType.hashCode}-${r.block.length}>\r\n")
      if (r.contentType != null) h.append(s"Content-Type: ${r.contentType}\r\n")
      h.append(s"Content-Length: ${r.block.length}\r\n")
      h.append("\r\n")
      h.toString.getBytes("ISO-8859-1") ++ r.block ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    def gz(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(out)
      g.write(b); g.close()
      out.toByteArray
    }
    def zst(b: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val z = new com.github.luben.zstd.ZstdOutputStream(out)
      z.write(b); z.close()
      out.toByteArray
    }
    // optional leading skippable frame (empty payload — the dictionary
    // SLOT, exercising the walk, without dictionary-coded frames)
    val skip: Array[Byte] =
      if (!zstdSkippable) Array.emptyByteArray
      else Array[Byte](0x50, 0x2a, 0x4d, 0x18, 0, 0, 0, 0)
    if (gzipPerRecord) records.flatMap(r => gz(one(r))).toArray
    else if (zstdPerRecord) skip ++ records.flatMap(r => zst(one(r))).toArray
    else {
      val plain = records.flatMap(one).toArray
      if (gzipWhole) gz(plain)
      else if (zstdWhole) skip ++ zst(plain)
      else plain
    }
  }

  /** An HTTP response block for fixture `response` records. */
  def httpResponse(status: Int, contentType: String,
      body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n").getBytes("ISO-8859-1") ++ body
}
