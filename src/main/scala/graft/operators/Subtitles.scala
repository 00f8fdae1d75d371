package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SRT / WebVTT subtitle parsing (round 18) — caption files are the
  * text half of video-text training pairs, and their cue timings drive
  * the frame-caption alignment joins (`q79`-style as-of logic on the
  * video side).
  *
  *  - Detection: `WEBVTT` magic (optional UTF-8 BOM) → WebVTT; else a
  *    leading integer cue counter + `-->` timing line → SubRip.
  *  - Timings: `HH:MM:SS,mmm` (SRT) / `HH:MM:SS.mmm` with optional
  *    hours (WebVTT), reported as integer milliseconds. WebVTT cue
  *    settings after the end timestamp (`position:…`) are ignored.
  *  - Cue text: lines until the blank separator; WebVTT voice/format
  *    tags (`<v Name>`, `<i>`, `<c.class>`) drop (the same
  *    tags-separate-nothing rule works here since cue text is short);
  *    multi-line cues join with a single space. `NOTE`/`STYLE`/
  *    `REGION` blocks and optional VTT cue identifiers are skipped.
  *  - Malformed cues are skipped individually; a payload with no
  *    parseable cue at all yields one labeled `corrupt` row. Corrupt
  *    captions in a crawl are data, not errors.
  *
  * Exchange-free mapPartitions, one file at a time per executor thread,
  * rows out as an iterator — the Warc/Multimodal shape.
  */
object Subtitles {

  val cueSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false), // "srt"|"vtt"|"corrupt"
    StructField("cue_idx", LongType, nullable = true),
    StructField("start_ms", LongType, nullable = true),
    StructField("end_ms", LongType, nullable = true),
    StructField("text", StringType, nullable = true)))

  final case class Cue(startMs: Long, endMs: Long, text: String)

  /** Parse subtitle text; (format, cues) or None when unrecognizable. */
  def parse(content: String): Option[(String, Seq[Cue])] = {
    if (content == null) return None
    val body = content.stripPrefix("﻿")
    val isVtt = body.startsWith("WEBVTT")
    val lines = body.split("\r\n|\n|\r", -1)
    if (!isVtt) {
      // SRT sanity: some line must be a timing line
      if (!lines.exists(_.contains("-->"))) return None
    }
    val cues = Seq.newBuilder[Cue]
    var i = if (isVtt) 1 else 0
    var sawCue = false
    while (i < lines.length) {
      val line = lines(i).trim
      if (line.isEmpty) i += 1
      else if (isVtt && (line.startsWith("NOTE") || line.startsWith("STYLE") ||
          line.startsWith("REGION"))) {
        // skip the block to the next blank line
        while (i < lines.length && lines(i).trim.nonEmpty) i += 1
      } else {
        // optional identifier line, then the timing line
        var timingIdx = i
        if (!line.contains("-->") && i + 1 < lines.length &&
            lines(i + 1).contains("-->")) timingIdx = i + 1
        val timing = lines(timingIdx)
        val arrow = timing.indexOf("-->")
        if (arrow < 0) { i += 1 } // not a cue: skip the line
        else {
          val start = parseTime(timing.substring(0, arrow).trim)
          val endPart = timing.substring(arrow + 3).trim
          // VTT cue settings follow the end timestamp after whitespace
          val endStr = endPart.takeWhile(c => c != ' ' && c != '\t')
          val end = parseTime(endStr)
          var j = timingIdx + 1
          val text = new StringBuilder()
          while (j < lines.length && lines(j).trim.nonEmpty) {
            if (text.nonEmpty) text.append(' ')
            text.append(stripTags(lines(j).trim))
            j += 1
          }
          if (start >= 0 && end >= 0) {
            cues += Cue(start, end, text.toString)
            sawCue = true
          }
          i = j + 1
        }
      }
    }
    if (!sawCue) None
    else Some((if (isVtt) "vtt" else "srt", cues.result()))
  }

  /** `HH:MM:SS,mmm` / `HH:MM:SS.mmm` / `MM:SS.mmm` → ms, or −1. */
  private def parseTime(s: String): Long = {
    val norm = s.replace(',', '.')
    val parts = norm.split(":")
    if (parts.length < 2 || parts.length > 3) return -1
    try {
      val secMs = parts.last.split("\\.")
      if (secMs.length != 2 || secMs(1).length != 3) return -1
      val sec = secMs(0).toInt
      val ms = secMs(1).toInt
      val min = parts(parts.length - 2).toInt
      val hour = if (parts.length == 3) parts(0).toInt else 0
      if (sec > 59 || min > 59 || hour < 0) return -1
      ((hour * 60L + min) * 60 + sec) * 1000 + ms
    } catch { case _: NumberFormatException => -1 }
  }

  private def stripTags(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    var inTag = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '<') inTag = true
      else if (c == '>') inTag = false
      else if (!inTag) out.append(c)
      i += 1
    }
    out.toString
  }

  /** One row per cue from a (doc_id, content: string) DataFrame;
    * unparseable payloads emit a single labeled corrupt row. */
  def extractCues(in: DataFrame, idCol: String = "doc_id",
      contentCol: String = "content"): DataFrame = {
    val src = in.select(col(idCol).cast("long"), col(contentCol))
    implicit val enc = Encoders.row(cueSchema)
    src.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val content = if (r.isNullAt(1)) null else r.getString(1)
        parse(content) match {
          case Some((fmt, cues)) =>
            cues.iterator.zipWithIndex.map { case (c, k) =>
              Row(id, fmt, k.toLong, c.startMs, c.endMs, c.text)
            }
          case None =>
            Iterator.single(Row(id, "corrupt", null, null, null, null))
        }
      }
    }
  }

  // ------------------------------------------------------------- encode

  /** Real SRT bytes: numbered cues, comma timings, CRLF line ends. */
  def encodeSrt(cues: Seq[Cue]): String =
    cues.zipWithIndex.map { case (c, i) =>
      s"${i + 1}\r\n${fmtTime(c.startMs, ',')} --> ${fmtTime(c.endMs, ',')}" +
        s"\r\n${c.text}\r\n"
    }.mkString("\r\n")

  /** Real WebVTT bytes: header, NOTE block, ids, settings, dot timings. */
  def encodeVtt(cues: Seq[Cue], withNote: Boolean = true): String = {
    val head = "WEBVTT\n\n" +
      (if (withNote) "NOTE\nthis block must be skipped\n\n" else "")
    head + cues.zipWithIndex.map { case (c, i) =>
      s"cue-${i + 1}\n${fmtTime(c.startMs, '.')} --> ${fmtTime(c.endMs, '.')}" +
        s" position:50%\n${c.text}\n"
    }.mkString("\n")
  }

  private def fmtTime(ms: Long, sep: Char): String = {
    val h = ms / 3600000
    val m = (ms / 60000) % 60
    val s = (ms / 1000) % 60
    val mm = ms % 1000
    f"$h%02d:$m%02d:$s%02d$sep$mm%03d"
  }
}
