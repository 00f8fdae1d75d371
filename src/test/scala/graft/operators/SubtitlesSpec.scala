package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** SRT / WebVTT parsing: timing arithmetic, block skipping, tag
  * stripping, multi-line joins, and the corrupt path. */
class SubtitlesSpec extends AnyFunSuite {
  import Subtitles.Cue

  test("SRT round trip: numbered cues, comma timings, multi-line text") {
    val cues = Seq(
      Cue(1000, 4000, "Hello world"),
      Cue(65500, 70000, "Second cue text"),
      Cue(3600000 + 61000, 3600000 + 62000, "Past the hour"))
    val (fmt, got) = Subtitles.parse(Subtitles.encodeSrt(cues)).get
    assert(fmt == "srt")
    assert(got == cues)
    // multi-line cue text joins with a single space
    val multi = "1\r\n00:00:01,000 --> 00:00:02,000\r\nline one\r\nline two\r\n"
    assert(Subtitles.parse(multi).get._2.head.text == "line one line two")
  }

  test("WebVTT: header, BOM, NOTE blocks, cue ids, settings, dot timings, tags") {
    val cues = Seq(Cue(500, 1500, "first"), Cue(2000, 2600, "second"))
    val (fmt, got) = Subtitles.parse(Subtitles.encodeVtt(cues)).get
    assert(fmt == "vtt" && got == cues)
    // BOM + hourless timings + voice/format tags
    val vtt = "﻿WEBVTT\n\n00:05.000 --> 00:07.250\n" +
      "<v Speaker>Hello <i>there</i></v>\n"
    val (f2, g2) = Subtitles.parse(vtt).get
    assert(f2 == "vtt")
    assert(g2 == Seq(Cue(5000, 7250, "Hello there")))
  }

  test("malformed cues skip individually; fully unparseable payloads are None") {
    val mixed = "1\r\n00:00:01,000 --> 00:00:02,000\r\nok\r\n\r\n" +
      "2\r\nnot a timing line\r\nzzz\r\n\r\n" +
      "3\r\n00:00:99,000 --> 00:00:04,000\r\nbad seconds\r\n\r\n" +
      "4\r\n00:00:05,000 --> 00:00:06,000\r\nalso ok\r\n"
    val (_, cues) = Subtitles.parse(mixed).get
    assert(cues.map(_.text) == Seq("ok", "also ok"))
    assert(Subtitles.parse("just some prose, no cues").isEmpty)
    assert(Subtitles.parse(null).isEmpty)
    assert(Subtitles.parse("").isEmpty)
  }

  test("extractCues emits per-cue rows and labeled corrupt rows, exchange-free") {
    val spark = graft.SparkSuite.spark
    import spark.implicits._
    val rows = Seq(
      (1L, Subtitles.encodeSrt(Seq(Cue(0, 900, "a"), Cue(1000, 1900, "b")))),
      (2L, "junk"))
      .toDF("doc_id", "content")
    val out = Subtitles.extractCues(rows)
    val got = out.orderBy("doc_id", "cue_idx").collect()
    assert(got.length == 3)
    assert(got(0).getString(1) == "srt" && got(0).getLong(3) == 0 &&
      got(0).getLong(4) == 900 && got(0).getString(5) == "a")
    assert(got(2).getString(1) == "corrupt" && got(2).isNullAt(2))
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
