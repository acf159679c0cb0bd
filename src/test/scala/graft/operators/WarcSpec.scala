package graft.operators

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark

  private def ascii(s: String) = s.getBytes(StandardCharsets.US_ASCII)

  private lazy val mixedFile: Array[Byte] = {
    val info = Warc.buildRecord("warcinfo", null,
      "2024-02-01T00:00:00Z", "info-1", "application/warc-fields",
      ascii("software: graft-test\r\n"))
    val req = Warc.buildRecord("request", "https://ex.com/a",
      "2024-02-01T00:00:01Z", "req-1", "application/http; msgtype=request",
      ascii("GET /a HTTP/1.1\r\nHost: ex.com\r\n\r\n"))
    val resp = Warc.buildResponseRecord("https://ex.com/a",
      "2024-02-01T00:00:01Z", "resp-1", 200, "OK",
      Seq("Content-Type" -> "text/html; charset=UTF-8"),
      ascii("<html><head><title>A</title></head><body>hi</body></html>"))
    val wet = Warc.buildConversionRecord("https://ex.com/a",
      "2024-02-01T00:00:01Z", "wet-1", "text/plain; charset=utf-8",
      ascii("hi there"))
    info ++ req ++ resp ++ wet
  }

  test("multi-record file: types, uris, lengths, http fields resolve; " +
      "a body containing the WARC magic does not split its record") {
    val recs = Warc.parseRecords(mixedFile).toSeq
    assert(recs.map(_.warc_type) ===
      Seq("warcinfo", "request", "response", "conversion"))
    assert(recs.map(_.rec_index) === Seq(0L, 1L, 2L, 3L))
    assert(recs(0).target_uri === null)
    assert(recs(2).http_status === Some(200L))
    assert(recs(2).mime === "text/html")
    assert(recs(2).charset === "utf-8")
    assert(new String(recs(2).body, StandardCharsets.US_ASCII)
      .startsWith("<html>"))
    assert(recs(3).http_status === None)
    assert(recs(3).mime === "text/plain")
    assert(new String(recs(3).body, StandardCharsets.US_ASCII) === "hi there")
    // framing is Content-Length only: a body embedding "WARC/1.0\r\n..."
    // must stay one record
    val trap = Warc.buildConversionRecord("https://ex.com/t",
      "2024-02-01T00:00:02Z", "trap-1", "text/plain",
      ascii("WARC/1.0\r\nWARC-Type: response\r\n\r\nnot a record")) ++
      Warc.buildConversionRecord("https://ex.com/u",
        "2024-02-01T00:00:03Z", "after-1", "text/plain", ascii("after"))
    val got = Warc.parseRecords(trap).toSeq
    assert(got.map(_.target_uri) ===
      Seq("https://ex.com/t", "https://ex.com/u"))
    assert(new String(got(0).body, StandardCharsets.US_ASCII)
      .startsWith("WARC/1.0"))
  }

  test("gzip: per-record members concatenated parse identically to the " +
      "plain stream; non-gzip passes through") {
    val plain = Warc.parseRecords(mixedFile).toSeq
    val members = Seq(
      Warc.buildRecord("warcinfo", null, "2024-02-01T00:00:00Z", "info-1",
        "application/warc-fields", ascii("software: graft-test\r\n")),
      Warc.buildResponseRecord("https://ex.com/a", "2024-02-01T00:00:01Z",
        "resp-1", 200, "OK",
        Seq("Content-Type" -> "text/html; charset=UTF-8"),
        ascii("<html><head><title>A</title></head><body>hi</body></html>")))
    val gz = members.map(Warc.gzipMember).reduce(_ ++ _)
    val got = Warc.parseRecords(gz).toSeq
    assert(got.map(_.warc_type) === Seq("warcinfo", "response"))
    assert(got(1).http_status === Some(200L))
    assert(Warc.decompressIfGzip(mixedFile) eq mixedFile) // passthrough
  }

  test("charset precedence: HTTP header beats meta sniff beats the " +
      "utf-8 default; unknown labels decode with the utf-8 fallback") {
    def resp(ct: String, body: String) =
      Warc.parseRecords(Warc.buildResponseRecord("https://ex.com/c",
        "2024-02-01T00:00:00Z", "c-1", 200, "OK",
        Seq("Content-Type" -> ct), ascii(body))).toSeq.head
    val header = resp("text/html; charset=ISO-8859-1",
      "<html><head><meta charset=\"utf-8\"></head></html>")
    assert(header.charset === "iso-8859-1")
    val meta = resp("text/html",
      "<html><head><meta charset='koi8-r'></head></html>")
    assert(meta.charset === "koi8-r")
    val equiv = resp("text/html",
      "<html><head><meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=windows-1251\"></head></html>")
    assert(equiv.charset === "windows-1251")
    val none = resp("text/html", "<html><body>x</body></html>")
    assert(none.charset === "utf-8")
    // non-html http payloads never sniff
    val json = resp("application/json", "{\"a\": \"<meta charset=x>\"}")
    assert(json.charset === "utf-8" && json.mime === "application/json")
    assert(Warc.decodeBody(ascii("abc"), "no-such-charset") === "abc")
  }

  test("damaged tails: truncated final record and trailing garbage end " +
      "iteration with the salvaged prefix; empty body and 301 frames") {
    val good = Warc.buildConversionRecord("https://ex.com/g",
      "2024-02-01T00:00:00Z", "g-1", "text/plain", ascii("ok"))
    val truncated = good ++ ascii(
      "WARC/1.0\r\nWARC-Type: conversion\r\n" +
        "WARC-Target-URI: https://ex.com/bad\r\n" +
        "Content-Type: text/plain\r\nContent-Length: 999\r\n\r\nshort")
    assert(Warc.parseRecords(truncated).toSeq.map(_.target_uri) ===
      Seq("https://ex.com/g"))
    val garbage = good ++ ascii("not a warc header at all")
    assert(Warc.parseRecords(garbage).toSeq.size === 1)
    val redirect = Warc.buildResponseRecord("https://ex.com/r",
      "2024-02-01T00:00:00Z", "r-1", 301, "Moved Permanently",
      Seq("Location" -> "https://ex.com/new", "Content-Type" -> "text/html"),
      Array.emptyByteArray)
    val r = Warc.parseRecords(redirect).toSeq.head
    assert(r.http_status === Some(301L))
    assert(r.body.isEmpty)
    assert(r.charset === "utf-8")
  }

  test("records(): binaryFile-shaped frame explodes to per-record rows " +
      "with the path kept; no shuffle in the plan") {
    import spark.implicits._
    val files = Seq(
      ("f0.warc", mixedFile),
      ("f1.warc.gz", Warc.gzipMember(Warc.buildConversionRecord(
        "https://ex.com/z", "2024-02-01T00:00:09Z", "z-1",
        "text/plain", ascii("zzz")))))
      .toDF("path", "content")
    val out = Warc.records(files)
    assert(out.count() === 5)
    assert(out.filter($"path" === "f1.warc.gz").select($"target_uri")
      .head().getString(0) === "https://ex.com/z")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1500))
  }
}
