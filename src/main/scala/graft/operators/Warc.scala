package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.{Charset, StandardCharsets}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record (ISO 28500 / WARC 1.1; the Common-Crawl
  * container format for raw crawl data — WARC response/request records,
  * WET `conversion` text extracts, WAT `metadata`).
  *
  * `http_status`/`mime`/`charset` are resolved only for records whose
  * block is an HTTP message (`application/http`); for WET conversion
  * records `mime`/`charset` come from the record's own Content-Type.
  * `charset` resolution order: HTTP header param → `<meta charset>` /
  * `http-equiv` sniff in the first 1024 body bytes (text/html only) →
  * "utf-8" (the WHATWG default). `body` is the raw payload bytes —
  * decode with [[Warc.decodeBody]].
  */
final case class WarcRecord(
    rec_index: Long,
    warc_type: String,
    record_id: String,
    target_uri: String,
    warc_date: String,
    rec_content_type: String,
    content_length: Long,
    http_status: Option[Long],
    mime: String,
    charset: String,
    body: Array[Byte])

/** WARC/WET ingestion — the input end of the crawl stack (reference has
  * no crawl stage; builder-brief surface). Raw pre-training corpora
  * arrive as Common-Crawl WARC files: records framed by a header block
  * and an exact Content-Length, each record usually its own gzip member,
  * members concatenated. This parser feeds the existing
  * HtmlText → UrlCanon → Robots operators with (uri, date, mime,
  * charset, body) columns.
  *
  * Determinism discipline: framing is by declared Content-Length only —
  * a body CONTAINING "WARC/1.0" must not split a record (spec-pinned).
  * Damaged tails (truncated final record, garbage after the last
  * terminator) end iteration with the records parsed so far, the
  * Common-Crawl convention for salvaging partial files.
  *
  * Scale: one WARC file is the unit of parallelism (`binaryFile` →
  * [[records]] flatMap — no shuffle; 1000 executors × ~1 GB files
  * stream independently). Records iterate lazily so a file's records
  * never materialize as one Seq; the file bytes themselves do (the
  * `binaryFile` contract) — a production long-tail would swap the
  * source for a streaming DataSourceV2 split reader, same parser.
  */
object Warc extends Serializable {

  private val CRLF = "\r\n"

  // ---------------------------------------------------------------- build

  /** Serialize one WARC `response` record (HTTP message block). */
  def buildResponseRecord(uri: String, date: String, recordId: String,
                          status: Int, reason: String,
                          httpHeaders: Seq[(String, String)],
                          body: Array[Byte]): Array[Byte] = {
    val http = new StringBuilder()
      .append(s"HTTP/1.1 $status $reason").append(CRLF)
    httpHeaders.foreach { case (k, v) => http.append(s"$k: $v").append(CRLF) }
    http.append(CRLF)
    val httpBytes = http.toString.getBytes(StandardCharsets.US_ASCII)
    val block = httpBytes ++ body
    buildRecord("response", uri, date, recordId,
      "application/http; msgtype=response", block)
  }

  /** Serialize one WET-style `conversion` record (plain payload block). */
  def buildConversionRecord(uri: String, date: String, recordId: String,
                            contentType: String,
                            body: Array[Byte]): Array[Byte] =
    buildRecord("conversion", uri, date, recordId, contentType, body)

  /** Serialize an arbitrary record; `uri` may be null (warcinfo). */
  def buildRecord(warcType: String, uri: String, date: String,
                  recordId: String, contentType: String,
                  block: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder()
      .append("WARC/1.0").append(CRLF)
      .append(s"WARC-Type: $warcType").append(CRLF)
    if (uri != null) h.append(s"WARC-Target-URI: $uri").append(CRLF)
    h.append(s"WARC-Date: $date").append(CRLF)
      .append(s"WARC-Record-ID: <urn:uuid:$recordId>").append(CRLF)
      .append(s"Content-Type: $contentType").append(CRLF)
      .append(s"Content-Length: ${block.length}").append(CRLF)
      .append(CRLF)
    h.toString.getBytes(StandardCharsets.US_ASCII) ++ block ++
      (CRLF + CRLF).getBytes(StandardCharsets.US_ASCII)
  }

  /** Wrap one serialized record as its own gzip member (the Common-Crawl
    * record-at-a-time compression that keeps members independently
    * seekable; concatenated members form a valid .warc.gz).
    */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new GZIPOutputStream(bos)
    gz.write(record); gz.close()
    bos.toByteArray
  }

  // ---------------------------------------------------------------- parse

  /** Gzip-decompress when the magic matches (multi-member streams
    * decompress end-to-end — `GZIPInputStream` chains members); plain
    * bytes pass through.
    */
  def decompressIfGzip(bytes: Array[Byte]): Array[Byte] = {
    if (bytes.length < 2 ||
      (bytes(0) & 0xFF) != 0x1F || (bytes(1) & 0xFF) != 0x8B) return bytes
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes), 65536)
    val out = new ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) { if (n > 0) out.write(buf, 0, n); n = in.read(buf) }
    in.close()
    out.toByteArray
  }

  /** Lazily parse a (possibly gzipped) WARC byte stream into records.
    * Content-Length frames every block; CRLF and bare-LF header line
    * endings both accepted; a malformed or truncated record ends the
    * iterator at the records parsed so far.
    */
  def parseRecords(fileBytes: Array[Byte]): Iterator[WarcRecord] = {
    val bytes = decompressIfGzip(fileBytes)
    new Iterator[WarcRecord] {
      private var pos = 0
      private var idx = 0L
      private var nextRec: WarcRecord = null
      private var done = false

      private def lineAt(p: Int): (String, Int) = {
        // returns (line without terminator, position after terminator)
        var e = p
        while (e < bytes.length && bytes(e) != '\n') e += 1
        if (e >= bytes.length) return (null, bytes.length)
        val end = if (e > p && bytes(e - 1) == '\r') e - 1 else e
        (new String(bytes, p, end - p, StandardCharsets.US_ASCII), e + 1)
      }

      private def advance(): Unit = {
        nextRec = null
        if (done) return
        // skip inter-record CRLF/LF padding
        while (pos < bytes.length &&
          (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1
        if (pos >= bytes.length) { done = true; return }
        val (ver, p1) = lineAt(pos)
        if (ver == null || !ver.startsWith("WARC/")) { done = true; return }
        var p = p1
        val headers = scala.collection.mutable.Map.empty[String, String]
        var ok = true
        var blank = false
        while (ok && !blank) {
          val (ln, np) = lineAt(p)
          if (ln == null) ok = false
          else {
            p = np
            if (ln.isEmpty) blank = true
            else ln.indexOf(':') match {
              case -1 => // tolerate and skip malformed header lines
              case i => headers(ln.substring(0, i).trim
                .toLowerCase(java.util.Locale.ROOT)) =
                ln.substring(i + 1).trim
            }
          }
        }
        val len = headers.get("content-length").flatMap(v =>
          scala.util.Try(v.toLong).toOption).getOrElse(-1L)
        if (!ok || len < 0 || len > Int.MaxValue ||
          p + len > bytes.length) { done = true; return }
        val block = java.util.Arrays.copyOfRange(bytes, p, p + len.toInt)
        pos = p + len.toInt
        val warcType = headers.getOrElse("warc-type", "")
        val recCt = headers.getOrElse("content-type", "")
        val rec = parseBlock(idx, warcType,
          headers.getOrElse("warc-record-id", ""),
          headers.getOrElse("warc-target-uri", null),
          headers.getOrElse("warc-date", ""), recCt, len, block)
        idx += 1
        nextRec = rec
      }

      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRecord = {
        val r = nextRec; advance(); r
      }
    }
  }

  /** Resolve the HTTP message / payload inside one record block. */
  private def parseBlock(idx: Long, warcType: String, recordId: String,
                         uri: String, date: String, recCt: String,
                         len: Long, block: Array[Byte]): WarcRecord = {
    val isHttp = recCt.toLowerCase(java.util.Locale.ROOT)
      .startsWith("application/http")
    if (isHttp) {
      // status line + headers end at the first blank line
      var i = 0
      var bodyAt = block.length
      var lineStart = 0
      var statusLine: String = null
      val hh = scala.collection.mutable.Map.empty[String, String]
      var scanning = true
      while (scanning && i <= block.length) {
        if (i == block.length || block(i) == '\n') {
          val end = if (i > lineStart && i <= block.length &&
            i - 1 >= lineStart && block(i - 1) == '\r') i - 1 else i
          val line = new String(block, lineStart,
            math.max(0, end - lineStart), StandardCharsets.US_ASCII)
          if (statusLine == null) statusLine = line
          else if (line.isEmpty) { bodyAt = i + 1; scanning = false }
          else line.indexOf(':') match {
            case -1 =>
            case j => hh(line.substring(0, j).trim
              .toLowerCase(java.util.Locale.ROOT)) =
              line.substring(j + 1).trim
          }
          lineStart = i + 1
        }
        i += 1
      }
      val status = Option(statusLine).flatMap { sl =>
        val parts = sl.split(" ")
        if (parts.length >= 2 && parts(0).startsWith("HTTP/"))
          scala.util.Try(parts(1).toLong).toOption
        else None
      }
      val body =
        if (bodyAt >= block.length) Array.emptyByteArray
        else java.util.Arrays.copyOfRange(block, bodyAt, block.length)
      val (mime, hdrCharset) = splitContentType(hh.getOrElse("content-type", ""))
      val charset = hdrCharset
        .orElse(if (mime == "text/html") sniffMetaCharset(body) else None)
        .getOrElse("utf-8")
      WarcRecord(idx, warcType, recordId, uri, date, recCt, len,
        status, if (mime.isEmpty) null else mime, charset, body)
    } else {
      val (mime, cs) = splitContentType(recCt)
      WarcRecord(idx, warcType, recordId, uri, date, recCt, len,
        None, if (mime.isEmpty) null else mime,
        cs.getOrElse("utf-8"), block)
    }
  }

  /** "text/html; charset=UTF-8" → ("text/html", Some("utf-8")). */
  def splitContentType(ct: String): (String, Option[String]) = {
    if (ct == null || ct.isEmpty) return ("", None)
    val parts = ct.split(";")
    val mime = parts(0).trim.toLowerCase(java.util.Locale.ROOT)
    val cs = parts.iterator.drop(1).map(_.trim)
      .find(_.toLowerCase(java.util.Locale.ROOT).startsWith("charset="))
      .map(_.substring("charset=".length).trim
        .stripPrefix("\"").stripSuffix("\"")
        .toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty)
    (mime, cs)
  }

  /** `<meta charset=X>` / `<meta http-equiv=Content-Type content=...>`
    * sniff over the first 1024 bytes (the WHATWG prescan, ASCII-safe).
    */
  def sniffMetaCharset(body: Array[Byte]): Option[String] = {
    val n = math.min(body.length, 1024)
    val head = new String(body, 0, n, StandardCharsets.ISO_8859_1)
      .toLowerCase(java.util.Locale.ROOT)
    val direct = "<meta\\s+charset\\s*=\\s*[\"']?([a-z0-9_\\-]+)".r
    direct.findFirstMatchIn(head).map(_.group(1)).orElse {
      val equiv = ("<meta\\s+http-equiv\\s*=\\s*[\"']?content-type[\"']?" +
        "\\s+content\\s*=\\s*[\"'][^\"']*charset=([a-z0-9_\\-]+)").r
      equiv.findFirstMatchIn(head).map(_.group(1))
    }
  }

  /** Decode a payload with its resolved charset, utf-8 fallback on an
    * unknown label (crawl data lies about encodings; never throw).
    */
  def decodeBody(body: Array[Byte], charset: String): String = {
    val cs =
      try Charset.forName(if (charset == null) "utf-8" else charset)
      catch { case _: Exception => StandardCharsets.UTF_8 }
    new String(body, cs)
  }

  /** File-level entry point: a `binaryFile`-shaped frame (`pathCol`,
    * `contentCol`) → one row per WARC record with the file path kept.
    * No shuffle; parallelism = input files.
    */
  def records(files: DataFrame, pathCol: String = "path",
              contentCol: String = "content"): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select(col(pathCol).cast("string"), col(contentCol))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        parseRecords(bytes).map(r => (path, r))
      }
      .toDF("path", "rec")
      .select(col("path"), col("rec.*"))
  }
}
