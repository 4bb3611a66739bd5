package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** WARC (Web ARChive, ISO 28500 / WARC/1.0) reader + writer — the
  * container web corpora actually arrive in (Common Crawl ships WARC).
  * Implemented from the public spec: a file is a concatenation of
  * records, each optionally its own gzip member; a record is a version
  * line, CRLF-separated named headers, an empty line, `Content-Length`
  * payload bytes, and a CRLF CRLF terminator. `response` records carry
  * an HTTP message as payload (status line, headers, empty line, body).
  *
  * Parsing is STRICT with loud clean rejection — the codec-family
  * contract (Laz/Flac/Mp4): every untrusted length is Long-checked
  * against the remaining bytes BEFORE use, headers must terminate,
  * records must tile the file exactly, and gzip members are inflated
  * under an explicit expansion cap so a hostile member cannot balloon
  * memory (the zip-bomb guard). Malformed input throws
  * [[Warc.WarcParseException]] (an IllegalArgumentException carrying
  * the offending byte offset structurally, and naming it in the
  * message) — never an OOM, never a hang, never a silently short
  * result. Ingest pipelines that must survive hostile files use
  * [[Warc.parseAllOr]] to turn the rejection into a quarantine row.
  *
  * Scale model: WARC is processed file-parallel (a crawl is millions
  * of files; records inside one gzip stream are sequential by nature
  * — the same model Common Crawl tooling uses). The byte-level
  * parser here runs per file/payload inside typed partition batches.
  */
object Warc {

  final case class WarcRecord(offset: Long, warcType: String,
      targetUri: String, date: String, httpStatus: Int,
      contentLength: Long, body: Array[Byte],
      // HTTP Content-Type header of a response record ("" when absent
      // or not a response) — the media-pipeline routing key
      httpContentType: String = "")

  /** Every malformed-input rejection throws this, carrying the byte
    * offset of the offending member/record STRUCTURALLY — so a
    * quarantine pipeline records where a blob broke without parsing
    * exception text. Subclasses IllegalArgumentException: callers
    * treating rejections as precondition failures are unchanged. */
  final class WarcParseException(val offset: Long, message: String)
    extends IllegalArgumentException(message)

  private def check(c: Boolean, offset: Long, msg: => String): Unit =
    if (!c) throw new WarcParseException(offset, msg)

  /** A quarantined blob: where it broke and why. */
  final case class WarcQuarantine(offset: Long, reason: String)

  /** Parse-or-quarantine form for crawl ingest, where one hostile
    * file among millions is routine: a malformed blob becomes a
    * Left(offset, reason) instead of failing the caller — the strict
    * parser underneath is unchanged (same checks, same messages). */
  def parseAllOr(bytes: Array[Byte],
      maxInflate: Long = 1L << 30): Either[WarcQuarantine, Seq[WarcRecord]] =
    try Right(parseAll(bytes, maxInflate))
    catch {
      case e: WarcParseException =>
        Left(WarcQuarantine(e.offset, e.getMessage))
    }

  private val Crlf = "\r\n".getBytes(US_ASCII)

  /** Encode one `response` record (uncompressed form). */
  def encodeResponse(uri: String, date: String, status: Int,
      statusText: String, body: Array[Byte],
      contentType: String = "text/plain"): Array[Byte] = {
    val http = new ByteArrayOutputStream()
    http.write(s"HTTP/1.1 $status $statusText\r\n".getBytes(US_ASCII))
    http.write(s"Content-Type: $contentType\r\n".getBytes(US_ASCII))
    http.write(s"Content-Length: ${body.length}\r\n\r\n".getBytes(US_ASCII))
    http.write(body)
    val payload = http.toByteArray
    val out = new ByteArrayOutputStream()
    out.write("WARC/1.0\r\n".getBytes(US_ASCII))
    out.write("WARC-Type: response\r\n".getBytes(US_ASCII))
    out.write(s"WARC-Target-URI: $uri\r\n".getBytes(US_ASCII))
    out.write(s"WARC-Date: $date\r\n".getBytes(US_ASCII))
    out.write("Content-Type: application/http;msgtype=response\r\n"
      .getBytes(US_ASCII))
    out.write(s"Content-Length: ${payload.length}\r\n\r\n".getBytes(US_ASCII))
    out.write(payload)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  /** Encode one `conversion` record — the WET text-extraction shape
    * crawl archives publish next to the raw responses: a plain-text
    * payload with a `WARC-Refers-To` link back to the source
    * response. The refers-to id derives from the source URI
    * (deterministic and replayable; a random UUID would break
    * byte-exact re-runs). Byte length is the closed form
    * `154 + 2·len(uri) + len(date) + len(digits(n)) + n`
    * (n = text bytes) — spec-pinned against the actual encoding. */
  def encodeConversion(uri: String, date: String,
      text: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("WARC/1.0\r\n".getBytes(US_ASCII))
    out.write("WARC-Type: conversion\r\n".getBytes(US_ASCII))
    out.write(s"WARC-Target-URI: $uri\r\n".getBytes(US_ASCII))
    out.write(s"WARC-Date: $date\r\n".getBytes(US_ASCII))
    out.write(s"WARC-Refers-To: <urn:graft:response:$uri>\r\n"
      .getBytes(US_ASCII))
    out.write("Content-Type: text/plain\r\n".getBytes(US_ASCII))
    out.write(s"Content-Length: ${text.length}\r\n\r\n".getBytes(US_ASCII))
    out.write(text)
    out.write(Crlf); out.write(Crlf)
    out.toByteArray
  }

  /** Gzip-wrap one encoded record as its own member (the per-record
    * compression layout crawl archives use). JDK GZIPOutputStream
    * writes MTIME = 0, so the bytes are deterministic. */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record); gz.close()
    bos.toByteArray
  }

  /** Parse a WARC file (mixed plain / per-record-gzip members).
    * `maxInflate` caps the decompressed size of any single gzip member
    * (zip-bomb guard). */
  def parseAll(bytes: Array[Byte],
      maxInflate: Long = 1L << 30): Seq[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var p = 0
    while (p < bytes.length) {
      if (p + 2 <= bytes.length &&
          (bytes(p) & 0xff) == 0x1f && (bytes(p + 1) & 0xff) == 0x8b) {
        val (member, consumed) = inflateMember(bytes, p, maxInflate)
        val recs = parsePlain(member, p)
        check(recs.nonEmpty, p,
          s"WARC: empty gzip member at offset $p")
        recs.foreach(out += _)
        p += consumed
      } else {
        val (rec, next) = parseRecord(bytes, p)
        out += rec
        p = next
      }
    }
    out.result()
  }

  /** Parse the SINGLE member starting at `at` — one gzip member (which
    * may hold several records) or one plain record — touching no byte
    * before `at`: the random-access re-fetch path for a persisted
    * member index (the `offset` column [[parseAll]] reports). A crawl
    * pipeline range-reads `[offset, ...)` from storage and passes the
    * slice with `at = 0`; record offsets in the result are then
    * slice-relative, the member's own bytes identical either way. */
  def parseMemberAt(bytes: Array[Byte], at: Int,
      maxInflate: Long = 1L << 30): Seq[WarcRecord] = {
    check(at >= 0 && at < bytes.length, at.toLong,
      s"WARC: member offset $at out of range (${bytes.length} bytes)")
    if (at + 2 <= bytes.length &&
        (bytes(at) & 0xff) == 0x1f && (bytes(at + 1) & 0xff) == 0x8b) {
      val (member, _) = inflateMember(bytes, at, maxInflate)
      val recs = parsePlain(member, at)
      check(recs.nonEmpty, at.toLong, s"WARC: empty gzip member at offset $at")
      recs
    } else {
      val (rec, _) = parseRecord(bytes, at)
      Seq(rec)
    }
  }

  /** The seekable member index [[parseAll]] implies: one
    * (offset, warc_type, target_uri) row per record, offsets
    * addressing MEMBERS (records inside a gzip member share its
    * start — the crawl convention). Persist alongside the files and
    * re-fetch single members with [[parseMemberAt]]. */
  def memberIndex(bytes: Array[Byte],
      maxInflate: Long = 1L << 30): Seq[(Long, String, String)] =
    parseAll(bytes, maxInflate).map(w => (w.offset, w.warcType, w.targetUri))

  /** Inflate ONE gzip member starting at `at`, returning its exact
    * compressed extent — a GZIPInputStream cannot do this (it buffers
    * past the member boundary), so the header is walked manually and
    * a raw Inflater reports the unconsumed remainder. */
  private def inflateMember(bytes: Array[Byte], at: Int,
      maxInflate: Long): (Array[Byte], Int) = {
    def req(c: Boolean, msg: String): Unit =
      check(c, at, s"WARC: gzip member at offset $at: $msg")
    var p = at
    req(p + 10 <= bytes.length, "truncated header")
    req(bytes(p + 2) == 8, "unsupported compression method")
    val flg = bytes(p + 3) & 0xff
    p += 10
    if ((flg & 4) != 0) { // FEXTRA
      req(p + 2 <= bytes.length, "truncated FEXTRA")
      val xlen = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8)
      p += 2 + xlen
      req(p <= bytes.length, "FEXTRA runs past end of input")
    }
    def skipZ(): Unit = { // zero-terminated field
      while (p < bytes.length && bytes(p) != 0) p += 1
      req(p < bytes.length, "unterminated name/comment field")
      p += 1
    }
    if ((flg & 8) != 0) skipZ()  // FNAME
    if ((flg & 16) != 0) skipZ() // FCOMMENT
    if ((flg & 2) != 0) {        // FHCRC
      p += 2
      req(p <= bytes.length, "truncated FHCRC")
    }
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(bytes, p, bytes.length - p)
      val buf = new Array[Byte](64 * 1024)
      val acc = new ByteArrayOutputStream()
      while (!inf.finished()) {
        val n = try inf.inflate(buf) catch {
          case e: java.util.zip.DataFormatException =>
            throw new WarcParseException(at,
              s"WARC: gzip member at offset $at: corrupt deflate stream " +
                s"(${e.getMessage})")
        }
        // n == 0 without finishing = ran out of input (truncation) or a
        // preset-dictionary stream (unsupported) — loop forever otherwise
        req(n > 0 || inf.finished(), "truncated or unsupported deflate stream")
        acc.write(buf, 0, n)
        req(acc.size() <= maxInflate,
          s"inflates past the $maxInflate-byte cap (zip-bomb guard)")
      }
      val trailer = p + ((bytes.length - p) - inf.getRemaining)
      val end = trailer + 8 // CRC32 + ISIZE
      req(end <= bytes.length, "truncated gzip trailer")
      // validate the trailer — "strict, loud rejection" must include
      // corruption the deflate decoder happens to survive
      def le32(o: Int): Long =
        (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      val out = acc.toByteArray
      val crc = new java.util.zip.CRC32()
      crc.update(out)
      req(crc.getValue == le32(trailer),
        "CRC32 mismatch (corrupt member)")
      req((out.length.toLong & 0xffffffffL) == le32(trailer + 4),
        "ISIZE mismatch (corrupt member)")
      (out, end - at)
    } finally inf.end()
  }

  /** Records inside one gzip member report the MEMBER's file offset
    * (their own offsets are member-relative and not addressable in the
    * compressed file) — the crawl convention of seeking to members. */
  private def parsePlain(member: Array[Byte], fileOffset: Int): Seq[WarcRecord] = {
    val out = Vector.newBuilder[WarcRecord]
    var p = 0
    while (p < member.length) {
      val (rec, next) = parseRecord(member, p)
      out += rec.copy(offset = fileOffset.toLong)
      p = next
    }
    out.result()
  }

  /** One record starting at `p`; returns (record, offset after it). */
  private def parseRecord(b: Array[Byte], p: Int): (WarcRecord, Int) = {
    val (version, afterVersion) = readLine(b, p)
    check(version == "WARC/1.0" || version == "WARC/1.1", p,
      s"WARC: bad version line at offset $p: '${version.take(20)}'")
    var q = afterVersion
    var warcType = ""; var uri = ""; var date = ""
    var contentLength = -1L
    var line = ""
    var guard = 0
    do {
      val (l, next) = readLine(b, q)
      line = l; q = next
      guard += 1
      check(guard <= 64, p, s"WARC: more than 64 header lines at offset $p")
      if (line.nonEmpty) {
        val i = line.indexOf(':')
        check(i > 0, p, s"WARC: malformed header at offset $p: '${line.take(30)}'")
        val (k, v) = (line.substring(0, i).trim, line.substring(i + 1).trim)
        k.toLowerCase(java.util.Locale.ROOT) match {
          case "warc-type" => warcType = v
          case "warc-target-uri" => uri = v
          case "warc-date" => date = v
          case "content-length" =>
            contentLength = try v.toLong catch {
              case _: NumberFormatException => throw new WarcParseException(p,
                s"WARC: non-numeric Content-Length at offset $p: '$v'")
            }
          case _ => ()
        }
      }
    } while (line.nonEmpty)
    check(contentLength >= 0, p,
      s"WARC: missing or negative Content-Length at offset $p")
    // bounds check by SUBTRACTION, not addition: q.toLong +
    // contentLength + 4 can itself overflow Long for a hostile
    // Content-Length near Long.MaxValue and silently pass — comparing
    // contentLength against (remaining - 4) cannot overflow because
    // every term on the right is Int-ranged (the Laz14 lesson, again)
    check(contentLength <= b.length.toLong - q - 4, p,
      s"WARC: Content-Length $contentLength at offset $p runs past " +
        s"end of input (${b.length} bytes)")
    val payload = java.util.Arrays.copyOfRange(b, q, q + contentLength.toInt)
    val end = q + contentLength.toInt
    check(b(end) == '\r' && b(end + 1) == '\n' &&
        b(end + 2) == '\r' && b(end + 3) == '\n', p,
      s"WARC: record at offset $p not terminated by CRLF CRLF")
    val (status, ctype, body) =
      if (warcType == "response") parseHttp(payload, p)
      else (0, "", payload)
    (WarcRecord(p.toLong, warcType, uri, date, status,
      contentLength, body, ctype), end + 4)
  }

  private def parseHttp(payload: Array[Byte],
      at: Int): (Int, String, Array[Byte]) = {
    val (statusLine, afterStatus) = readLine(payload, 0)
    val parts = statusLine.split(" ", 3)
    check(parts.length >= 2 && parts(0).startsWith("HTTP/"), at,
      s"WARC: record at offset $at: bad HTTP status line " +
        s"'${statusLine.take(30)}'")
    val status = try parts(1).toInt catch {
      case _: NumberFormatException => throw new WarcParseException(at,
        s"WARC: record at offset $at: non-numeric HTTP status '${parts(1)}'")
    }
    var q = afterStatus
    var line = ""
    var ctype = ""
    var guard = 0
    do {
      val (l, next) = readLine(payload, q)
      line = l; q = next
      val ci = line.indexOf(':')
      if (ci > 0 && line.substring(0, ci).equalsIgnoreCase("Content-Type"))
        ctype = line.substring(ci + 1).trim
      guard += 1
      check(guard <= 256, at,
        s"WARC: record at offset $at: more than 256 HTTP header lines")
    } while (line.nonEmpty)
    (status, ctype,
      java.util.Arrays.copyOfRange(payload, q, payload.length))
  }

  /** ASCII line up to CRLF; rejects records whose headers never
    * terminate (truncation). */
  private def readLine(b: Array[Byte], p: Int): (String, Int) = {
    var i = p
    while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
    check(i + 1 < b.length, p,
      s"WARC: unterminated line at offset $p (truncated input)")
    (new String(b, p, i - p, US_ASCII), i + 2)
  }
}
