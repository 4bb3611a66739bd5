package graft.sources

import java.nio.charset.StandardCharsets.US_ASCII
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {

  private def rec(i: Int): Array[Byte] =
    Warc.encodeResponse(s"https://ex.org/d/$i", "2026-08-14T00:00:00Z",
      200 + i, "OK", s"body number $i with words".getBytes(US_ASCII))

  test("multi-record roundtrip: plain and gzip members interleaved") {
    val bytes = Array.concat(
      rec(0), Warc.gzipMember(rec(1)), rec(2), Warc.gzipMember(rec(3)))
    val got = Warc.parseAll(bytes)
    assert(got.length == 4)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.warcType == "response")
      assert(r.targetUri == s"https://ex.org/d/$i")
      assert(r.httpStatus == 200 + i)
      assert(new String(r.body, US_ASCII) == s"body number $i with words")
    }
    // records tile the file: offsets strictly increase from 0
    assert(got.head.offset == 0L)
    assert(got.map(_.offset).distinct.length == 4)
  }

  test("gzip member with FNAME/FEXTRA-free JDK output is byte-deterministic") {
    assert(Warc.gzipMember(rec(7)).toSeq == Warc.gzipMember(rec(7)).toSeq)
  }

  private def expectReject(bytes: Array[Byte], needle: String): Unit = {
    val e = intercept[IllegalArgumentException](Warc.parseAll(bytes))
    assert(e.getMessage.contains(needle), e.getMessage)
  }

  test("hostile inputs reject loudly: bad magic, truncation, lying lengths") {
    // bad version line
    expectReject("HELLO/9 nonsense\r\n\r\n".getBytes(US_ASCII), "bad version")
    // truncated mid-headers (no terminating CRLF)
    expectReject("WARC/1.0\r\nWARC-Type: response".getBytes(US_ASCII),
      "unterminated line")
    // Content-Length past end of input
    val lying = new String(rec(0), US_ASCII)
      .replaceFirst("Content-Length: \\d+\r\n\r\nHTTP",
        "Content-Length: 99999\r\n\r\nHTTP")
    expectReject(lying.getBytes(US_ASCII), "runs past")
    // negative Content-Length
    val neg = new String(rec(0), US_ASCII)
      .replaceFirst("Content-Length: \\d+\r\n\r\nHTTP",
        "Content-Length: -5\r\n\r\nHTTP")
    expectReject(neg.getBytes(US_ASCII), "negative Content-Length")
    // non-numeric Content-Length
    val nonnum = new String(rec(0), US_ASCII)
      .replaceFirst("Content-Length: \\d+\r\n\r\nHTTP",
        "Content-Length: lots\r\n\r\nHTTP")
    expectReject(nonnum.getBytes(US_ASCII), "non-numeric Content-Length")
    // last byte truncated: the length check catches it first
    expectReject(rec(0).dropRight(1), "runs past")
    // corrupted terminator with lengths intact
    val r = rec(0)
    r(r.length - 1) = 'X'
    expectReject(r, "not terminated by CRLF CRLF")
  }

  test("hostile gzip members reject loudly: truncation, corruption, bomb cap") {
    val gz = Warc.gzipMember(rec(1))
    // truncated member
    val e1 = intercept[IllegalArgumentException](
      Warc.parseAll(gz.dropRight(10)))
    assert(e1.getMessage.contains("truncated"), e1.getMessage)
    // corrupted deflate bytes
    val bad = gz.clone(); bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x5a).toByte
    val e2 = intercept[IllegalArgumentException](Warc.parseAll(bad))
    assert(e2.getMessage.toLowerCase.contains("corrupt") ||
      e2.getMessage.contains("truncated") ||
      e2.getMessage.contains("WARC"), e2.getMessage)
    // trailer CRC corruption (deflate stream itself intact)
    val crcBad = gz.clone()
    crcBad(crcBad.length - 6) = (crcBad(crcBad.length - 6) ^ 0x7f).toByte
    val eCrc = intercept[IllegalArgumentException](Warc.parseAll(crcBad))
    assert(eCrc.getMessage.contains("CRC32 mismatch"), eCrc.getMessage)
    // trailer ISIZE corruption
    val szBad = gz.clone()
    szBad(szBad.length - 1) = (szBad(szBad.length - 1) ^ 0x01).toByte
    val eSz = intercept[IllegalArgumentException](Warc.parseAll(szBad))
    assert(eSz.getMessage.contains("ISIZE mismatch"), eSz.getMessage)
    // expansion cap: a member inflating past maxInflate trips the guard
    val big = Warc.gzipMember(Warc.encodeResponse("https://x", "d", 200, "OK",
      Array.fill(100000)('a'.toByte)))
    val e3 = intercept[IllegalArgumentException](
      Warc.parseAll(big, maxInflate = 1024))
    assert(e3.getMessage.contains("zip-bomb guard"), e3.getMessage)
    // garbage after a valid record (neither gzip nor WARC) rejects
    expectReject(Array.concat(rec(0), "garbage line\r\n\r\n".getBytes(US_ASCII)),
      "bad version")
    // garbage with no line structure at all rejects on truncation
    expectReject(Array.concat(rec(0), "garbage!".getBytes(US_ASCII)),
      "unterminated line")
  }

  test("http payload parsing: status extracted, headers stripped from body") {
    val custom = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: https://a\r\nContent-Length: 44\r\n\r\n" +
      "HTTP/1.1 301 Moved\r\nLocation: /b\r\n\r\nredirect" +
      "\r\n\r\n").getBytes(US_ASCII)
    val got = Warc.parseAll(custom)
    assert(got.length == 1)
    assert(got.head.httpStatus == 301)
    assert(new String(got.head.body, US_ASCII) == "redirect")
  }

  test("rejections carry the offending offset structurally") {
    val a = Warc.encodeResponse("https://w/a", "2026-08-14T00:00:00Z",
      200, "OK", "payload a".getBytes(US_ASCII))
    val b = Warc.encodeResponse("https://w/b", "2026-08-14T00:00:00Z",
      200, "OK", "payload b".getBytes(US_ASCII))
    // second record truncated: rejection names ITS offset (a.length),
    // not 0 — the field a quarantine row records
    val e = intercept[Warc.WarcParseException] {
      Warc.parseAll(a ++ b.dropRight(10))
    }
    assert(e.offset == a.length.toLong, s"${e.offset} vs ${a.length}")
    // parseAllOr: same strict parse, quarantined instead of thrown
    Warc.parseAllOr(a ++ b.dropRight(10)) match {
      case Left(q) =>
        assert(q.offset == a.length.toLong && q.reason == e.getMessage)
      case Right(r) => fail(s"expected quarantine, parsed ${r.length}")
    }
    assert(Warc.parseAllOr(a ++ b).map(_.length) == Right(2))
    // a corrupt gzip member reports the MEMBER's offset
    val gz = Warc.gzipMember(b)
    val corrupt = gz.take(gz.length - 12) ++
      Array.fill[Byte](4)(0x55) ++ gz.takeRight(8)
    val e2 = intercept[Warc.WarcParseException] {
      Warc.parseAll(a ++ corrupt)
    }
    assert(e2.offset == a.length.toLong, e2.getMessage)
  }
}
