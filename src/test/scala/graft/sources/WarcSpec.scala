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

  test("conversion (WET) records: round-trip, closed-form length, mixing") {
    val uri = "https://ex.org/page/7"
    val date = "2026-08-15T00:00:00Z"
    for (text <- Seq("", "x", "extracted words here", "a" * 1234)) {
      val b = Warc.encodeConversion(uri, date, text.getBytes(US_ASCII))
      // the closed form the scaladoc promises
      assert(b.length == 154 + 2 * uri.length + date.length +
        text.length.toString.length + text.length,
        s"closed form broke at n=${text.length}")
      val got = Warc.parseAll(b)
      assert(got.length == 1)
      assert(got.head.warcType == "conversion")
      assert(got.head.targetUri == uri)
      assert(got.head.httpStatus == 0) // no HTTP envelope on conversions
      assert(new String(got.head.body, US_ASCII) == text)
    }
    // WET records interleave with responses and gzip members cleanly
    val mixed = Array.concat(rec(0),
      Warc.gzipMember(Warc.encodeConversion(uri, date,
        "wet text".getBytes(US_ASCII))),
      Warc.encodeConversion(uri, date, "more".getBytes(US_ASCII)))
    val types = Warc.parseAll(mixed).map(_.warcType)
    assert(types == Seq("response", "conversion", "conversion"))
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

  test("member index + single-member re-read is byte-identical to full parse") {
    // 6 records: 0,3 plain; 1,2 share ONE gzip member; 4,5 their own
    def rec(i: Int) = Warc.encodeResponse(s"https://w/$i",
      "2026-08-14T00:00:00Z", 200, "OK", s"payload body $i".getBytes(US_ASCII))
    val file = rec(0) ++ Warc.gzipMember(rec(1) ++ rec(2)) ++ rec(3) ++
      Warc.gzipMember(rec(4)) ++ Warc.gzipMember(rec(5))
    val full = Warc.parseAll(file)
    assert(full.length == 6)
    val index = Warc.memberIndex(file)
    assert(index.map(_._3) == (0 until 6).map(i => s"https://w/$i"))
    // records 1 and 2 share their member's offset (the crawl
    // convention); distinct member offsets = 5
    assert(index(1)._1 == index(2)._1)
    assert(index.map(_._1).distinct.length == 5)
    // for EVERY indexed member: re-read from its offset alone —
    // touching no earlier byte, as a range-fetch would — and compare
    // records byte-for-byte with the full parse
    for (off <- index.map(_._1).distinct) {
      val slice = file.drop(off.toInt) // the simulated ranged fetch
      val direct = Warc.parseMemberAt(file, off.toInt)
      val ranged = Warc.parseMemberAt(slice, 0)
      val expect = full.filter(_.offset == off)
      assert(direct.length == expect.length && ranged.length == expect.length)
      direct.zip(ranged).zip(expect).foreach { case ((d, s), e) =>
        assert(d.targetUri == e.targetUri && s.targetUri == e.targetUri)
        assert(java.util.Arrays.equals(d.body, e.body))
        assert(java.util.Arrays.equals(s.body, e.body))
        assert(d.httpStatus == e.httpStatus && s.httpStatus == e.httpStatus)
        assert(d.offset == e.offset) // full-file offsets when unsliced
      }
    }
    // a gzip member mid-file parses alone even if EARLIER bytes are
    // garbage — proof nothing before `at` is touched
    val garbagePrefix = Array.fill[Byte](index(4)._1.toInt)(0x5a)
    val fromGarbage = Warc.parseMemberAt(
      garbagePrefix ++ file.drop(index(4)._1.toInt), index(4)._1.toInt)
    assert(fromGarbage.head.targetUri == "https://w/4")
  }
}
