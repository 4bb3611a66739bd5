package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Full-PSL registrable-domain semantics, driven end-to-end through a
  * vendored ~400-rule subset of the real Public Suffix List
  * (src/test/resources/psl_subset.dat, publicsuffix.org — see the
  * file header) — the wildcard and exception rules the built-in
  * 2-label subset cannot express. */
class PslSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private lazy val rules: PslRules = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/psl_subset.dat"), "UTF-8")
    try PslRules.parse(src.getLines().toSeq) finally src.close()
  }

  private def domains(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(CorpusMix.registrableDomain(col("url"), rules))
      .collect().map(_.getString(0)).toSeq

  test("fixture parses into all three rule kinds at multiple depths") {
    assert(rules.exact.getOrElse(1, Nil).contains("com"))
    assert(rules.exact.getOrElse(2, Nil).contains("co.uk"))
    assert(rules.wildcard.getOrElse(1, Nil).contains("ck"))
    assert(rules.wildcard.getOrElse(2, Nil).contains("kawasaki.jp"))
    assert(rules.exception.getOrElse(2, Nil).contains("www.ck"))
    assert(rules.exception.getOrElse(3, Nil).contains("city.kawasaki.jp"))
    // private-section rules parse like any exact rule
    assert(rules.exact.getOrElse(2, Nil).contains("github.io"))
    assert(rules.exact.getOrElse(3, Nil).contains("s3.amazonaws.com"))
  }

  test("wildcard rules: every label under the suffix is itself public") {
    // *.ck -> bar.ck is a public suffix; foo.bar.ck is registrable
    assert(domains("https://foo.bar.ck/x", "http://x.foo.bar.ck",
      "https://a.b.x.foo.bar.ck") ==
      Seq("foo.bar.ck", "foo.bar.ck", "foo.bar.ck"))
    // *.kawasaki.jp (3-label public suffixes)
    assert(domains("https://shop.example.kawasaki.jp") ==
      Seq("shop.example.kawasaki.jp"))
    // a host that IS a public suffix has no registrable parent ->
    // passthrough (like the subset path's bare-host behavior)
    assert(domains("https://example.kawasaki.jp") ==
      Seq("example.kawasaki.jp"))
  }

  test("exception rules carve hosts back out of a wildcard") {
    // !www.ck: www.ck is NOT a public suffix -> registrable is www.ck
    assert(domains("https://www.ck/", "https://sub.www.ck/") ==
      Seq("www.ck", "www.ck"))
    // !city.kawasaki.jp: the canonical PSL example — its public
    // suffix is kawasaki.jp, so city.kawasaki.jp is registrable
    assert(domains("https://city.kawasaki.jp",
      "https://a.city.kawasaki.jp", "https://x.y.city.kawasaki.jp") ==
      Seq("city.kawasaki.jp", "city.kawasaki.jp", "city.kawasaki.jp"))
  }

  test("exact rules at depths 1-3, longest match prevailing") {
    assert(domains(
      "https://www.example.com/p",        // default-depth TLD
      "https://a.b.example.co.uk",        // 2-label registry
      "https://user.github.io",           // private-section 2-label
      "https://x.a.sch.uk",               // *.sch.uk wildcard
      "https://bucket.s3.amazonaws.com",  // 3-label exact
      "https://police.uk",                // suffix itself -> passthrough
      "https://x.police.uk") ==
      Seq("example.com", "example.co.uk", "user.github.io", "x.a.sch.uk",
        "bucket.s3.amazonaws.com", "police.uk", "x.police.uk"))
  }

  test("unknown TLDs fall back to the PSL default rule") {
    assert(domains("https://a.b.example.zz") == Seq("example.zz"))
  }

  test("IP literals pass through; agreement with the built-in subset") {
    assert(domains("https://192.168.0.1/x", "https://[2001:DB8::1]:8080/") ==
      Seq("192.168.0.1", "2001:db8::1"))
    // on hosts the built-in 2-label subset covers, the two paths agree
    val urls = Seq("https://www.ex3.com/p?a=1", "https://a.b.co.uk",
      "https://x.com.au", "https://deep.sub.co.jp", "https://single")
    val viaSubset = urls.toDF("url")
      .select(CorpusMix.registrableDomain(col("url")))
      .collect().map(_.getString(0)).toSeq
    assert(domains(urls: _*) == viaSubset, viaSubset.toString)
  }

  test("domainMix runs end-to-end under the full rule set") {
    val d = Seq(
      (1L, "https://blog.foo.bar.ck/a", "en", "one two three"),
      (2L, "https://x.foo.bar.ck/b", "en", "four five"),
      (3L, "https://a.city.kawasaki.jp/c", "ja", "six seven eight"),
      (4L, "https://user.github.io/d", "en", "nine"))
      .toDF("doc_id", "url", "lang", "text")
    val got = CorpusMix.domainMix(d, "url", "lang", "text", rules)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(("foo.bar.ck", "en") -> 2L,
      ("city.kawasaki.jp", "ja") -> 1L, ("user.github.io", "en") -> 1L),
      got.toString)
  }
}
