package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** RFC 9309 Robots Exclusion Protocol semantics, pinned by hand
  * against the RFC's own precedence rules: group runs and selection,
  * specific-agent-beats-star, rule merging across same-agent groups,
  * longest-match precedence, allow-wins-ties, `*`/`$` wildcards,
  * LIKE-metacharacter escaping, defaults, and hostile input. */
class RobotsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def robotsDf(body: String, host: String = "h.ex"): DataFrame =
    Seq((host, body)).toDF("host", "body")

  private def rules(body: String, agent: String = "GraftBot")
      : Seq[(Boolean, String, String)] =
    Robots.parseRules(robotsDf(body), "host", "body", agent)
      .select("rule_allow", "pattern", "grp")
      .collect().map(r => (r.getBoolean(0), r.getString(1), r.getString(2)))
      .toSeq.sortBy(_._2)

  private def decide(body: String, urls: Seq[String],
      agent: String = "GraftBot"): Seq[(Boolean, String)] = {
    val pages = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
    Robots.filterUrls(pages,
        Robots.parseRules(robotsDf(body), "host", "body", agent),
        "id", "url")
      .orderBy("id")
      .collect().map(r => (r.getBoolean(3), r.getString(6))).toSeq
  }

  test("star group applies when no specific group names the agent") {
    val body =
      """User-agent: FooBot
        |Disallow: /
        |
        |User-agent: *
        |Disallow: /private/
        |Allow: /private/ok
        |""".stripMargin
    assert(rules(body) == Seq(
      (false, "/private/", "star"), (true, "/private/ok", "star")))
    assert(decide(body, Seq(
      "https://h.ex/pub/a",        // no match -> default allow
      "https://h.ex/private/a",    // disallow
      "https://h.ex/private/okay", // longer allow wins
      "https://h.ex/")) == Seq(    // FooBot's Disallow:/ must not leak
      (true, "default"), (false, "star"), (true, "star"), (true, "default")))
  }

  test("specific group wins and star groups are then ignored entirely") {
    val body =
      """User-agent: *
        |Disallow: /private/
        |
        |User-agent: OtherBot
        |User-agent: GraftBot
        |Disallow: /g/
        |""".stripMargin
    assert(rules(body) == Seq((false, "/g/", "agent")))
    assert(decide(body, Seq(
      "https://h.ex/private/a", // star rule IGNORED for the named agent
      "https://h.ex/g/a")) ==
      Seq((true, "default"), (false, "agent")))
    // a bot NOT named still gets the star group
    assert(decide(body, Seq("https://h.ex/private/a"), agent = "ZBot") ==
      Seq((false, "star")))
  }

  test("agent token match is case-insensitive and exact") {
    val body = "User-agent: gRaFtBoT\nDisallow: /x\n"
    assert(rules(body, "GraftBot") == Seq((false, "/x", "agent")))
    // a different token is not a match (no substring semantics)
    assert(rules(body, "GraftBotJunior").isEmpty)
  }

  test("two groups naming the same agent merge their rules") {
    val body =
      """User-agent: GraftBot
        |Disallow: /a/
        |
        |User-agent: GraftBot
        |Disallow: /b/
        |""".stripMargin
    assert(rules(body) ==
      Seq((false, "/a/", "agent"), (false, "/b/", "agent")))
  }

  test("rules before any group, empty patterns, comments, junk lines") {
    val body =
      """# header comment
        |Disallow: /orphaned
        |no colon here
        |User-agent: * # trailing comment
        |Disallow:
        |Disallow: /real # comment after rule
        |Sitemap: https://h.ex/sm.xml
        |Crawl-delay: 10
        |Allow: /real/ok
        |""".stripMargin
    // orphan dropped, empty Disallow dropped, comments stripped,
    // Sitemap/Crawl-delay/junk do NOT terminate the group
    assert(rules(body) ==
      Seq((false, "/real", "star"), (true, "/real/ok", "star")))
  }

  test("a later User-agent run starts a NEW group (rules split)") {
    val body =
      """User-agent: GraftBot
        |Disallow: /a/
        |User-agent: *
        |Disallow: /b/
        |""".stripMargin
    // the star group exists but is ignored (specific present)
    assert(rules(body) == Seq((false, "/a/", "agent")))
  }

  test("empty Disallow terminates a User-agent run (groups stay separate)") {
    // the real-world opt-in idiom: the named agent gets allow-all, the
    // world gets deny-all — the empty Disallow must END GraftBot's
    // User-agent line run so the two groups never merge (RFC 9309 §2.2.1)
    val body =
      """User-agent: GraftBot
        |Disallow:
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(rules(body) == Seq.empty) // named group chosen, zero rules
    assert(decide(body, Seq("https://h.ex/anything")) ==
      Seq((true, "default")))
    // and the world really is denied
    assert(decide(body, Seq("https://h.ex/anything"), agent = "ZBot") ==
      Seq((false, "star")))
    // same shape with empty Allow as the terminator
    val body2 = "User-agent: A\nAllow:\nUser-agent: *\nDisallow: /z\n"
    assert(rules(body2, "A").isEmpty)
    assert(rules(body2, "ZBot") == Seq((false, "/z", "star")))
  }

  test("wildcards: * crosses /, trailing $ anchors the end") {
    val body =
      """User-agent: *
        |Disallow: /*.tmp$
        |Disallow: /dl/*/x
        |""".stripMargin
    assert(decide(body, Seq(
      "https://h.ex/a.tmp",        // anchored match
      "https://h.ex/d/e/f.tmp",    // * crosses path segments
      "https://h.ex/a.tmp.txt",    // $ really anchors -> allow
      "https://h.ex/dl/p/q/x",     // mid-pattern wildcard
      "https://h.ex/dl/x")) == Seq(
      (false, "star"), (false, "star"), (true, "default"),
      (false, "star"), (true, "default")))
  }

  test("longest match wins; allow beats disallow at equal length") {
    val body =
      """User-agent: *
        |Disallow: /p
        |Allow: /page
        |Disallow: /t/a
        |Allow: /t/a
        |""".stripMargin
    assert(decide(body, Seq(
      "https://h.ex/pq",     // only /p matches -> deny
      "https://h.ex/page1",  // /page (5) beats /p (2) -> allow
      "https://h.ex/t/ab")) == Seq( // 4 vs 4 tie -> allow
      (false, "star"), (true, "star"), (true, "star")))
  }

  test("match target is path+query with fragment stripped; root is /") {
    val body =
      """User-agent: *
        |Disallow: /s?q=
        |Disallow: /frag#x
        |Allow: /$
        |Disallow: /
        |""".stripMargin
    assert(decide(body, Seq(
      "https://h.ex/s?q=1",     // query participates in the match
      "https://h.ex/frag",      // '#x' was comment-stripped server-side
      "https://h.ex",           // empty path -> "/" -> anchored Allow
      "https://h.ex/other")) == Seq(
      (false, "star"), (false, "star"), (true, "star"), (false, "star")))
  }

  test("host extraction: case, port, userinfo; unknown host defaults") {
    val body = "User-agent: *\nDisallow: /x\n"
    val pages = Seq(
      (0L, "HTTPS://H.EX:443/x1"),     // case+port -> h.ex
      (1L, "https://u:p@h.ex/x2"),     // userinfo stripped
      (2L, "https://other.ex/x3"))     // no robots for this host
      .toDF("id", "url")
    val out = Robots.filterUrls(pages,
        Robots.parseRules(robotsDf(body), "host", "body", "B"), "id", "url")
      .orderBy("id")
      .collect().map(r => (r.getString(2), r.getBoolean(3), r.getString(6)))
    assert(out.toSeq == Seq(("h.ex", false, "star"),
      ("h.ex", false, "star"), ("other.ex", true, "default")))
  }

  test("LIKE metacharacters in patterns and paths stay literal") {
    val body =
      """User-agent: *
        |Disallow: /a_b%c!d
        |""".stripMargin
    assert(decide(body, Seq(
      "https://h.ex/a_b%c!d-tail",  // literal match
      "https://h.ex/aXb%c!d",       // _ must NOT act as wildcard
      "https://h.ex/a_bXc!d")) == Seq( // % must NOT act as wildcard
      (false, "star"), (true, "default"), (true, "default")))
  }

  test("hostile input: binary junk never throws, yields no rules") {
    val junk = new String(Array.tabulate(256)(i => (i % 251 + 1).toChar))
    assert(rules(junk + "\n:::\nUser-agent\nDisallow /x").isEmpty)
    // and decisions over it default-allow
    assert(decide(junk, Seq("https://h.ex/x")) == Seq((true, "default")))
  }
}
