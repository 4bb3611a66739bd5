package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (RFC 9309) — the crawl-compliance filter a
  * training-data pipeline runs RETROACTIVELY over an already-fetched
  * corpus: "which of these pages does the publisher's robots.txt allow
  * MY bot to use?" (AI-training opt-outs are expressed exactly this
  * way: a `User-agent: SomeBot` group with `Disallow: /`).
  *
  * Semantics implemented (the RFC 9309 core):
  *   - groups = one or more `User-agent:` lines followed by
  *     `Allow:`/`Disallow:` rules; a later `User-agent:` run starts a
  *     new group; rules BEFORE any group line are ignored; blank lines
  *     and `#` comments are stripped; unknown directives (`Sitemap:`,
  *     `Crawl-delay:`, junk without a colon) never terminate a group.
  *   - group selection: if ANY group names the bot's product token
  *     (case-insensitive exact token match), the union of those
  *     groups' rules applies and every `*` group is IGNORED; otherwise
  *     the `*` groups apply; a host with no applicable group (or no
  *     robots.txt at all) defaults to allow.
  *   - rule match: patterns match the URL's path-plus-query
  *     (fragment stripped), `*` = any char run (crossing `/`), a
  *     trailing `$` anchors the end, otherwise prefix semantics;
  *     empty patterns (`Disallow:` = allow-all) carry no rule but DO
  *     terminate a `User-agent:` line run before being dropped.
  *   - decision: the MOST SPECIFIC match wins (most octets in the
  *     pattern as written, RFC 9309 §2.2.2); at equal length Allow
  *     beats Disallow (least-restrictive tie break); no matching rule
  *     = allow.
  *
  * Engineering shape: the parse is entirely built-in expressions over
  * `split`/`posexplode`/`regexp_extract` with per-HOST window
  * functions (a robots body is KB-scale, so the partition key is never
  * skewed); rule patterns pre-compile to SQL LIKE form ONCE per rule
  * (escape char `!`, so `%`/`_`/`!` literals in paths stay literal).
  * The page-side decision is a BROADCAST join of the per-host rule
  * arrays followed by a higher-order `filter`/`transform`/`array_max`
  * — the web's robots corpus is millions of small rule rows vs
  * billions of pages, so pages take ZERO exchange: scan → broadcast
  * join → project, and the struct max (prec, allow, pattern) encodes
  * the RFC precedence order as plain lexicographic comparison.
  */
object Robots {

  /** LIKE-compiled form of a REP path pattern: `*` → `%`, trailing
    * unescaped-`$` anchors (no trailing `%`), everything else literal
    * under ESCAPE '!'. */
  private def likePat(p: Column): Column = {
    val dollar = p.endsWith("$")
    val core = when(dollar, p.substr(lit(1), length(p) - 1)).otherwise(p)
    val lit0 = replace(replace(replace(core, lit("!"), lit("!!")),
      lit("%"), lit("!%")), lit("_"), lit("!_"))
    concat(replace(lit0, lit("*"), lit("%")),
      when(dollar, lit("")).otherwise(lit("%")))
  }

  /** Parse robots.txt bodies into the rule rows that apply to `agent`:
    * `(host, rule_allow, pattern, grp, prec, like_pat)`. One row per
    * applicable Allow/Disallow; hosts whose file names the agent keep
    * ONLY those groups (`grp = "agent"`), others keep the `*` groups
    * (`grp = "star"`); hosts with neither emit nothing (downstream
    * default-allow). */
  def parseRules(robots: DataFrame, hostCol: String, bodyCol: String,
      agent: String): DataFrame = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    val w = Window.partitionBy("host").orderBy("pos")
    val dirs = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("pos", "raw")))
      .select(col("host"), col("pos"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("ln"))
      .select(col("host"), col("pos"),
        lower(regexp_extract(col("ln"), "^([A-Za-z-]+)\\s*:", 1)).as("kind"),
        trim(regexp_replace(col("ln"), "^[A-Za-z-]+\\s*:\\s*", "")).as("value"))
      // empty-value Allow/Disallow lines carry no rule but DO terminate a
      // User-agent line run (RFC 9309 §2.2.1) — keep them through the runId
      // computation; they are dropped after group assignment below
      .filter(col("kind").isin("user-agent", "allow", "disallow") &&
        (col("kind") =!= "user-agent" || length(col("value")) > 0))
    val d2 = dirs
      .withColumn("ua", col("kind") === "user-agent")
      // a User-agent line NOT preceded by another User-agent line opens
      // a new group run; rules carry the run id of the last run opened
      // at-or-before them (0 = before any group -> dropped)
      .withColumn("runId", sum(
        when(col("ua") && !coalesce(lag(col("ua"), 1).over(w), lit(false)),
          1).otherwise(0)).over(w))
    val runs = d2.filter(col("ua") && col("runId") > 0)
      .groupBy(col("host"), col("runId"))
      .agg(collect_set(lower(col("value"))).as("agents"))
      .select(col("host"), col("runId"),
        array_contains(col("agents"), agentLc).as("spec"),
        array_contains(col("agents"), "*").as("star"))
    val chosen = runs
      .withColumn("hasSpec",
        max(col("spec")).over(Window.partitionBy("host")))
      .filter(when(col("hasSpec"), col("spec")).otherwise(col("star")))
      .select(col("host"), col("runId"),
        when(col("hasSpec"), lit("agent")).otherwise(lit("star")).as("grp"))
    d2.filter(!col("ua") && col("runId") > 0 && length(col("value")) > 0)
      .join(chosen, Seq("host", "runId"))
      .select(col("host"), (col("kind") === "allow").as("rule_allow"),
        col("value").as("pattern"), col("grp"))
      .withColumn("prec", length(col("pattern")).cast("long"))
      .withColumn("like_pat", likePat(col("pattern")))
  }

  private val schemeRe = "^[A-Za-z][A-Za-z0-9+.-]*://"
  /** host = authority minus userinfo/port, lowercased. */
  private val hostRe = schemeRe + "(?:[^/?#@]*@)?([^/?#:]+)"
  /** REP match target = path plus query, fragment stripped; empty -> "/". */
  private val pathRe = schemeRe + "[^/?#]*([/?][^#]*)"

  /** Append the REP decision columns (`host`, `allowed`,
    * `matched_rule`, `matched_prec`, `grp`) to ANY frame carrying a
    * URL column, keeping every input column — the composable form
    * both [[filterUrls]] and the streaming gate
    * ([[graft.streaming.Streams.robotsGate]], where the rule table is
    * the STATIC side of a stream-static broadcast join) build on.
    * Pages never shuffle: the per-host rule arrays broadcast and the
    * RFC precedence order (longest pattern, then Allow over Disallow)
    * folds into one `array_max` over the LIKE-matching rules. */
  def withDecision(df: DataFrame, rules: DataFrame,
      urlCol: String): DataFrame = {
    val hostRules = rules.groupBy(col("host"))
      .agg(collect_list(struct(col("prec"),
        col("rule_allow").cast("int").as("a"), col("like_pat"),
        col("pattern"), col("grp"))).as("__rs"))
    df.withColumn("host", lower(regexp_extract(col(urlCol), hostRe, 1)))
      .withColumn("__path",
        coalesce(nullif(regexp_extract(col(urlCol), pathRe, 1), lit("")),
          lit("/")))
      .join(broadcast(hostRules), Seq("host"), "left")
      .withColumn("__b", expr(
        "array_max(transform(filter(__rs, r -> __path LIKE r.like_pat ESCAPE '!'), " +
          "r -> struct(r.prec AS prec, r.a AS a, r.pattern AS pattern, r.grp AS grp)))"))
      .withColumn("allowed", coalesce(col("__b.a") === 1, lit(true)))
      .withColumn("matched_rule", col("__b.pattern"))
      .withColumn("matched_prec", col("__b.prec"))
      .withColumn("grp", coalesce(col("__b.grp"), lit("default")))
      .drop("__rs", "__b", "__path")
  }

  /** Decide every URL against [[parseRules]] output: emits
    * `(idCol, url, host, allowed, matched_rule, matched_prec, grp)`
    * with `grp` = "agent" | "star" | "default" (no matching rule / no
    * robots.txt). */
  def filterUrls(urls: DataFrame, rules: DataFrame, idCol: String,
      urlCol: String): DataFrame =
    withDecision(urls.select(col(idCol), col(urlCol).as("url")),
        rules, "url")
      .select(col(idCol), col("url"), col("host"), col("allowed"),
        col("matched_rule"), col("matched_prec"), col("grp"))

  /** Parse + decide in one call (robots bodies + page URLs). */
  def filterCrawl(pages: DataFrame, robots: DataFrame, idCol: String,
      urlCol: String, hostCol: String, bodyCol: String,
      agent: String): DataFrame =
    filterUrls(pages, parseRules(robots, hostCol, bodyCol, agent),
      idCol, urlCol)
}
