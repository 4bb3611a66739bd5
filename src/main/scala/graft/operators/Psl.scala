package graft.operators

/** Parsed Public Suffix List rules — the FULL-SEMANTICS deployment
  * hook behind [[CorpusMix.registrableDomain]]'s built-in subset.
  * Implements the publicsuffix.org algorithm
  * (https://publicsuffix.org/list/ — list format and matching rules
  * are public): a domain's public suffix is decided by the PREVAILING
  * rule — any matching exception rule (`!host.example`) wins and its
  * public suffix is the rule minus its leftmost label; otherwise the
  * longest matching rule (label-wise suffix match, `*` matching
  * exactly one label); otherwise the default rule `*` (the bare TLD).
  * The registrable domain (eTLD+1) is the public suffix plus one
  * label.
  *
  * Rules are grouped by label count so the generated Catalyst
  * expression is a fixed when-chain of InSet membership probes over
  * the tail labels — one hash-set probe per (kind, depth), no UDF, no
  * join, fused into the scan exactly like the built-in subset path.
  *
  * Boundary (like the subset's): names are matched as-is after
  * lowercasing — no IDN/punycode folding (needs tables this sandbox
  * does not carry; fold upstream where it matters). */
final case class PslRules(
    exact: Map[Int, Seq[String]],     // label count -> rule names
    wildcard: Map[Int, Seq[String]],  // SUFFIX label count (rule minus '*')
    exception: Map[Int, Seq[String]]) {
  /** Longest possible public-suffix label count under these rules. */
  def maxLen: Int =
    ((exact.keys ++ wildcard.keys.map(_ + 1) ++
      exception.keys.map(_ - 1)) ++ Seq(1)).max
}

object PslRules {
  /** Parse PSL-format lines: `//` comments and blanks skipped,
    * `!rule` = exception, `*.rule` = wildcard, else exact. Everything
    * after the first whitespace on a line is ignored (the PSL file
    * convention). */
  def parse(lines: Seq[String]): PslRules = {
    val rules = lines.iterator
      .map(_.trim.takeWhile(!_.isWhitespace))
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .toSeq.distinct
    def labels(r: String): Int = r.count(_ == '.') + 1
    val (exc, rest) = rules.partition(_.startsWith("!"))
    val (wild, exact) = rest.partition(_.startsWith("*."))
    PslRules(
      exact = exact.groupBy(labels).map { case (k, v) => k -> v },
      wildcard = wild.map(_.drop(2)).groupBy(labels)
        .map { case (k, v) => k -> v },
      exception = exc.map(_.drop(1)).groupBy(labels)
        .map { case (k, v) => k -> v })
  }
}
