package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for crawl curation — the stage between WARC
  * body bytes and the quality gates (a real pipeline never feeds raw
  * markup to a Gopher gate: tag soup inflates word counts and buries
  * stopword ratios).
  *
  * The contract is a DELIBERATELY SIMPLIFIED, exactly-specified
  * extraction — a fixed chain of regular-expression passes — rather
  * than a browser-grade DOM parse: every pass is a codegen'd Spark
  * built-in (`regexp_replace`), and the SAME chain renders to DuckDB
  * RE2 ([[htmlToTextSql]], kept textually in lockstep) so the oracle
  * is exact. The passes, in order:
  *
  *  1. drop `<script>`/`<style>` ELEMENTS with their content
  *     (case-insensitive, non-greedy, dot-matches-newline; an
  *     unterminated element never matches and falls through to pass
  *     3, which strips only its open tag — deterministic both sides)
  *  2. drop HTML comments `<!-- ... -->` (non-greedy, dotall)
  *  3. replace every remaining tag `<[^>]*>` with a space (a space,
  *     not the empty string: `a<br>b` must not glue into `ab`)
  *  4. decode the common entities — `&nbsp;` → space, `&quot;`,
  *     `&#39;`, `&apos;`, `&lt;`, `&gt;`, and `&amp;` LAST (the
  *     standard order, so `&amp;lt;` decodes to the literal `&lt;`,
  *     not `<`)
  *  5. collapse whitespace runs to single spaces and trim
  *
  * Known boundaries of the contract (documented, shared by the
  * oracle): CDATA sections are treated as tag + text; nested or
  * mismatched script/style closers match the FIRST closer; numeric
  * entities beyond `&#39;` pass through as text. Java regex `\s`
  * includes U+000B where RE2's does not — inputs are crawl text, and
  * the fixtures pin the equivalence on the classes both engines share.
  *
  * Scale shape: a per-row map over the body column — no shuffle, no
  * driver state, fully pipelined into whatever scan feeds it. */
object HtmlText {

  // ONE copy of every pattern and the entity table: both renderings
  // below interpolate these, so the Spark chain and the DuckDB oracle
  // cannot drift apart (the patterns are valid and identical in Java
  // regex and RE2 — the contract's portability boundary)
  private val blockPat = "(?is)<(script|style)[^>]*>.*?</(script|style)[^>]*>"
  private val commentPat = "(?s)<!--.*?-->"
  private val tagPat = "(?s)<[^>]*>"
  private val entities = Seq("&nbsp;" -> " ", "&quot;" -> "\"",
    "&#39;" -> "'", "&apos;" -> "'", "&lt;" -> "<", "&gt;" -> ">",
    "&amp;" -> "&")

  /** The extraction chain over a string column. */
  def htmlToText(c: Column): Column = {
    val noBlocks = regexp_replace(c, blockPat, " ")
    val noComments = regexp_replace(noBlocks, commentPat, " ")
    val noTags = regexp_replace(noComments, tagPat, " ")
    val ent = entities.foldLeft(noTags) { case (col0, (e, r)) =>
      replace(col0, lit(e), lit(r)) // literal, like the oracle's
    }
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** The same chain rendered for DuckDB (RE2), interpolating the SAME
    * pattern and entity values as [[htmlToText]]. */
  def htmlToTextSql(expr: String): String = {
    val noBlocks = s"regexp_replace($expr, '$blockPat', ' ', 'g')"
    val noComments = s"regexp_replace($noBlocks, '$commentPat', ' ', 'g')"
    val noTags = s"regexp_replace($noComments, '$tagPat', ' ', 'g')"
    val ent = entities.foldLeft(noTags) { case (sql, (e, r)) =>
      val rr = r.replace("'", "''")
      s"replace($sql, '$e', '$rr')"
    }
    s"trim(regexp_replace($ent, '\\s+', ' ', 'g'))"
  }
}
