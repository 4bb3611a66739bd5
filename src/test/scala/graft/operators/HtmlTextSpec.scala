package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlTextSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(HtmlText.htmlToText(col("h")).as("t"))
      .head().getString(0)
  }

  test("tags strip, block text survives, no word-gluing") {
    assert(extract("<html><body><h1>Title</h1><p>one two</p></body></html>")
      == "Title one two")
    assert(extract("a<br>b") == "a b")
  }

  test("script and style elements drop with their content") {
    assert(extract("<script>var x = 1;</script>keep") == "keep")
    assert(extract("<style>body { color: red; }</style>keep") == "keep")
    assert(extract("""<script type="text/javascript">document.write("<p>not text</p>");</script>keep""")
      == "keep")
    // case-insensitive, multiline content
    assert(extract("<SCRIPT>\nmulti\nline\n</SCRIPT>keep") == "keep")
  }

  test("comments drop, including markup inside them") {
    assert(extract("a <!-- hidden <b>bold</b> --> b") == "a b")
    assert(extract("a <!--\nmultiline\n--> b") == "a b")
  }

  test("entities decode in the standard order (&amp; last)") {
    assert(extract("&quot;q&quot; &lt;tag&gt; x&#39;s y&apos;z a&nbsp;b")
      == "\"q\" <tag> x's y'z a b")
    // &amp;lt; is the LITERAL text "&lt;", never "<"
    assert(extract("a &amp;lt; b") == "a &lt; b")
    assert(extract("a &amp; b") == "a & b")
  }

  test("contract edges: unterminated script, > inside attribute quotes") {
    // unterminated script never matches the element pass; pass 3
    // strips only its open tag and the content remains text
    assert(extract("<script src=x.js>var broken = 1; tail")
      == "var broken = 1; tail")
    // the tag pass stops at the FIRST > even inside a quoted attr —
    // the documented simplification, deterministic on both engines
    assert(extract("""<a href="q?a>b">link</a>""") == "b\">link")
  }

  test("whitespace collapses and trims; null stays null") {
    assert(extract("  <p> a\n\n b\t c </p>  ") == "a b c")
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("h")
      .select(HtmlText.htmlToText(col("h")).as("t")).head()
    assert(r.isNullAt(0))
  }

  test("spark chain == the DuckDB-rendered chain run through Spark SQL semantics") {
    // the SQL rendering uses RE2-compatible constructs that mean the
    // same in Java regex; pin the textual patterns agree on a gnarly
    // compound document
    val gnarly = "<HTML><head><script a=b>s</script><style>.x{}</style>" +
      "</head><!-- c --><body><p>One&nbsp;two</p><div>three &amp; four" +
      "</div><script>unterminated</body></html>"
    assert(extract(gnarly) == "One two three & four unterminated")
  }
}
