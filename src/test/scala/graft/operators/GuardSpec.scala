package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GuardSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def report(volume: Long, budget: Double, perRow: Boolean,
      rows: Long = 10L) =
    GuardReport("test guard", rows, BigDecimal(volume), BigDecimal(budget),
      perRow, "do the thing differently")

  test("verify returns the report below budget, throws it above") {
    val ok = report(volume = 100, budget = 1000, perRow = false)
    assert(Guard.verify(ok) eq ok)
    assert(!ok.tripped)
    val bad = report(volume = 2000, budget = 1000, perRow = false)
    val e = intercept[GuardTrippedException] { Guard.verify(bad) }
    assert(e.report eq bad)
    assert(e.getMessage == bad.message)
    assert(e.getMessage.contains("test guard volume over budget"))
    assert(e.getMessage.contains("do the thing differently"))
    // per-row semantics: 2000 over 10 rows = 200/row
    val pr = report(volume = 2000, budget = 300, perRow = true)
    assert(!pr.tripped && pr.avgPerRow == BigDecimal(200))
    assert(report(volume = 2000, budget = 100, perRow = true).tripped)
    // empty input never trips a per-row budget
    assert(!report(volume = 0, budget = 1, perRow = true, rows = 0).tripped)
  }

  test("budget reads session config and falls back to the default") {
    assert(Guard.budget(spark, "maxWedges", 2e9) == 2e9)
    spark.conf.set("spark.graft.guard.maxWedges", "123.5")
    try assert(Guard.budget(spark, "maxWedges", 2e9) == 123.5)
    finally spark.conf.unset("spark.graft.guard.maxWedges")
  }

  test("registered graph query honors the session-config budget") {
    import spark.implicits._
    // a tiny triangle graph: 1 wedge under degree ordering — budget 0.5
    // from SESSION CONFIG (not an operator argument) must veto it
    // through the registered-query plumb-through (Guard.budget)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    spark.conf.set("spark.graft.guard.maxWedges", "0.5")
    try {
      val e = intercept[GuardTrippedException] {
        Graph.triangleCounts(tri, "a", "b",
          maxWedges = Guard.budget(spark, "maxWedges", 2e9)).count()
      }
      assert(e.report.guard == "triangle wedge" &&
        e.report.volume == BigDecimal(1), e.report.toString)
    } finally spark.conf.unset("spark.graft.guard.maxWedges")
    // and with the config unset the default budget lets it run
    val got = Graph.triangleCounts(tri, "a", "b",
        maxWedges = Guard.budget(spark, "maxWedges", 2e9))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L)), got.toString)
  }

  test("GuardReport message formats per-row and absolute budgets") {
    val pr = report(volume = 2000, budget = 100, perRow = true)
    assert(pr.message.contains("avg 200 per row"), pr.message)
    val abs = report(volume = 2000, budget = 100, perRow = false)
    assert(abs.message.contains("2000 total"), abs.message)
  }
}
