package graft.operators

import org.apache.spark.sql.SparkSession

/** The uniform pre-flight volume-guard contract shared by every
  * operator whose join CAN turn quadratic on hostile data
  * distributions: banded-LSH near-dup ([[Similarity]]), the PassJoin
  * edit join ([[EditJoin]]), and the wedge frames of
  * [[Graph.triangleCounts]] / [[Graph.linkPrediction]].
  *
  * Each guard computes its EXACT would-be volume in one reduced
  * aggregation before the expensive join, builds a [[GuardReport]],
  * and passes it through [[Guard.verify]] — which either returns it
  * (below budget; the plan is untouched, results identical) or throws
  * [[GuardTrippedException]] carrying the same report, so a driver can
  * alarm on the STRUCTURED fields (volume, budget, remediation)
  * uniformly across all guards instead of parsing exception text.
  *
  * Budgets are surfaced as session config
  * (`spark.graft.guard.<knob>`, read by the registered queries via
  * [[Guard.budget]]) rather than buried in operator defaults — a
  * deployment tightens or lifts them without code changes. */
final case class GuardReport(
    guard: String,        // e.g. "lsh_candidates", "triangle_wedges"
    rows: Long,           // input rows the volume is amortized over
    volume: BigDecimal,   // exact pre-computed candidate/wedge volume
    budget: BigDecimal,   // the configured cap
    perRow: Boolean,      // budget is a per-row average (vs absolute)
    remediation: String) {
  def avgPerRow: BigDecimal =
    if (rows == 0L) BigDecimal(0) else volume / rows
  def measured: BigDecimal = if (perRow) avgPerRow else volume
  def tripped: Boolean = measured > budget
  def message: String = {
    val unit = if (perRow) s"avg $avgPerRow per row" else s"$volume total"
    s"$guard volume over budget: $volume for $rows rows " +
      s"($unit > $budget). $remediation"
  }
}

/** Thrown by [[Guard.verify]] when a report is over budget; carries
  * the structured [[GuardReport]]. Subclasses IllegalArgumentException
  * so callers treating guard vetoes as precondition failures keep
  * working. */
final class GuardTrippedException(val report: GuardReport)
  extends IllegalArgumentException(report.message)

object Guard {
  /** Throw iff over budget; otherwise hand the report back so callers
    * can log/return the below-budget measurement. */
  def verify(report: GuardReport): GuardReport = {
    if (report.tripped) throw new GuardTrippedException(report)
    report
  }

  /** A guard budget from session config, falling back to the
    * operator's default — how the registered queries surface the
    * knobs (`spark.graft.guard.maxWedges`,
    * `spark.graft.guard.editMaxAvgCandidatesPerRow`,
    * `spark.graft.guard.lshMaxAvgCandidatesPerRow`). */
  def budget(spark: SparkSession, key: String, default: Double): Double =
    spark.conf.getOption(s"spark.graft.guard.$key").map(_.toDouble)
      .getOrElse(default)
}
