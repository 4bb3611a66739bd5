package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, GreaterThanOrEqual, LessThanOrEqual, Literal, Or, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType}

import graft.core.{Bbox, Morton, MortonRange}

/** SQL-level SFC pruning as a Catalyst optimizer rewrite.
  *
  * [[HeadInBbox]] is an ordinary (evaluable, codegen'd) predicate:
  * "does this block head's quadtree cell intersect the quantized
  * bbox". A plain SQL user writes
  * `WHERE graft_head_in_bbox(sfc_head, x0, x1, y0, y1, total, tail)`
  * and gets correct results on any session. With [[GraftExtensions]]
  * installed, [[RewriteHeadBboxFilter]] additionally rewrites the
  * marker during optimization into
  * `(OR-of-BETWEEN over head) AND marker[pruned]` — the same
  * coarse-cover + exact-membership split the DataFrame path uses
  * (PointCloud.headPredicate + the r7 giant-OR lesson): the BETWEEN
  * ranges are scan-pushable (parquet row-group stats prune on them)
  * while the exact cell test stays a cheap residual. The cover is
  * budgeted (<= 256 ranges, coarse-flushed beyond — a superset), so
  * the conjunction, not the cover alone, preserves semantics; the
  * `pruned` flag marks rewritten markers so the rule terminates.
  */
case class HeadInBbox(child: Expression, xMin: Long, xMax: Long,
    yMin: Long, yMax: Long, totalBits: Int, tailBits: Int,
    pruned: Boolean = false) extends UnaryExpression {
  require(totalBits >= tailBits && tailBits >= 0 && totalBits <= 62,
    s"bad key split $totalBits/$tailBits")
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "head_in_bbox"
  override protected def nullSafeEval(h: Any): Any = {
    val head = h.asInstanceOf[Long]
    val minKey = head << tailBits
    val maxKey = minKey | ((1L << tailBits) - 1L)
    val cx0 = Morton.decodeX(minKey)
    val cx1 = Morton.decodeX(maxKey)
    val cy0 = Morton.decodeY(minKey)
    val cy1 = Morton.decodeY(maxKey)
    !(cx1 < xMin || cx0 > xMax || cy1 < yMin || cy0 > yMax)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, h =>
      s"""!(graft.core.Morton.decodeX(($h << $tailBits) | ((1L << $tailBits) - 1L)) < ${xMin}L ||
         graft.core.Morton.decodeX($h << $tailBits) > ${xMax}L ||
         graft.core.Morton.decodeY(($h << $tailBits) | ((1L << $tailBits) - 1L)) < ${yMin}L ||
         graft.core.Morton.decodeY($h << $tailBits) > ${yMax}L)""".linesIterator
        .map(_.trim).mkString(" "))
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Rewrites un-pruned [[HeadInBbox]] markers into the scan-pushable
  * `(balanced OR-of-BETWEEN) AND marker[pruned]` form. Registered via
  * `SparkSessionExtensions.injectOptimizerRule` (GraftExtensions) or
  * `spark.experimental.extraOptimizations`. */
object RewriteHeadBboxFilter extends Rule[LogicalPlan] {

  private def rangePredicate(head: Expression, ranges: Seq[(Long, Long)]): Expression = {
    def mk(lo: Long, hi: Long): Expression =
      if (lo == hi) EqualTo(head, Literal(lo))
      else And(GreaterThanOrEqual(head, Literal(lo)), LessThanOrEqual(head, Literal(hi)))
    // balanced OR tree: depth log2(n), keeps codegen happy at any budget
    def build(rs: IndexedSeq[(Long, Long)]): Expression =
      if (rs.length == 1) mk(rs.head._1, rs.head._2)
      else {
        val (l, r) = rs.splitAt(rs.length / 2)
        Or(build(l), build(r))
      }
    build(ranges.toIndexedSeq)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case e @ HeadInBbox(head, x0, x1, y0, y1, totalBits, tailBits, false) =>
      val hr = MortonRange.decompose(
        Bbox(x0.toDouble, x1.toDouble, y0.toDouble, y1.toDouble),
        totalBits, tailBits, maxCells = 256)
      val ranges = (hr.contained ++ hr.partial).sortBy(_._1)
      if (ranges.isEmpty) Literal(false, BooleanType)
      else And(rangePredicate(head, ranges), e.copy(pruned = true))
  }
}
