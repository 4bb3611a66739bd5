package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style catalog statistics — the per-column profile every
  * warehouse collects (row count, null count, distinct count, min/max)
  * so its optimizer can size joins and its operators can plan
  * partitioning. Shipped as a queryable operator: one output row per
  * profiled column.
  */
object TableProfile {

  /** Per-column statistics in ONE aggregate pass: n_rows, n_nulls,
    * exact NDV, and min/max rendered as strings (so heterogeneous
    * column types share one output schema; callers profile key and
    * code columns — floats/timestamps would tie the comparison to
    * engine string formatting).
    *
    * Scale shape: the multi-column count(DISTINCT) plans through
    * Spark's Expand — the scan fans each row out once per profiled
    * column, then ONE partial-combined shuffle keyed by (column,
    * value) feeds the distinct counts; min/max/counts ride the same
    * pass. Cost is rows × profiled-columns expanded rows — the
    * standard exact-ANALYZE price; a 100 TB profile either samples or
    * swaps NDV to the HLL++ sketch (approx_count_distinct, the
    * engine's `rel_approx_distinct` path) and keeps everything else
    * identical. The final unpivot (stack) runs on the single reduced
    * row. */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__cnt_$c"),
        countDistinct(col(c)).as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val reduced = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackArgs = cols.map(c =>
      s"'$c', __rows - __cnt_$c, __ndv_$c, __min_$c, __max_$c")
      .mkString(", ")
    reduced.select(col("__rows").as("n_rows"), expr(
      s"stack(${cols.size}, $stackArgs) " +
        "as (col_name, n_nulls, ndv, min_val, max_val)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("ndv"), col("min_val"), col("max_val"))
  }

  /** Referential-integrity validation — the data-quality gate a
    * pipeline runs before trusting its joins: for each declared
    * foreign-key edge (child table, child column) → (parent table,
    * parent column), the child row count and the number of ORPHAN
    * rows (child values with no parent). One output row per edge.
    *
    * Scale shape: each edge is one left-anti equi-join child-vs-parent
    * KEYS — the parent side reduces to its distinct key column before
    * joining (broadcastable for dimensions), and only (key) columns
    * shuffle, never payloads. Null child keys are counted separately
    * (`n_null_keys`) and are NOT orphans, matching SQL FK semantics
    * (NULL references nothing and violates nothing). */
  def integrityCheck(
      edges: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(edges.nonEmpty, "edges must be non-empty")
    val perEdge = edges.map {
      case (name, child, childKey, parent, parentKey) =>
        val keys = child.select(col(childKey).as("__k"))
        val parents = parent.select(col(parentKey).as("__k")).distinct()
        val orphans = keys.filter(col("__k").isNotNull)
          .join(parents, Seq("__k"), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
        val totals = keys.agg(count(lit(1)).as("n_child"),
          sum(col("__k").isNull.cast("long")).as("n_null_keys"))
        totals.crossJoin(orphans)
          .select(lit(name).as("fk_edge"), col("n_child"),
            coalesce(col("n_null_keys"), lit(0L)).as("n_null_keys"),
            col("n_orphans"))
    }
    perEdge.reduce(_ union _)
  }
}
