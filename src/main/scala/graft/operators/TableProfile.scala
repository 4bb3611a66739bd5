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

  /** Per-column statistics: n_rows, n_nulls, exact NDV, and min/max
    * rendered as strings (so heterogeneous column types share one
    * output schema; callers profile key and code columns —
    * floats/timestamps would tie the comparison to engine string
    * formatting).
    *
    * Scale shape: one INDEPENDENT single-distinct aggregation per
    * column, unioned — each plans as a column-pruned scan feeding the
    * two-stage partial-distinct hash aggregate (map-side distinct,
    * then one narrow shuffle of that column's distinct values), and
    * the per-column jobs run concurrently. The tempting alternative —
    * every countDistinct in ONE agg — plans through Expand, fanning
    * the scan rows × columns into a single wide shuffle; measured 8×
    * slower on the lineitem profile (7.3 s vs 0.9 s at sf0.1,
    * PLANS.md) and strictly worse at scale, where the expanded
    * shuffle carries every profiled column's value for every row. A
    * 100 TB profile either samples or swaps NDV to the HLL++ sketch
    * (approx_count_distinct, the engine's `rel_approx_distinct` path)
    * with the same per-column shape. */
  def tableStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    cols.map { c =>
      df.agg(count(lit(1)).as("n_rows"), count(col(c)).as("__cnt"),
          countDistinct(col(c)).as("ndv"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("col_name"), col("n_rows"),
          (col("n_rows") - col("__cnt")).as("n_nulls"), col("ndv"),
          col("min_val"), col("max_val"))
    }.reduce(_ union _)
  }

  /** Equi-width histogram of a numeric column — the distribution
    * companion to [[tableStats]] (what an optimizer's histogram
    * statistics and a data-quality dashboard both consume). The
    * column is centi-scaled to integers first (round(v*100), the
    * engine's usual milli/centi recipe), so bucket assignment
    * `(v - min) * k div (max - min + 1)` is pure integer arithmetic —
    * no float-boundary bucket can differ between engines. Empty
    * buckets are absent (a dense frame is one small outer join away);
    * output carries each bucket's exact centi bounds.
    *
    * Scale shape: one reduced min/max aggregate broadcast back, one
    * narrow bucket map, one partial-combined count keyed by bucket
    * (≤ k rows). Two scans, zero corpus-sized shuffles. */
  def valueHistogram(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val v = round(col(valueCol) * 100).cast("long")
    val vals = df.select(v.as("__v")).filter(col("__v").isNotNull)
    val bounds = vals.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    vals.crossJoin(broadcast(bounds))
      .select(expr(s"((__v - __lo) * ${k}L) div (__hi - __lo + 1)").as("bucket"),
        col("__lo"), col("__hi"))
      .groupBy(col("bucket"), col("__lo"), col("__hi"))
      .agg(count(lit(1)).as("n_rows"))
      // bucket b holds v with b <= (v - lo) * k / w < b + 1, i.e.
      // (v - lo) in [ceil(b*w/k), ceil((b+1)*w/k) - 1] — the bounds
      // must use the CEILING division or boundary rows fall outside
      // their bucket's reported range whenever k does not divide w
      .select(col("bucket"),
        (col("__lo") +
          expr(s"(bucket * (__hi - __lo + 1) + ${k - 1}L) div ${k}L"))
          .as("lo_centi"),
        (col("__lo") +
          expr(s"((bucket + 1) * (__hi - __lo + 1) + ${k - 1}L) div ${k}L")
          - 1).as("hi_centi"),
        col("n_rows"))
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
