package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge-list DataFrames — the iterate-join-agg
  * family (PageRank, label propagation) expressed as k rounds of
  * shuffle-on-node-key, the classic Pregel-on-dataframes shape.
  *
  * All state is FIXED-POINT integer (2^20 scale, floor divisions, long
  * sums): every round is exact integer arithmetic, so results are
  * independent of partition merge order and an oracle engine replays
  * them bit-for-bit — the same determinism recipe as the corpus ops'
  * integer-milli sums. At 100 TB the per-round cost is one equi-join
  * of the edge list against the rank frontier plus one partial-combined
  * aggregation — nothing driver-side grows with the graph. */
object Graph {

  /** The iterative ops persist their edge frame (k rounds each re-read
    * it); releasing that cache before returning needs the NODE-sized
    * result materialized first — localCheckpoint(eager) truncates the
    * result's lineage off the cache, then the edge blocks drop. Without
    * this, every call leaked its edge cache for the session's life. */
  private def releaseAfter(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = result.localCheckpoint(true)
    cached.foreach(_.unpersist(false))
    out
  }

  /** Fixed-point PageRank over an UNDIRECTED edge list (edges are
    * symmetrized and deduplicated; self-loops expected absent).
    * Per round: pr'(v) = S/2 + (Σ_{u~v} floor(pr(u) / deg(u))) / 2 —
    * damping 1/2, start mass S = 2^20 per node. Division floors keep
    * every intermediate a Long; mass leaks slightly (floor) which is
    * fine for RANKING — the op's contract is deterministic relative
    * importance, not a stochastic-matrix eigenvector.
    *
    * The edge-degree frame is persisted: each of the k rounds re-reads
    * it, and without pinning it the k-th round's lineage would replay
    * the edge derivation k times (the plan-replication trap PLANS.md
    * documents for iterative pipelines). */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, scale: Long = 1L << 20): DataFrame = {
    require(iterations >= 1 && scale > 0)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val edgeDeg = sym.join(deg, "src")
      .select(col("src"), col("dst"), col("deg"))
      .persist()
    val base = scale / 2
    var pr = deg.select(col("src").as("node"), lit(scale).as("pr"))
    (1 to iterations).foreach { _ =>
      pr = edgeDeg.join(pr, col("src") === col("node"))
        .select(col("dst").as("node"), expr("pr div deg").as("c"))
        .groupBy(col("node"))
        .agg((lit(base) + expr("sum(c) div 2")).as("pr"))
    }
    releaseAfter(pr, edgeDeg)
  }

  /** Connected components by min-label propagation: label(v) starts at
    * v and each round takes the minimum over {self} ∪ neighbors —
    * monotone (labels only decrease), so unlike LPA it cannot
    * oscillate, and after k rounds every node holds the component
    * minimum within k hops; k >= the graph diameter makes it the exact
    * component id. The k-round form keeps the plan static and the
    * oracle unrollable — the complement to Dedup's driver/union-find
    * component path, for graphs whose edge list is already reduced. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 8): DataFrame = {
    require(iterations >= 1)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    // the {self} term rides as self-loop edges so each round references
    // the label frontier exactly ONCE — a round that unions the
    // frontier with the join result references it twice and DOUBLES
    // the lineage per round (exponential plan growth by round 8, the
    // PLANS.md iterative-reference trap; measured 70 s -> sub-second
    // at sf0.1 for this very operator)
    val symSelf = sym.union(
        sym.select(col("src")).distinct()
          .select(col("src"), col("src").as("dst")))
      .persist()
    var lab = symSelf.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    (1 to iterations).foreach { _ =>
      lab = symSelf.join(lab, col("src") === col("node"))
        .groupBy(col("dst")).agg(min(col("label")).as("label"))
        .select(col("dst").as("node"), col("label"))
    }
    releaseAfter(lab, symSelf)
  }

  /** Exact per-node triangle counts: orient every edge low-id -> high-id,
    * join wedges (a<b)x(b<c) on the middle node, close each wedge
    * against the (a, c) edge — every triangle materializes exactly once
    * as its ordered triple (a < b < c), no dedup pass. All equi-joins;
    * the wedge frame is the classic skew point (a hub of degree d
    * yields d²/2 wedges), which the ORDERING halves and real
    * deployments cap with degree-based orientation — here the join is
    * on canonical pairs, the standard compact form. Each triangle then
    * credits its three corners. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(col(srcCol).cast("long").as("x"),
      col(dstCol).cast("long").as("y")).filter(col("x") =!= col("y"))
    val e = raw.select(least(col("x"), col("y")).as("lo"),
      greatest(col("x"), col("y")).as("hi")).distinct()
    val ab = e.select(col("lo").as("a"), col("hi").as("b"))
    val bc = e.select(col("lo").as("b"), col("hi").as("c"))
    val tri = ab.join(bc, "b")
      .join(e.select(col("lo").as("a"), col("hi").as("c")), Seq("a", "c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
  }

  /** Deterministic synchronous label propagation (community detection):
    * start with label(v) = v, then k rounds of "adopt the most frequent
    * label among neighbors, ties to the SMALLEST label" — the tie rule
    * is what makes the classic randomized LPA deterministic and
    * therefore oracle-replayable. Per round: one edge-vs-frontier
    * equi-join, one (node, label) count aggregation, then the
    * max-count argmin-label reduction as a single max_by over a
    * (count, -label) ordering struct — two shuffles per round, not
    * three (no count-vs-max re-join) — all partial-combined, nothing
    * driver-side. Fixed k (no convergence test) keeps the plan static;
    * synchronous updates can oscillate on bipartite structures, which
    * a caller handles by choice of k, exactly as published LPA does. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    var lab = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    (1 to iterations).foreach { _ =>
      val counts = sym.join(lab, col("src") === col("node"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      // (cnt, -label) struct ordering = highest count, ties to the
      // smallest label, in ONE aggregation; no ordering ties exist
      // since labels are distinct within a dst group
      lab = counts.groupBy(col("dst"))
        .agg(max_by(col("label"),
          struct(col("cnt"), (-col("label")).as("__nl"))).as("label"))
        .select(col("dst").as("node"), col("label"))
    }
    releaseAfter(lab, sym)
  }
}
