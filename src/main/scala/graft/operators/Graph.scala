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
    * this, every call leaked its edge cache for the session's life.
    *
    * Fault-tolerance caveat (deliberate trade): localCheckpoint stores
    * the result in NON-replicated executor storage with lineage
    * truncated, and eagerly executes at call time. On a multi-executor
    * cluster, losing an executor after the call makes the returned
    * frame unrecoverable (it can no longer be recomputed from lineage);
    * the caller must either consume it promptly or write it out. A
    * deployment that needs executor-loss recovery sets a reliable
    * `spark.sparkContext.setCheckpointDir`, and [[materializeCut]]
    * then upgrades every truncation in this file to `checkpoint()` —
    * same cache-release structure, replicated durability, one extra
    * write. Local mode and the engine's own callers (Verify/Bench,
    * the query registry) run without a dir and keep the cheap path. */
  private def releaseAfter(result: DataFrame, cached: DataFrame*): DataFrame = {
    val out = materializeCut(result)
    cached.foreach(_.unpersist(false))
    out
  }

  /** Eagerly materialize a frame with lineage truncated: reliable
    * `checkpoint` when the session has a checkpoint dir (survives
    * executor loss), `localCheckpoint` otherwise (non-replicated
    * executor storage — fast, fine for local/bench use). */
  private def materializeCut(df: DataFrame): DataFrame =
    Frames.materializeCut(df)

  /** Exact decimal(38,0) sum of the `label` column — the convergence
    * probe for monotone min-label propagation. Decimal, not Long: node
    * ids reach 2^63 and a wrapped Long sum could alias "changed" to
    * "unchanged" (a once-in-2^64 silent-wrong-answer; decimal makes the
    * monotone-sum equality test exact for any graph below 10^19 nodes). */
  private def labelSum(labels: DataFrame): java.math.BigDecimal = {
    val v = labels.agg(sum(col("label").cast("decimal(38,0)")).as("s"))
      .head.getDecimal(0)
    if (v == null) java.math.BigDecimal.ZERO else v
  }

  /** Eagerly materialize one iteration round into executor storage with
    * its lineage TRUNCATED (localCheckpoint → a leaf LogicalRDD plan).
    * Persist-only rounds are not enough for a convergence loop: each
    * round's plan would nest the previous round's full analyzed plan,
    * and Catalyst analysis/optimization cost grows super-linearly with
    * that depth even when execution hits the cache — measured minutes
    * by round ~12 on a toy graph vs milliseconds with leaf truncation.
    * Durability follows [[materializeCut]]: reliable when a checkpoint
    * dir is set, executor-local otherwise. */
  private def checkpointRound(df: DataFrame): DataFrame = materializeCut(df)

  /** Drop the executor-storage blocks behind a lineage-truncated round
    * frame (the [[checkpointRound]] output) once the NEXT round is
    * materialized — keeps a convergence loop's footprint at one
    * node-sized frame + the edge list regardless of round count,
    * instead of waiting on driver GC + ContextCleaner. (Reliable
    * checkpoints have no storage blocks to drop; their files are
    * cleaned by the session's normal checkpoint lifecycle.) */
  private def freeRound(df: DataFrame): Unit = Frames.free(df)

  /** Collected edge list → symmetrized, deduplicated adjacency in CSR
    * form over DENSE node indices, all primitive arrays (ADVICE r20:
    * the boxed HashSet[(Long, Long)] + groupBy form held ~2M tuples —
    * several hundred MB of driver heap at the default 2^20-edge gate;
    * this form is two long[] sorts + int arrays, ~10x less). Returns
    * (sorted node ids, CSR offsets of length n+1, neighbor indices).
    * Symmetrization and dedup follow the distributed loops exactly:
    * both directions inserted, duplicates (incl. reversed duplicates
    * and self-loops) collapse in the packed-pair dedup. */
  private def driverCsr(rows: Array[org.apache.spark.sql.Row]):
      (Array[Long], Array[Int], Array[Int]) = {
    val m = rows.length
    val ids = new Array[Long](2 * m)
    var i = 0
    while (i < m) {
      ids(2 * i) = rows(i).getLong(0); ids(2 * i + 1) = rows(i).getLong(1)
      i += 1
    }
    java.util.Arrays.sort(ids)
    var n = 0
    i = 0
    while (i < ids.length) {
      if (n == 0 || ids(n - 1) != ids(i)) { ids(n) = ids(i); n += 1 }
      i += 1
    }
    val nodes = java.util.Arrays.copyOf(ids, n)
    // packed (srcIdx << 32 | dstIdx) pairs, both directions — indices
    // are < 2^31 so the pack is lossless and its numeric order is the
    // (src, dst) lexicographic order the CSR build needs
    val packed = new Array[Long](2 * m)
    i = 0
    var p = 0
    while (i < m) {
      val a = java.util.Arrays.binarySearch(nodes, 0, n, rows(i).getLong(0))
      val b = java.util.Arrays.binarySearch(nodes, 0, n, rows(i).getLong(1))
      packed(p) = (a.toLong << 32) | (b.toLong & 0xffffffffL); p += 1
      packed(p) = (b.toLong << 32) | (a.toLong & 0xffffffffL); p += 1
      i += 1
    }
    java.util.Arrays.sort(packed, 0, p)
    var e = 0
    i = 0
    while (i < p) {
      if (e == 0 || packed(e - 1) != packed(i)) { packed(e) = packed(i); e += 1 }
      i += 1
    }
    val off = new Array[Int](n + 1)
    i = 0
    while (i < e) { off((packed(i) >>> 32).toInt + 1) += 1; i += 1 }
    i = 1
    while (i <= n) { off(i) += off(i - 1); i += 1 }
    val nbr = new Array[Int](e)
    val cur = java.util.Arrays.copyOf(off, n + 1)
    i = 0
    while (i < e) {
      val s = (packed(i) >>> 32).toInt
      nbr(cur(s)) = packed(i).toInt; cur(s) += 1
      i += 1
    }
    (nodes, off, nbr)
  }

  /** Fixed-point PageRank over an UNDIRECTED edge list (edges are
    * symmetrized and deduplicated; self-loops expected absent).
    * Per round: pr'(v) = S/2 + (Σ_{u~v} floor(pr(u) / deg(u))) / 2 —
    * damping 1/2, start mass S = 2^20 per node. Division floors keep
    * every intermediate a Long; mass leaks slightly (floor) which is
    * fine for RANKING — the op's contract is deterministic relative
    * importance, not a stochastic-matrix eigenvector.
    *
    * Convergence contract: FIXED-k by design — the output is the exact
    * k-round state, not an approximation of the converged eigenvector,
    * and `iterations` is semantic (changing it changes the answer).
    * Unlike connectedComponents there is no meaningful fixed point to
    * early-exit on: integer ranks keep drifting under the floor
    * divisions for far more rounds than any caller runs, so a per-round
    * changed-probe would be k wasted actions. Callers that need "has it
    * settled?" compare two k values; the spec pins the exact per-round
    * values on a path graph so the k-round semantics cannot drift.
    *
    * The edge-degree frame is persisted: each of the k rounds re-reads
    * it, and without pinning it the k-th round's lineage would replay
    * the edge derivation k times (the plan-replication trap PLANS.md
    * documents for iterative pipelines). */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, scale: Long = 1L << 20,
      driverEdgeLimit: Int = 1 << 20): DataFrame = {
    require(iterations >= 1 && scale > 0)
    // scale-adaptive fast path (r20, the connectedComponents gate):
    // up to `driverEdgeLimit` distinct edges the k fixed-point rounds
    // run in the driver over the collected symmetrized adjacency —
    // one count + one collect instead of k join+agg jobs that are
    // pure scheduler overhead on small graphs. Bit-identical: the
    // same Long floor divisions over the same dedup'd edge set, and
    // integer sums are merge-order-free.
    val spark = edges.sparkSession
    // null-keyed edges (uncastable ids) are dropped up front: the
    // driver fast paths would NPE on getLong where the distributed
    // loops silently never join them — filtering HERE keeps the two
    // sides of the gate behavior-identical (ADVICE r20)
    val eCut = Frames.cutLocal(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull).distinct())
    if (driverEdgeLimit > 0 && eCut.count() <= driverEdgeLimit) {
      import spark.implicits._
      // primitive CSR adjacency (ADVICE r20) — same symmetrize+dedup,
      // ~10x less driver heap than the boxed pair-set form
      val (nodes, off, nbr) = driverCsr(eCut.collect())
      freeRound(eCut)
      val n = nodes.length
      val base = scale / 2
      var pr = Array.fill(n)(scale)
      (1 to iterations).foreach { _ =>
        // every node of a symmetrized edge list has >= 1 in-neighbor,
        // so the per-round frame covers exactly the node set, like the
        // distributed dst-grouped aggregation
        val acc = new Array[Long](n)
        var s = 0
        while (s < n) {
          val d = off(s + 1) - off(s)
          if (d > 0) {
            val c = pr(s) / d
            var j = off(s)
            while (j < off(s + 1)) { acc(nbr(j)) += c; j += 1 }
          }
          s += 1
        }
        var v = 0
        while (v < n) { acc(v) = base + acc(v) / 2; v += 1 }
        pr = acc
      }
      return spark.createDataset(
        nodes.indices.map(i => (nodes(i), pr(i)))).toDF("node", "pr")
    }
    val e = eCut
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
    val out = releaseAfter(pr, edgeDeg)
    freeRound(eCut)
    out
  }

  /** Connected components by min-label propagation WITH convergence
    * early-exit: label(v) starts at v and each round takes the minimum
    * over {self} ∪ neighbors — monotone (labels only decrease), so
    * unlike LPA it cannot oscillate, and the fixed point is the exact
    * per-component minimum. After each round one cheap node-sized probe
    * (an exact decimal sum of the labels — monotonicity makes "sum
    * unchanged" ⟺ "no label changed", no old-vs-new join needed)
    * decides whether to stop; the loop exits at the FIRST unchanged
    * round, so the cost scales with the graph diameter, not a guessed
    * k, and a diameter > k graph can no longer silently return
    * non-converged labels. `maxIterations` is a runaway bound only
    * (pathological 10^18-hop chains), not a semantic knob.
    *
    * Oracle equivalence: the converged result is IDENTICAL to any
    * k-round unrolling with k >= diameter (extra rounds past the fixed
    * point are identities) and to a reachability-closure min — so both
    * unrolled-CTE and WITH RECURSIVE oracles agree with it.
    *
    * Per-round cost: one equi-join of the persisted self-looped edge
    * list against the materialized label frontier + one min aggregation
    * + the O(nodes) sum probe. Each round is lineage-truncated
    * ([[checkpointRound]] — persist alone leaves analyzer cost growing
    * super-linearly in round depth) and the previous round's blocks are
    * freed, so memory holds exactly one node-sized frame + the edge
    * list regardless of round count.
    *
    * Diameter armor: plain propagation needs O(diameter) rounds, which
    * on a chain-shaped 100 TB graph is unbounded. Past round 8 each
    * round therefore adds a POINTER-JUMP — compose the label map with
    * itself (label := label(label)), a node-sized self-join — which
    * contracts label chains geometrically, bounding total rounds at
    * O(log diameter) instead of O(diameter). The jump is deferred
    * because on ordinary short-diameter graphs it costs an extra
    * shuffle per round and never fires (measured: the sf0.1 co-activity
    * fixture converges at round 7, plain 3.2 s vs always-jump 4.8 s).
    * Monotonicity is preserved (label(l) <= l pointwise), and a
    * combined propagate+jump fixed point forces the propagate-only
    * fixed point, so the sum probe's meaning is unchanged. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIterations: Int = 64, jumpAfter: Int = 8,
      driverEdgeLimit: Int = 1 << 20): DataFrame =
    connectedComponentsWithReport(edges, srcCol, dstCol,
      maxIterations, jumpAfter, driverEdgeLimit)._1

  /** Convergence telemetry for one [[connectedComponents]] run. The
    * facts fall out of the driver loop for free (the sum probe already
    * runs every round) — no extra job. `jumpedRounds` counts rounds
    * that composed the pointer-jump; `converged` false means the
    * maxIterations runaway bound fired first (labels are then a valid
    * UNDER-merged partition refinement, not components — callers
    * should alarm on it, which is the point of surfacing this). */
  final case class ComponentsRunReport(rounds: Int, jumpedRounds: Int,
      converged: Boolean)

  /** [[connectedComponents]] plus its [[ComponentsRunReport]] — the
    * observable form: a 100 TB operator whose round count tracks graph
    * diameter needs its rounds/jump/convergence facts visible to the
    * pipeline, not buried in driver logs. */
  def connectedComponentsWithReport(edges: DataFrame, srcCol: String,
      dstCol: String, maxIterations: Int = 64, jumpAfter: Int = 8,
      driverEdgeLimit: Int = 1 << 20)
      : (DataFrame, ComponentsRunReport) = {
    require(maxIterations >= 1, s"maxIterations must be >= 1, got $maxIterations")
    val spark = edges.sparkSession
    // scale-adaptive fast path (r20 — the Dedup.duplicateClusters
    // contract): up to `driverEdgeLimit` DISTINCT edges the component
    // resolution is a single driver-side union-find — one count + one
    // collect instead of O(diameter) rounds of join + checkpoint + agg
    // jobs that are pure scheduler overhead at small edge counts
    // (measured sf0.1 co-activity: 14,803 edges, 7 rounds, 3.5 s of
    // loop for a graph a union-find resolves in milliseconds). The
    // gate is a cheap count over the materialized edge cut, checked
    // BEFORE collect; labels are identical by construction (union by
    // min-root: find(x) IS the per-component minimum, the loop's fixed
    // point). Report reads rounds=0/converged — the loop telemetry
    // specs pin the over-limit path via driverEdgeLimit = 0.
    // null-keyed edges (uncastable ids) are dropped up front: the
    // driver fast paths would NPE on getLong where the distributed
    // loops silently never join them — filtering HERE keeps the two
    // sides of the gate behavior-identical (ADVICE r20)
    val eCut = Frames.cutLocal(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull).distinct())
    if (driverEdgeLimit > 0 && eCut.count() <= driverEdgeLimit) {
      import spark.implicits._
      val uf = new graft.core.LongUnionFind()
      eCut.collect().foreach(r => uf.union(r.getLong(0), r.getLong(1)))
      val out = spark.createDataset(uf.entries().toSeq).toDF("node", "label")
      freeRound(eCut)
      return (out, ComponentsRunReport(0, 0, converged = true))
    }
    val e = eCut
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
    var lab = checkpointRound(
      symSelf.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label")))
    var prevSum = labelSum(lab)
    var converged = false
    var rounds = 0
    var jumped = 0
    while (!converged && rounds < maxIterations) {
      val prop = symSelf.join(lab, col("src") === col("node"))
        .groupBy(col("dst")).agg(min(col("label")).as("label"))
        .select(col("dst").as("node"), col("label"))
      // past jumpAfter rounds: label := label(label). Every label value
      // is a node id and self-loops put every node in prop, so the
      // inner self-join is total; the two prop references share one
      // reused exchange in the physical plan.
      if (rounds >= jumpAfter) jumped += 1
      val stepped = if (rounds < jumpAfter) prop else
        prop.join(
          prop.select(col("node").as("l_node"), col("label").as("l_label")),
          col("label") === col("l_node"))
          .select(col("node"), col("l_label").as("label"))
      // eager: next is fully materialized as a leaf before old is freed
      val next = checkpointRound(stepped)
      val s = labelSum(next)
      val old = lab
      lab = next
      freeRound(old)
      rounds += 1
      converged = s.compareTo(prevSum) == 0
      prevSum = s
    }
    symSelf.unpersist(false)
    freeRound(eCut)
    (lab, ComponentsRunReport(rounds, jumped, converged))
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
  /** Exact per-node triangle counts via DEGREE-ORDERED wedge
    * generation: every edge is oriented from its lower-(degree, id)
    * endpoint to the higher, wedges are pairs of out-neighbors of one
    * center, and the closing edge is probed in oriented form — each
    * triangle materializes exactly once, from its minimum-(degree, id)
    * corner. The wedge frame is sum over nodes of C(outDeg, 2), the
    * classically skew-robust bound (a degree-5000 hub contributes
    * almost nothing when its neighbors out-rank it), vs sum(deg^2)/4
    * for id-ordered wedges.
    *
    * The wedge volume is ENFORCED, not just bounded (the LSH /
    * edit-join guard contract): one reduced aggregation over oriented
    * out-degrees computes the EXACT wedge-frame size before the join;
    * above `maxWedges` the call fails loudly. A graph that trips it —
    * e.g. a union of large cliques, where C(c,3) triangles exist by
    * construction — has intrinsically quadratic-plus truth, and the
    * guard says so instead of running into executor loss. Pass 0 to
    * disable; results are identical either way. */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String,
      maxWedges: Double = 2e9): DataFrame = {
    val raw = edges.select(col(srcCol).cast("long").as("x"),
      col(dstCol).cast("long").as("y")).filter(col("x") =!= col("y"))
    // the distinct edge list is referenced by the degree frame, the
    // orientation join, and the closing-edge probe, and its upstream
    // can be arbitrarily expensive (the registered query's is a
    // sessionize + interval join) — materialize it once, the
    // linkPrediction lesson (ReusedExchange misses recompute the
    // whole upstream; measured there)
    val e = materializeCut(raw.select(least(col("x"), col("y")).as("lo"),
      greatest(col("x"), col("y")).as("hi")).distinct())
    val deg = e.select(col("lo").as("v")).unionAll(e.select(col("hi").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val ed = e
      .join(deg.select(col("v").as("lo"), col("d").as("dlo")), "lo")
      .join(deg.select(col("v").as("hi"), col("d").as("dhi")), "hi")
    // orient lower-(degree, id) -> higher; lo < hi already, so ties in
    // degree orient lo -> hi. dir is itself three-way referenced (two
    // wedge legs + the closing-edge probe) over a join it should not
    // re-run — materialize the compact (u, v, dv) triple too.
    val dir = materializeCut(ed.select(
      when(col("dlo") <= col("dhi"), col("lo")).otherwise(col("hi")).as("u"),
      when(col("dlo") <= col("dhi"), col("hi")).otherwise(col("lo")).as("v"),
      when(col("dlo") <= col("dhi"), col("dhi")).otherwise(col("dlo")).as("dv")))

    if (maxWedges > 0) {
      val st = dir.groupBy(col("u")).agg(count(lit(1)).as("od"))
        .agg(coalesce(sum(col("od").cast("decimal(38,0)") * (col("od") - 1)),
          lit(java.math.BigDecimal.ZERO)).as("w2x"),
          coalesce(sum(col("od")), lit(0L)).as("ne")).head
      val report = GuardReport("triangle wedge", st.getLong(1),
        BigDecimal(st.getDecimal(0)) / 2, BigDecimal(maxWedges),
        perRow = false,
        "The graph's truth is intrinsically dense (large " +
          "near-cliques); cap hub degrees upstream, count on a " +
          "subgraph, or raise maxWedges if this volume is intended.")
      // release the materialized frames BEFORE the veto throws — a
      // guarded-away call must not leak edge-sized storage blocks
      if (report.tripped) { freeRound(e); freeRound(dir) }
      Guard.verify(report)
    }

    // wedge (u; v1, v2) with v1 before v2 in (degree, id) order; the
    // closing edge v1-v2, if present, is oriented v1 -> v2
    val w1 = dir.select(col("u"), col("v").as("v1"), col("dv").as("dv1"))
    val w2 = dir.select(col("u"), col("v").as("v2"), col("dv").as("dv2"))
    val wedges = w1.join(w2, "u")
      .filter(col("dv1") < col("dv2") ||
        (col("dv1") === col("dv2") && col("v1") < col("v2")))
    val tri = wedges.join(
      dir.select(col("u").as("v1"), col("v").as("v2")), Seq("v1", "v2"))
    val result = materializeCut(
      tri.select(explode(array(col("u"), col("v1"), col("v2"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("triangles")))
    freeRound(e)
    freeRound(dir)
    result
  }

  /** Link prediction over an undirected graph: for every NON-adjacent
    * node pair sharing at least one neighbor, the common-neighbor
    * count and the resource-allocation index (Zhou, Lü & Zhang 2009)
    * RA(u,v) = Σ_{z ∈ Γ(u)∩Γ(v)} 1/deg(z) — the classic "who should
    * connect next" scores. RA is carried as the integer-exact
    * micro-scaled sum Σ (1_000_000 div deg(z)), so partition merge
    * order cannot perturb it and an oracle engine replays every score
    * bit-for-bit (the same determinism recipe as the corpus ops'
    * integer-milli sums; 1/deg never collides with the floor because
    * both engines floor identically). Returns the top `k` candidate
    * pairs by (ra_micro desc, common_neighbors desc, pair asc) — a
    * total order, so the LIMIT is deterministic.
    *
    * Shape: wedges enumerate once per center z (u < v within each
    * neighbor list), candidates = wedges anti-joined against the edge
    * set, then one partial-combined (u,v) aggregation and a top-k
    * (TakeOrderedAndProject — per-partition heaps, k rows to the
    * driver, no global sort). Wedge volume is Σ_z deg(z)² — the same
    * skew point as [[triangleCounts]]; `maxDegree` caps it by
    * excluding hub CENTERS, the standard pruning (a hub's per-wedge RA
    * contribution is at most 1e6/deg, the least informative term —
    * published RA pipelines drop hubs for exactly this reason). The
    * default keeps every center (exact scores). */
  def linkPrediction(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, maxDegree: Option[Int] = None,
      maxWedges: Double = 2e9): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val raw = edges.select(col(srcCol).cast("long").as("x"),
      col(dstCol).cast("long").as("y")).filter(col("x") =!= col("y"))
    // e is referenced three times (both adjacency directions + the
    // anti-join) and its upstream can be arbitrarily expensive (the
    // registered query's is a sessionize + interval join). Relying on
    // ReusedExchange like triangleCounts does is NOT enough here:
    // AQE's per-stage re-optimization de-duplicates only some of the
    // three references, and the miss recomputes the whole upstream —
    // measured 61.9 s on the 10x fixture vs 11.5 s with the edge
    // frame materialized once. plain persist() is the WRONG tool: a
    // cached plan executes with AQE disabled, which cost the sf1
    // interval join 5x (51 s measured, PLANS.md) — materializeCut
    // (eager localCheckpoint / reliable checkpoint, the iterative
    // ops' round pattern) runs the upstream ONCE under full AQE and
    // leaves a compact lineage-truncated edge list (two longs per
    // edge) for the three downstream references.
    val e = materializeCut(raw.select(least(col("x"), col("y")).as("lo"),
      greatest(col("x"), col("y")).as("hi")).distinct())
    val adj = e.select(col("lo").as("z"), col("hi").as("n"))
      .union(e.select(col("hi").as("z"), col("lo").as("n")))
    val deg = adj.groupBy(col("z")).agg(count(lit(1)).as("deg"))
    val centers = maxDegree.map(m => deg.filter(col("deg") <= m)).getOrElse(deg)
    // wedge-volume guard, the triangleCounts contract: the wedge frame
    // is EXACTLY sum over centers of C(deg, 2) — one reduced agg
    // before the join; a center-degree distribution dense enough to
    // blow it (co-activity cliques) means the common-neighbor truth is
    // itself quadratic, and the remediation is the maxDegree cap
    if (maxWedges > 0) {
      val st = centers
        .agg(coalesce(sum(col("deg").cast("decimal(38,0)") * (col("deg") - 1)),
          lit(java.math.BigDecimal.ZERO)).as("w2x"),
          coalesce(sum(col("deg")), lit(0L)).as("ne")).head
      val report = GuardReport("link-prediction wedge", st.getLong(1),
        BigDecimal(st.getDecimal(0)) / 2, BigDecimal(maxWedges),
        perRow = false,
        "Pass maxDegree to cap hub centers (scores for capped hubs " +
          "are dropped, the documented contract), or run on a " +
          "subgraph.")
      if (report.tripped) freeRound(e) // no leak on the veto path
      Guard.verify(report)
    }
    val adjd = adj.join(centers, "z")
    val wedges = adjd.select(col("z"), col("n").as("u"), col("deg"))
      .join(adjd.select(col("z"), col("n").as("v")), "z")
      .filter(col("u") < col("v"))
    val cand = wedges.join(e,
      wedges("u") === e("lo") && wedges("v") === e("hi"), "left_anti")
    val result = materializeCut(
      cand.groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("common_neighbors"),
          sum(expr("1000000L div deg")).as("ra_micro"))
        .orderBy(col("ra_micro").desc, col("common_neighbors").desc,
          col("u"), col("v"))
        .limit(k))
    freeRound(e) // k result rows are safe; drop the edge blocks now
    result
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
    * driver-side.
    *
    * Convergence contract: `iterations` is an UPPER bound. After each
    * round a node-sized old-vs-new join counts changed labels; a round
    * that changes nothing is a fixed point (the update rule is a pure
    * function of the label state, so every later round is an identity)
    * and the loop exits early — equivalent to running all k rounds, so
    * fixed-k unrolled oracles stay valid. The early exit can never
    * trigger spuriously: synchronous LPA can OSCILLATE on bipartite
    * structures (period 2, never a fixed point), in which case exactly
    * k rounds run and the result is the exact k-round state — parity of
    * k then selects which phase of the oscillation you observe, exactly
    * as published synchronous LPA behaves (spec-pinned on K2). */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, driverEdgeLimit: Int = 1 << 20): DataFrame =
    labelPropagationWithReport(edges, srcCol, dstCol, iterations,
      driverEdgeLimit)._1

  /** Convergence telemetry for one [[labelPropagation]] run — the LPA
    * counterpart of [[ComponentsRunReport]]. `converged` false means
    * the k-round budget ran out (possibly an oscillator: synchronous
    * LPA has no fixed point on bipartite structures). */
  final case class LpaRunReport(rounds: Int, converged: Boolean)

  /** [[labelPropagation]] plus its [[LpaRunReport]] — the per-round
    * changed-label probe already computes everything the report needs. */
  def labelPropagationWithReport(edges: DataFrame, srcCol: String,
      dstCol: String, iterations: Int = 5,
      driverEdgeLimit: Int = 1 << 20): (DataFrame, LpaRunReport) = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = edges.sparkSession
    // scale-adaptive fast path (r20, the connectedComponents gate): the
    // synchronous rounds are a pure deterministic function of the
    // symmetrized edge set, so below the gate they run in the driver —
    // same most-frequent/min-tie rule, same early exit, same report.
    // null-keyed edges (uncastable ids) are dropped up front: the
    // driver fast paths would NPE on getLong where the distributed
    // loops silently never join them — filtering HERE keeps the two
    // sides of the gate behavior-identical (ADVICE r20)
    val eCut = Frames.cutLocal(
      edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull).distinct())
    if (driverEdgeLimit > 0 && eCut.count() <= driverEdgeLimit) {
      import spark.implicits._
      // primitive CSR adjacency (ADVICE r20); the graph is symmetric,
      // so a node's CSR neighbors ARE the srcs pointing at it — the
      // dst-grouped join's in-neighbor set
      val (nodes, off, nbr) = driverCsr(eCut.collect())
      freeRound(eCut)
      val n = nodes.length
      var maxDeg = 0
      var v = 0
      while (v < n) {
        if (off(v + 1) - off(v) > maxDeg) maxDeg = off(v + 1) - off(v)
        v += 1
      }
      var lab = nodes.clone()
      val buf = new Array[Long](maxDeg)
      var converged = false
      var rounds = 0
      while (!converged && rounds < iterations) {
        val next = new Array[Long](n)
        var node = 0
        while (node < n) {
          val d = off(node + 1) - off(node)
          var j = 0
          while (j < d) { buf(j) = lab(nbr(off(node) + j)); j += 1 }
          java.util.Arrays.sort(buf, 0, d)
          // highest count, ties to the SMALLEST label: ascending runs,
          // strictly-greater replaces, so the first (smallest) label
          // of the best count wins
          var bestL = Long.MaxValue
          var bestC = -1L
          var i = 0
          while (i < d) {
            var k = i + 1
            while (k < d && buf(k) == buf(i)) k += 1
            if (k - i > bestC) { bestC = k - i; bestL = buf(i) }
            i = k
          }
          next(node) = bestL
          node += 1
        }
        converged = java.util.Arrays.equals(next, lab)
        lab = next
        rounds += 1
      }
      // the loop counts a fixed-point-confirming round like the
      // distributed probe does (changed == 0 after running the round)
      return (spark.createDataset(
          nodes.indices.map(i => (nodes(i), lab(i)))).toDF("node", "label"),
        LpaRunReport(rounds, converged))
    }
    val e = eCut
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    var lab = checkpointRound(
      sym.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label")))
    var converged = false
    var rounds = 0
    while (!converged && rounds < iterations) {
      val counts = sym.join(lab, col("src") === col("node"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      // (cnt, -label) struct ordering = highest count, ties to the
      // smallest label, in ONE aggregation; no ordering ties exist
      // since labels are distinct within a dst group
      val next = checkpointRound(
        counts.groupBy(col("dst"))
          .agg(max_by(col("label"),
            struct(col("cnt"), (-col("label")).as("__nl"))).as("label"))
          .select(col("dst").as("node"), col("label")))
      // LPA labels are not monotone, so the probe is a real old-vs-new
      // comparison (two materialized leaves, node-sized) — unlike the
      // connectedComponents sum trick
      val changed = next
        .join(lab.select(col("node"), col("label").as("__prev")), "node")
        .filter(col("label") =!= col("__prev")).count()
      val old = lab
      lab = next
      freeRound(old)
      rounds += 1
      converged = changed == 0L
    }
    sym.unpersist(false)
    freeRound(eCut)
    (lab, LpaRunReport(rounds, converged))
  }
}
