package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Events

/** Event analytics surface over the `events` test table
  * (event_id, ts TIMESTAMP, user_id, event_type, value DOUBLE, props).
  *
  * Oracle notes: timestamps compare as epoch microseconds (BIGINT on
  * both engines — Spark unix_micros vs DuckDB epoch_us); double sums
  * compare as integer millis (see [[Events.milli]]). Session semantics:
  * Spark's session_window starts a new session when the inter-event
  * gap is >= the gap parameter; the oracle reproduces that with a
  * lag + cumulative-sum window. */
object EventQueries {

  /** Fixture generations have stored events.ts as TIMESTAMP(NANOS)
    * (surfacing as long ns under
    * spark.sql.legacy.parquet.nanosAsLong=true) and as timestamp[us]
    * (surfacing as TIMESTAMP_NTZ) — normalize to a proper µs
    * TimestampType column whichever encoding the parquet carries. The
    * UTC session timezone (set in Verify/Bench builders) makes the NTZ
    * cast value-preserving. */
  private def ev(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = graft.Tables.table(s, dir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Interval-interval overlap join: which users were active at the
    * same time (session co-activity pairs per user pair) — the
    * owner-bucket range join, exactly-once pairs by construction.
    * Doubles as the edge list for the PageRank query. */
  private[graft] def coactivityPairs(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d)
    val sessions = e
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("__w"))
      .agg(count(lit(1)).as("__n"), max(unix_micros(col("ts"))).as("e_us"))
      .filter(col("__n") >= 2)
      .select(col("user_id"), unix_micros(col("__w.start")).as("s_us"), col("e_us"))
    val a = sessions.select(
      concat_ws("_", col("user_id"), col("s_us")).as("aid"),
      col("s_us").as("a_s"), col("e_us").as("a_e"))
    val b = sessions.select(
      concat_ws("_", col("user_id"), col("s_us")).as("bid"),
      col("s_us").as("b_s"), col("e_us").as("b_e"))
    Events.intervalOverlapJoin(a, b, "aid", "a_s", "a_e", "bid", "b_s", "b_e")
      .select(
        split(col("aid"), "_").getItem(0).cast("long").as("user_a"),
        split(col("bid"), "_").getItem(0).cast("long").as("user_b"))
      .filter(col("user_a") < col("user_b"))
      .groupBy(col("user_a"), col("user_b"))
      .agg(count(lit(1)).as("n_overlaps"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_sessionize" -> ((s, d) =>
      Events.sessionize(ev(s, d), "user_id", "ts", "value", "30 minutes")),
    // interval-interval overlap join: which users were active at the
    // same time (session co-activity pairs per user pair) — the
    // owner-bucket range join, exactly-once pairs by construction
    "ev_session_overlap" -> ((s, d) => coactivityPairs(s, d)),
    // graph analytics over the co-activity graph: fixed-point integer
    // PageRank (5 rounds, damping 1/2, floor divisions) — every round
    // exact integer arithmetic, so the unrolled-CTE oracle replays the
    // full iteration bit-for-bit
    "ev_user_pagerank" -> ((s, d) =>
      graft.operators.Graph.pageRankFixedPoint(
        coactivityPairs(s, d), "user_a", "user_b", iterations = 5)
        .select(col("node").as("user_id"), col("pr").as("pr_scaled"))),
    // in-session navigation mining: top-15 event-type trigrams (lead
    // windows per (user, session) — no per-session collect)
    "ev_session_paths" -> ((s, d) =>
      Events.sessionPaths(ev(s, d), "user_id", "ts", "event_id",
        "event_type", gapSeconds = 1800L)),
    // generic RANGE JOIN: global purchase events binned into every
    // user's session intervals (bucket-binned equi-join + exact
    // containment — never a nested-loop theta join); per-session hits
    "ev_range_join" -> ((s, d) => {
      val e = ev(s, d)
      val sessions = e
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("__w"))
        .agg(count(lit(1)).as("__n"),
          max(unix_micros(col("ts"))).as("session_end_us"))
        .filter(col("__n") >= 2)
        .select(
          concat_ws("_", col("user_id"), unix_micros(col("__w.start")))
            .as("session_id"),
          unix_micros(col("__w.start")).as("session_start_us"),
          col("session_end_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), unix_micros(col("ts")).as("ev_us"))
      Events.pointInIntervalJoin(purchases, sessions,
          "event_id", "ev_us", "session_id", "session_start_us", "session_end_us")
        .groupBy(col("session_id"))
        .agg(count(lit(1)).as("n_purchases"), min(col("ev_us")).as("first_us"))
    }),
    "ev_tumbling_1h" -> ((s, d) =>
      Events.tumbling(ev(s, d), "ts", "value", "1 hour")),
    "ev_sliding_2h_1h" -> ((s, d) =>
      Events.sliding(ev(s, d), "ts", "value", "2 hours", "1 hour")),
    "ev_top_users" -> ((s, d) =>
      Events.topUsers(ev(s, d), "user_id", "value", 10)),
    "ev_running" -> ((s, d) =>
      Events.running(ev(s, d), "user_id", "ts", "event_id", "value")),
    "ev_type_agg" -> ((s, d) =>
      Events.typeBreakdown(ev(s, d), "event_type", "ts", "value")),
    // semi-structured: JSON props column -> typed field -> aggregate
    "ev_props_extract" -> ((s, d) =>
      ev(s, d)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy((col("k") / 10).cast("long").as("k_decade"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))),
    // per-user outlier counts: |v - mean| > 2 sigma, tested in exact
    // integer window sums (no float mean/stddev)
    "ev_anomaly" -> ((s, d) =>
      Events.anomalyCounts(ev(s, d), "user_id", "value", sigma = 2.0)),
    // RANGE frame: trailing 1-hour event-time window per user — frame
    // membership by time distance, not row count (peers at equal ts all
    // included on both engines); exact milli sums
    "ev_range_frame" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, 0L)
      ev(s, d)
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"), Events.milli(col("value")).as("vm"))
        .select(col("event_id"), col("user_id"),
          sum(col("vm")).over(w).as("trail_1h_milli"),
          count(lit(1)).over(w).as("n_trail_1h"))
    }),
    // window frame: trailing 4-row moving aggregate per user (sum and
    // count in exact millis — the mean is a ratio of exact integers, so
    // frame-order float accumulation can't diverge between engines)
    "ev_moving_avg" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-3, 0)
      ev(s, d).select(col("event_id"), col("user_id"),
          sum(Events.milli(col("value"))).over(w).as("mv_sum_milli"),
          count(lit(1)).over(w).as("n_frame"))
        .withColumn("mv_avg",
          col("mv_sum_milli").cast("double") / col("n_frame"))
    }),
    // approximate distinct users per event type via the KMV sketch:
    // bounded k-smallest-hash state like HyperLogLog, but an all-
    // integer estimator, so the DuckDB oracle recomputes the exact
    // same estimate (the spec additionally pins accuracy vs exact
    // distinct at estimator-regime cardinalities)
    "ev_approx_users" -> ((s, d) =>
      ev(s, d).groupBy(col("event_type"))
        .agg(graft.functions.sketch.kmv_distinct(
          graft.functions.hashes.hash62(col("user_id")), 1024).as("approx_users"))),
    // connected components (monotone min-label, convergence early-exit):
    // which co-activity clusters exist. The converged labels equal the
    // oracle's 8-round unrolling because extra rounds past the fixed
    // point are identities and the fixture diameter is < 8 (Graph.scala
    // scaladoc documents the equivalence).
    "ev_user_components" -> ((s, d) =>
      graft.operators.Graph.connectedComponents(
        coactivityPairs(s, d), "user_a", "user_b")
        .select(col("node").as("user_id"), col("label").as("component"))),
    // exact triangle counts on the co-activity graph (ordered-triple
    // wedge join — each triangle exactly once, no dedup)
    // wedge budget surfaced as session config (spark.graft.guard.
    // maxWedges) so a driver can tighten/lift the veto without code
    "ev_user_triangles" -> ((s, d) =>
      graft.operators.Graph.triangleCounts(
        coactivityPairs(s, d), "user_a", "user_b",
        maxWedges = graft.operators.Guard.budget(s, "maxWedges", 2e9))
        .select(col("node").as("user_id"), col("triangles"))),
    // link prediction on the co-activity graph: top-25 NON-adjacent
    // pairs by integer-exact resource-allocation index (+ common
    // neighbors) — "who should connect next"
    "ev_link_prediction" -> ((s, d) =>
      graft.operators.Graph.linkPrediction(
        coactivityPairs(s, d), "user_a", "user_b", k = 25,
        maxWedges = graft.operators.Guard.budget(s, "maxWedges", 2e9))
        .select(col("u").as("user_a"), col("v").as("user_b"),
          col("common_neighbors"), col("ra_micro"))),
    // KMV theta-sketch intersection: distinct-user overlap per
    // event-type pair from k-hash sketches, never a distinct-pair join
    "ev_type_overlap_kmv" -> ((s, d) =>
      Events.kmvOverlap(ev(s, d), "event_type", "user_id", k = 128)),
    // deterministic label propagation on the same edges: communities
    // after 3 synchronous rounds, min-label tie rule
    "ev_user_communities" -> ((s, d) =>
      graft.operators.Graph.labelPropagation(
        coactivityPairs(s, d), "user_a", "user_b", iterations = 3)
        .select(col("node").as("user_id"), col("label").as("community"))),
    // count-min-sketch heavy hitters: users at >= 1.2x the mean key
    // frequency via a 4x512 counter grid — per-row probe against the
    // broadcast grid (no distinct-key enumeration), exact count only
    // over the surviving heavy sliver. Deterministic lehmer3 buckets
    // make even the over-estimates oracle-exact
    "ev_heavy_hitters" -> ((s, d) =>
      Events.heavyHittersCms(ev(s, d), "user_id")),
    // conversion funnel view -> click -> purchase: per-user first-touch
    // timestamps (one grouped pass), then one reduced row counting users
    // whose stage times are strictly ordered. Null stage comparisons
    // fall to the otherwise(0) branch on both engines
    "ev_funnel" -> ((s, d) => {
      val us = unix_micros(col("ts"))
      def firstOf(tpe: String) = min(when(col("event_type") === tpe, us))
      ev(s, d).groupBy(col("user_id"))
        .agg(firstOf("view").as("fv"), firstOf("click").as("fc"),
          firstOf("purchase").as("fp"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("fv").isNotNull, 1L).otherwise(0L)).as("n_view"),
          sum(when(col("fc") > col("fv"), 1L).otherwise(0L)).as("n_view_then_click"),
          sum(when(col("fc") > col("fv") && col("fp") > col("fc"), 1L)
            .otherwise(0L)).as("n_full_funnel"))
    }),
    // next-day retention: distinct (user, day) activity, self left-join
    // on (user, day+1) — active and retained counts per day
    "ev_retention" -> ((s, d) => {
      val act = ev(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val nxt = act.select(col("user_id").as("u2"), col("day").as("d2"))
      act.join(nxt, col("user_id") === col("u2") && col("d2") === col("day") + 1,
          "left_outer")
        .groupBy(col("day"))
        .agg(count(lit(1)).as("active_users"),
          sum(when(col("u2").isNotNull, 1L).otherwise(0L)).as("retained_next_day"))
    }),
    // as-of join: each click matched to the user's latest prior-or-equal
    // purchase (null when none) — DuckDB ASOF LEFT JOIN is the oracle
    "ev_asof_purchase" -> ((s, d) => {
      val e = ev(s, d).withColumn("ts_us", unix_micros(col("ts")))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts_us")) // unique per (key, ts)
        .agg(max(col("event_id")).as("p_event_id"),
          max_by(Events.milli(col("value")), col("event_id")).as("p_value_milli"))
      Events.asOfJoin(clicks, purchases, Seq("user_id"), "ts_us",
        Seq("p_event_id", "p_value_milli"))
    }),
    // per-user consecutive event-type transitions -> |types|^2 matrix
    // with integer permille shares per from-type
    "ev_transitions" -> ((s, d) =>
      Events.transitionMatrix(ev(s, d), "user_id", "ts", "event_id", "event_type")),
    // at-least-once cleanup: drop same-(user, type) events within 60s
    // of their predecessor (lag-relative, replayable semantics)
    "ev_dedup_window" -> ((s, d) =>
      Events.dedupEvents(ev(s, d), "user_id", "event_type", "ts", "event_id",
        windowUs = 60000000L)),
    // RFM user-value segmentation: per-user recency/frequency/monetary
    // quartile bins composed into a 3-digit segment code
    "ev_rfm_segments" -> ((s, d) =>
      Events.rfmSegments(ev(s, d), "user_id", "ts", "value")),
    // time-boxed sequential funnel: each step within 2h of the prior
    // step's completion, earliest-qualifying event per step
    "ev_funnel_windowed" -> ((s, d) =>
      Events.windowedFunnel(ev(s, d), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), windowUs = 7200000000L)),
    // weekly cohort retention matrix: cohort = first-activity week,
    // counts of cohort members active per later week
    "ev_cohort_weeks" -> ((s, d) =>
      Events.cohortWeeks(ev(s, d), "user_id", "ts")),
    // segment migration matrix: RFM re-scored per half-month, users
    // counted per (before, after) cell; -1 = absent (new / churned)
    "ev_rfm_migration" -> ((s, d) =>
      Events.rfmMigration(ev(s, d), "user_id", "ts", "value",
        splitUs = 1705363200000000L)))

  private val vMilli = "CAST(round(value * 1000, 0) AS BIGINT)"

  /** Builder for the RFM oracle CTE chain (per/th/b, suffixed) —
    * shared by the segments and migration oracles so the bin
    * arithmetic is rendered once. `where` is a full WHERE clause or
    * empty. */
  private def rfmOracleCtes(sfx: String, where: String): String = {
    def bins(m: String, t: String) = (1 to 3).map(i =>
      s"($m * 1000 > CAST(round($t$i * 1000, 0) AS BIGINT))::INT")
      .mkString("\n             + ")
    s"""per$sfx AS (SELECT user_id, max(epoch_us(ts)) AS last_us,
           count(*)::BIGINT AS frequency, sum($vMilli)::BIGINT AS monetary_milli
           FROM events $where GROUP BY 1),
         th$sfx AS (SELECT
           quantile_cont(last_us, 0.25) AS r1, quantile_cont(last_us, 0.5) AS r2,
           quantile_cont(last_us, 0.75) AS r3,
           quantile_cont(frequency, 0.25) AS f1, quantile_cont(frequency, 0.5) AS f2,
           quantile_cont(frequency, 0.75) AS f3,
           quantile_cont(monetary_milli, 0.25) AS m1,
           quantile_cont(monetary_milli, 0.5) AS m2,
           quantile_cont(monetary_milli, 0.75) AS m3 FROM per$sfx),
         b$sfx AS (SELECT user_id, last_us, frequency, monetary_milli,
           (${bins("last_us", "r")})::BIGINT AS r_bin,
           (${bins("frequency", "f")})::BIGINT AS f_bin,
           (${bins("monetary_milli", "m")})::BIGINT AS m_bin
           FROM per$sfx, th$sfx)"""
  }

  val oracleSql: Map[String, String] = Map(
    "ev_sessionize" ->
      s"""WITH o AS (
           SELECT user_id, event_id, epoch_us(ts) AS us, $vMilli AS vm,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events
         ), m AS (
           SELECT user_id, us, vm,
             sum(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM o)
         SELECT user_id, min(us) AS session_start_us, count(*) AS n_events,
           CAST(sum(vm) AS BIGINT) AS value_milli
         FROM m GROUP BY user_id, sid""",
    // naive theta self-join form of the overlap join
    "ev_session_overlap" ->
      s"""WITH o AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_us
           FROM events),
         m AS (
           SELECT user_id, us,
             sum(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
               THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM o),
         sess AS (
           SELECT user_id, min(us) AS s_us, max(us) AS e_us
           FROM m GROUP BY user_id, sid HAVING count(*) >= 2)
         SELECT a.user_id AS user_a, b.user_id AS user_b,
           count(*) AS n_overlaps
         FROM sess a JOIN sess b
           ON a.user_id < b.user_id
           AND a.s_us <= b.e_us AND b.s_us <= a.e_us
         GROUP BY 1, 2""",
    // naive theta form: the oracle can afford what the engine avoids
    "ev_range_join" ->
      s"""WITH o AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_us
           FROM events),
         m AS (
           SELECT user_id, us,
             sum(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
               THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM o),
         sess AS (
           SELECT user_id || '_' || min(us) AS session_id,
             min(us) AS s_us, max(us) AS e_us
           FROM m GROUP BY user_id, sid HAVING count(*) >= 2),
         p AS (SELECT event_id, epoch_us(ts) AS ev_us FROM events
               WHERE event_type = 'purchase')
         SELECT session_id, count(*) AS n_purchases, min(ev_us) AS first_us
         FROM sess JOIN p ON p.ev_us BETWEEN sess.s_us AND sess.e_us
         GROUP BY 1""",
    "ev_session_paths" ->
      s"""WITH o AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_us
           FROM events),
         m AS (
           SELECT user_id, event_id, event_type, us,
             sum(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
               THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM o),
         g AS (
           SELECT event_type AS t0,
             lead(event_type, 1) OVER w AS t1,
             lead(event_type, 2) OVER w AS t2
           FROM m WINDOW w AS (PARTITION BY user_id, sid ORDER BY us, event_id))
         SELECT t0 || '>' || t1 || '>' || t2 AS path,
           count(*) AS n_occurrences
         FROM g WHERE t1 IS NOT NULL AND t2 IS NOT NULL
         GROUP BY 1 ORDER BY n_occurrences DESC, path ASC LIMIT 15""",
    "ev_tumbling_1h" ->
      s"""SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start_us,
           count(*) AS n_events, CAST(sum($vMilli) AS BIGINT) AS value_milli,
           count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1""",
    "ev_sliding_2h_1h" ->
      s"""SELECT ((epoch_us(ts) // 3600000000) - o.o) * 3600000000 AS window_start_us,
           count(*) AS n_events, CAST(sum($vMilli) AS BIGINT) AS value_milli
         FROM events, (VALUES (0), (1)) AS o(o) GROUP BY 1""",
    "ev_top_users" ->
      s"""SELECT user_id, count(*) AS n_events, CAST(sum($vMilli) AS BIGINT) AS value_milli
         FROM events GROUP BY 1
         ORDER BY value_milli DESC, user_id ASC LIMIT 10""",
    "ev_running" ->
      s"""SELECT event_id, user_id,
           row_number() OVER w AS event_idx,
           CAST(sum($vMilli) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_value_milli
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
    "ev_type_agg" ->
      s"""SELECT event_type, count(*) AS n_events, CAST(sum($vMilli) AS BIGINT) AS value_milli,
           min(epoch_us(ts)) AS first_us, max(epoch_us(ts)) AS last_us
         FROM events GROUP BY 1""",
    "ev_props_extract" ->
      s"""WITH k AS (SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k FROM events)
         SELECT CAST(floor(k / 10.0) AS BIGINT) AS k_decade,
           count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k
         FROM k GROUP BY 1""",
    "ev_anomaly" ->
      s"""WITH d AS (
           SELECT user_id, $vMilli AS v,
             count(*) OVER w AS n,
             CAST(sum($vMilli) OVER w AS BIGINT) AS s,
             CAST(sum($vMilli * $vMilli) OVER w AS BIGINT) AS ss
           FROM events WINDOW w AS (PARTITION BY user_id))
         SELECT user_id, count(*) AS n_events,
           CAST(sum(CASE WHEN
             CAST(v * n - s AS DOUBLE) * CAST(v * n - s AS DOUBLE) >
             4.0 * (CAST(ss AS DOUBLE) * CAST(n AS DOUBLE) -
                    CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
         FROM d GROUP BY 1""",
    "ev_range_frame" ->
      s"""SELECT event_id, user_id,
           CAST(sum($vMilli) OVER w AS BIGINT) AS trail_1h_milli,
           count(*) OVER w AS n_trail_1h
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
           RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
    "ev_moving_avg" ->
      s"""SELECT event_id, user_id,
           CAST(sum($vMilli) OVER w AS BIGINT) AS mv_sum_milli,
           count(*) OVER w AS n_frame,
           CAST(sum($vMilli) OVER w AS DOUBLE) / (count(*) OVER w) AS mv_avg
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""",
    // KMV replication: k-th smallest distinct hash62 per group; below
    // k distinct hashes the sketch state is the exact distinct set
    "ev_approx_users" ->
      s"""WITH h AS (SELECT DISTINCT event_type,
             ${PortableSql.hash62("user_id")} AS h FROM events),
         r AS (SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n FROM h)
         SELECT event_type,
           CAST(CASE WHEN max(n) < 1024 THEN max(n)
             ELSE (1023::HUGEINT * 4611686018427387904::HUGEINT)
               // max(CASE WHEN rn = 1024 THEN h END)
             END AS BIGINT) AS approx_users
         FROM r GROUP BY event_type""",
    // triangle replication: identical ordered wedge-close joins
    "ev_user_triangles" ->
      s"""WITH o AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_us
           FROM events),
         m AS (
           SELECT user_id, us,
             sum(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
               THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM o),
         sess AS (
           SELECT user_id, min(us) AS s_us, max(us) AS e_us
           FROM m GROUP BY user_id, sid HAVING count(*) >= 2),
         e AS (SELECT DISTINCT a.user_id AS lo, b.user_id AS hi
           FROM sess a JOIN sess b
             ON a.user_id < b.user_id
             AND a.s_us <= b.e_us AND b.s_us <= a.e_us),
         tri AS (SELECT ab.lo AS a, ab.hi AS b, bc.hi AS c
           FROM e ab JOIN e bc ON bc.lo = ab.hi
           JOIN e ac ON ac.lo = ab.lo AND ac.hi = bc.hi),
         credit AS (SELECT a AS node FROM tri
           UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri)
         SELECT node AS user_id, count(*) AS triangles
         FROM credit GROUP BY 1""",
    // link-prediction replication: same session edges, same wedge
    // enumeration (u < v per center), NOT EXISTS anti-join, and the
    // identical integer-floored RA sum
    "ev_link_prediction" ->
      s"""WITH o AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_us
           FROM events),
         m AS (
           SELECT user_id, us,
             sum(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
               THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM o),
         sess AS (
           SELECT user_id, min(us) AS s_us, max(us) AS e_us
           FROM m GROUP BY user_id, sid HAVING count(*) >= 2),
         e AS (SELECT DISTINCT a.user_id AS lo, b.user_id AS hi
           FROM sess a JOIN sess b
             ON a.user_id < b.user_id
             AND a.s_us <= b.e_us AND b.s_us <= a.e_us),
         adj AS (SELECT lo AS z, hi AS n FROM e
           UNION ALL SELECT hi AS z, lo AS n FROM e),
         deg AS (SELECT z, count(*)::BIGINT AS deg FROM adj GROUP BY 1),
         w AS (SELECT a.z, a.n AS u, b.n AS v, d.deg
           FROM adj a JOIN adj b ON a.z = b.z AND a.n < b.n
           JOIN deg d ON d.z = a.z),
         cand AS (SELECT * FROM w WHERE NOT EXISTS
           (SELECT 1 FROM e WHERE e.lo = w.u AND e.hi = w.v))
         SELECT u AS user_a, v AS user_b,
           count(*)::BIGINT AS common_neighbors,
           CAST(sum(1000000 // deg) AS BIGINT) AS ra_micro
         FROM cand GROUP BY 1, 2
         ORDER BY ra_micro DESC, common_neighbors DESC, user_a, user_b
         LIMIT 25""",
    // CONVERGED components, not a fixed-round unrolling: the engine
    // side now runs min-label propagation to its fixed point
    // (Graph.connectedComponents early-exit), so the oracle must be the
    // true component minimum too. A recursive reachability CTE (UNION
    // dedups, so it terminates at the closure) then min over each
    // node's reachable set IS that fixed point, independent of whatever
    // diameter the regenerated fixture graph happens to have — the old
    // 8-round unrolling only matched because BOTH engines stopped at
    // the same non-converged state (the r10 scale footgun, now closed
    // on both sides).
    "ev_user_components" ->
      s"""WITH RECURSIVE o AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_us
           FROM events),
         m AS (
           SELECT user_id, us,
             sum(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
               THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM o),
         sess AS (
           SELECT user_id, min(us) AS s_us, max(us) AS e_us
           FROM m GROUP BY user_id, sid HAVING count(*) >= 2),
         pairs AS (SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
           FROM sess a JOIN sess b
             ON a.user_id < b.user_id
             AND a.s_us <= b.e_us AND b.s_us <= a.e_us),
         sym AS (SELECT ua AS src, ub AS dst FROM pairs
                 UNION SELECT ub, ua FROM pairs),
         reach(node, r) AS (
           SELECT DISTINCT src, src FROM sym
           UNION
           SELECT reach.node, e.dst FROM reach JOIN sym e ON e.src = reach.r)
         SELECT node AS user_id, min(r) AS component
         FROM reach GROUP BY 1""",
    // KMV intersection replication: same k-smallest sketch sets,
    // theta rule, and integer estimate
    "ev_type_overlap_kmv" ->
      s"""WITH h AS (SELECT DISTINCT event_type AS t,
             (${PortableSql.hash62("user_id")} // 1024) AS h FROM events),
         r AS (SELECT t, h,
             row_number() OVER (PARTITION BY t ORDER BY h) AS rn FROM h),
         sk AS (SELECT t, h FROM r WHERE rn <= 128),
         th AS (SELECT t, CASE WHEN count(*) < 128 THEN 4503599627370496
                  ELSE max(h) END AS theta FROM sk GROUP BY 1),
         c AS (SELECT a.t AS type_a, b.t AS type_b, count(*) AS c,
                 max(least(ta.theta, tb.theta)) AS th
               FROM sk a JOIN sk b ON a.h = b.h AND a.t < b.t
               JOIN th ta ON ta.t = a.t JOIN th tb ON tb.t = b.t
               WHERE a.h < least(ta.theta, tb.theta)
               GROUP BY 1, 2)
         SELECT type_a, type_b,
           CAST(((c * 4503599627370496) // th) AS BIGINT) AS est_common_keys
         FROM c""",
    // fixed-point PageRank replication: same lag-recipe session edges,
    // then the 5 rounds UNROLLED as CTEs — floor divisions and integer
    // sums make every round's state bit-identical across engines
    "ev_user_pagerank" -> {
      def step(i: Int) =
        s"""p$i AS (SELECT e.dst AS node,
           524288 + (CAST(sum(p.pr // e.deg) AS BIGINT) // 2) AS pr
           FROM ed e JOIN p${i - 1} p ON p.node = e.src GROUP BY 1)"""
      s"""WITH o AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_us
           FROM events),
         m AS (
           SELECT user_id, us,
             sum(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
               THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM o),
         sess AS (
           SELECT user_id, min(us) AS s_us, max(us) AS e_us
           FROM m GROUP BY user_id, sid HAVING count(*) >= 2),
         pairs AS (SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
           FROM sess a JOIN sess b
             ON a.user_id < b.user_id
             AND a.s_us <= b.e_us AND b.s_us <= a.e_us),
         sym AS (SELECT ua AS src, ub AS dst FROM pairs
                 UNION SELECT ub, ua FROM pairs),
         deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY 1),
         ed AS (SELECT s.src, s.dst, d.deg FROM sym s JOIN deg d USING (src)),
         p0 AS (SELECT src AS node, CAST(1048576 AS BIGINT) AS pr FROM deg),
         ${(1 to 5).map(step).mkString(",\n         ")}
         SELECT node AS user_id, pr AS pr_scaled FROM p5"""
    },
    // LPA replication: 3 unrolled rounds of count -> max -> min-label
    "ev_user_communities" -> {
      def step(i: Int) =
        s"""c$i AS (SELECT e.dst, p.label, count(*) AS cnt
           FROM ed e JOIN l${i - 1} p ON p.node = e.src GROUP BY 1, 2),
         b$i AS (SELECT dst, max(cnt) AS mc FROM c$i GROUP BY 1),
         l$i AS (SELECT c.dst AS node, min(c.label) AS label
           FROM c$i c JOIN b$i b ON c.dst = b.dst AND c.cnt = b.mc GROUP BY 1)"""
      s"""WITH o AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_us
           FROM events),
         m AS (
           SELECT user_id, us,
             sum(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
               THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM o),
         sess AS (
           SELECT user_id, min(us) AS s_us, max(us) AS e_us
           FROM m GROUP BY user_id, sid HAVING count(*) >= 2),
         pairs AS (SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
           FROM sess a JOIN sess b
             ON a.user_id < b.user_id
             AND a.s_us <= b.e_us AND b.s_us <= a.e_us),
         sym AS (SELECT ua AS src, ub AS dst FROM pairs
                 UNION SELECT ub, ua FROM pairs),
         ed AS (SELECT src, dst FROM sym),
         l0 AS (SELECT DISTINCT src AS node, src AS label FROM sym),
         ${(1 to 3).map(step).mkString(",\n         ")}
         SELECT node AS user_id, label AS community FROM l3"""
    },
    // count-min replication: the grid is GROUP BY (row, bucket) counts,
    // a key's estimate the min over its 4 bucket cells; the threshold
    // is the same exact ceil-division the Scala side computes
    "ev_heavy_hitters" ->
      s"""WITH ev AS (SELECT user_id AS key FROM events WHERE user_id IS NOT NULL),
         bk AS (SELECT key, i,
             (${PortableSql.lehmer3("key + (i * 1000003)")} % 512) AS bucket
           FROM ev CROSS JOIN range(4) t(i)),
         grid AS (SELECT i, bucket, count(*) AS c FROM bk GROUP BY 1, 2),
         st AS (SELECT count(*) AS total, count(DISTINCT key) AS nkeys FROM ev),
         thr AS (SELECT ((total * 6) + (nkeys * 5) - 1) // (nkeys * 5) AS t FROM st),
         kc AS (SELECT key, count(*) AS true_count FROM ev GROUP BY 1),
         ke AS (SELECT b.key, b.true_count, min(g.c) AS est_count
           FROM kc b CROSS JOIN range(4) t(i) JOIN grid g
             ON g.i = t.i
            AND g.bucket = (${PortableSql.lehmer3("b.key + (t.i * 1000003)")} % 512)
           GROUP BY 1, 2)
         SELECT key, est_count, true_count FROM ke, thr
         WHERE est_count >= thr.t""",
    "ev_funnel" ->
      s"""WITH u AS (SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS fv,
           min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS fc,
           min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS fp
         FROM events GROUP BY 1)
         SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN fv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN fc > fv THEN 1 ELSE 0 END) AS BIGINT) AS n_view_then_click,
           CAST(sum(CASE WHEN fc > fv AND fp > fc THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
         FROM u""",
    "ev_retention" ->
      s"""WITH du AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
           FROM events)
         SELECT a.day, count(*) AS active_users,
           CAST(sum(CASE WHEN b.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS retained_next_day
         FROM du a LEFT JOIN du b
           ON a.user_id = b.user_id AND b.day = a.day + 1
         GROUP BY 1""",
    "ev_asof_purchase" ->
      s"""WITH pv AS (
           SELECT user_id, epoch_us(ts) AS ts_us, max(event_id) AS p_event_id,
             arg_max($vMilli, event_id) AS p_value_milli
           FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
         ), c AS (
           SELECT event_id, user_id, epoch_us(ts) AS ts_us
           FROM events WHERE event_type = 'click')
         SELECT c.event_id, c.user_id, c.ts_us,
           pv.p_event_id AS asof_p_event_id,
           pv.p_value_milli AS asof_p_value_milli
         FROM c ASOF LEFT JOIN pv
           ON c.user_id = pv.user_id AND c.ts_us >= pv.ts_us""",
    "ev_transitions" ->
      s"""WITH o AS (SELECT event_type,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
           FROM events),
         m AS (SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
               FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2)
         SELECT from_type, to_type, n,
           CAST((n * 1000) // (sum(n) OVER (PARTITION BY from_type)) AS BIGINT)
             AS share_permille
         FROM m""",
    "ev_dedup_window" ->
      s"""WITH o AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
               ORDER BY ts, event_id) AS prev
           FROM events)
         SELECT event_id, user_id, event_type, ts_us
         FROM o WHERE prev IS NULL OR ts_us - prev > 60000000""",
    // windowed-funnel replication: per-step earliest-qualifying CTEs
    "ev_funnel_windowed" ->
      s"""WITH s0 AS (SELECT user_id, min(epoch_us(ts)) AS t0
           FROM events WHERE event_type = 'view' GROUP BY 1),
         s1 AS (SELECT s0.user_id, s0.t0,
             min(CASE WHEN epoch_us(e.ts) > s0.t0
                 AND epoch_us(e.ts) <= s0.t0 + 7200000000
                 THEN epoch_us(e.ts) END) AS t1
           FROM s0 LEFT JOIN events e
             ON e.user_id = s0.user_id AND e.event_type = 'click'
           GROUP BY 1, 2),
         s2 AS (SELECT s1.user_id, s1.t0, s1.t1,
             min(CASE WHEN epoch_us(e.ts) > s1.t1
                 AND epoch_us(e.ts) <= s1.t1 + 7200000000
                 THEN epoch_us(e.ts) END) AS t2
           FROM s1 LEFT JOIN events e
             ON e.user_id = s1.user_id AND e.event_type = 'purchase'
           GROUP BY 1, 2, 3)
         SELECT count(*)::BIGINT AS n_step0,
           sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_step1,
           sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_step2
         FROM s2""",
    // cohort replication: identical integral week arithmetic
    "ev_cohort_weeks" ->
      s"""WITH act AS (SELECT DISTINCT user_id,
           epoch_us(ts) // 604800000000 AS week FROM events),
         first AS (SELECT user_id, min(week) AS cohort_week
           FROM act GROUP BY 1),
         sizes AS (SELECT cohort_week, count(*)::BIGINT AS n_cohort
           FROM first GROUP BY 1)
         SELECT f.cohort_week, a.week, count(*)::BIGINT AS n_active,
           s2.n_cohort
         FROM act a JOIN first f USING (user_id)
           JOIN sizes s2 ON s2.cohort_week = f.cohort_week
         GROUP BY 1, 2, 4""",
    // RFM replication: same per-user aggregates, interpolated quartile
    // thresholds milli-rounded before the strict-greater bin sums;
    // the CTE chain is builder-generated so the segments and the
    // migration matrix share one rendering
    "ev_rfm_segments" ->
      s"""WITH ${rfmOracleCtes("", "")}
         SELECT user_id, last_us, frequency, monetary_milli,
           r_bin, f_bin, m_bin,
           (r_bin * 100 + f_bin * 10 + m_bin) AS segment
         FROM b""",
    // migration replication: two independent period scorings, a
    // user-keyed full outer join, the <= 65x65 matrix count
    "ev_rfm_migration" ->
      s"""WITH ${rfmOracleCtes("_a", "WHERE epoch_us(ts) < 1705363200000000")},
         ${rfmOracleCtes("_b", "WHERE epoch_us(ts) >= 1705363200000000")}
         SELECT COALESCE(x.seg, -1)::BIGINT AS segment_before,
           COALESCE(y.seg, -1)::BIGINT AS segment_after,
           count(*)::BIGINT AS n_users
         FROM (SELECT user_id, r_bin * 100 + f_bin * 10 + m_bin AS seg
               FROM b_a) x
         FULL OUTER JOIN (SELECT user_id, r_bin * 100 + f_bin * 10 + m_bin AS seg
               FROM b_b) y ON x.user_id = y.user_id
         GROUP BY 1, 2""")
}
