package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics over an append-only (user_id, ts, value, ...)
  * table: gap-based sessionization, tumbling/sliding time windows,
  * per-key rankings and running aggregates.
  *
  * All shapes are the batch forms of their Structured Streaming
  * equivalents (same session_window / window calls work under
  * readStream + watermark — see graft.streaming). Monetary-style
  * doubles are summed as integer millis (round(v*1000) as long) so
  * aggregation is associative and bit-deterministic regardless of
  * partition merge order — the float-safe form for distributed sums.
  */
object Events {

  /** value as integer millis: exact, order-independent summation. */
  def milli(c: Column): Column = round(c * 1000).cast("long")

  /** Gap-based sessionization via the native session_window operator
    * (one shuffle on the grouping key; streaming-ready). A session
    * closes when the next event is >= gap after the last one. */
  def sessionize(df: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gap: String): DataFrame =
    df.groupBy(col(userCol), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"), sum(milli(col(valueCol))).as("value_milli"))
      .select(col(userCol),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("value_milli"))

  /** Session path analysis: the top-k most frequent in-session
    * event-type n-grams (default trigrams) — "what do users do in
    * sequence", the navigation-mining companion to the global
    * [[transitionMatrix]]. Session ids come from the lag/cumulative-
    * flag recipe (gap in whole seconds); the n-gram at each position
    * is built from lead() windows over the (user, session) partition —
    * no per-session collect_list, no unbounded state, every window
    * keyed by high-cardinality (user, session). Deterministic order by
    * (ts, idCol); top-k by (count desc, path asc). */
  def sessionPaths(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, gapSeconds: Long,
      k: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val gapUs = gapSeconds * 1000000L
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val flagged = df.select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__prev", lag(us, 1).over(wUser))
      .withColumn("__new",
        when(col("__prev").isNull || us - col("__prev") >= gapUs, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(
        wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wSess = Window.partitionBy(col(userCol), col("__sid"))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    flagged
      .withColumn("__t1", lead(col(typeCol), 1).over(wSess))
      .withColumn("__t2", lead(col(typeCol), 2).over(wSess))
      .filter(col("__t1").isNotNull && col("__t2").isNotNull)
      .select(concat_ws(">", col(typeCol), col("__t1"), col("__t2")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("path").asc)
      .limit(k)
  }

  /** Generic RANGE JOIN (point-in-interval): pair every point row with
    * every interval row whose [startUs, endUs] contains it — the
    * operator class Spark has no native form for (a naive theta join
    * plans as a broadcast nested loop and dies at scale). The
    * scale-correct plan is bucket binning: intervals explode to the
    * fixed-width time buckets they cover (bounded by span/bucket + 1),
    * points map to their single bucket, the join is an EQUI-join on
    * the bucket key, and the exact containment predicate runs on
    * bucket-local candidates only — the hand-built form of the range
    * join optimizations native engines ship.
    *
    * `points` needs (pointIdCol, usCol); `intervals` needs
    * (intervalIdCol, startUsCol, endUsCol), start <= end, all in µs.
    * Emits one row per qualifying (interval, point) pair. */
  def pointInIntervalJoin(points: DataFrame, intervals: DataFrame,
      pointIdCol: String, usCol: String,
      intervalIdCol: String, startUsCol: String, endUsCol: String,
      bucketUs: Long = 3600000000L): DataFrame = {
    require(bucketUs > 0)
    val ib = intervals.select(col(intervalIdCol), col(startUsCol), col(endUsCol),
        explode(sequence(
          expr(s"CAST($startUsCol AS BIGINT) div ${bucketUs}L"),
          expr(s"CAST($endUsCol AS BIGINT) div ${bucketUs}L"))).as("__bk"))
    val pb = points.select(col(pointIdCol), col(usCol),
      expr(s"CAST($usCol AS BIGINT) div ${bucketUs}L").as("__bk"))
    pb.join(ib, "__bk")
      .filter(col(usCol) >= col(startUsCol) && col(usCol) <= col(endUsCol))
      .select(col(intervalIdCol), col(startUsCol), col(endUsCol),
        col(pointIdCol), col(usCol))
  }

  /** Interval-interval OVERLAP join — the full range-join shape
    * ([[pointInIntervalJoin]]'s harder sibling): pair every a-interval
    * with every b-interval it overlaps ([sa, ea] ∩ [sb, eb] ≠ ∅,
    * inclusive bounds). Both sides explode to covered buckets, so an
    * overlapping pair meets in EVERY shared bucket; emitting it once
    * without a distinct-shuffle uses the owner-bucket rule: the pair
    * belongs to the bucket containing max(sa, sb) (the overlap's left
    * edge, which both sides always cover) — a row-local filter, so
    * the join output needs no dedup pass. Candidates are bucket-local;
    * never a nested-loop theta join. */
  def intervalOverlapJoin(a: DataFrame, b: DataFrame,
      aIdCol: String, aStartCol: String, aEndCol: String,
      bIdCol: String, bStartCol: String, bEndCol: String,
      bucketUs: Long = 3600000000L): DataFrame = {
    require(bucketUs > 0)
    def binned(df: DataFrame, id: String, s: String, e: String) =
      df.select(col(id), col(s), col(e),
        explode(sequence(
          expr(s"CAST($s AS BIGINT) div ${bucketUs}L"),
          expr(s"CAST($e AS BIGINT) div ${bucketUs}L"))).as("__bk"))
    val owner = expr(
      s"CAST(greatest($aStartCol, $bStartCol) AS BIGINT) div ${bucketUs}L")
    binned(a, aIdCol, aStartCol, aEndCol)
      .join(binned(b, bIdCol, bStartCol, bEndCol), "__bk")
      .filter(col(aStartCol) <= col(bEndCol) && col(bStartCol) <= col(aEndCol))
      .filter(col("__bk") === owner) // exactly one bucket owns the pair
      .select(col(aIdCol), col(aStartCol), col(aEndCol),
        col(bIdCol), col(bStartCol), col(bEndCol))
  }

  /** Tumbling window aggregate: one row per (window, ) bucket. */
  def tumbling(df: DataFrame, tsCol: String, valueCol: String,
      width: String): DataFrame =
    df.groupBy(window(col(tsCol), width))
      .agg(count(lit(1)).as("n_events"),
        sum(milli(col(valueCol))).as("value_milli"),
        countDistinct(col("user_id")).as("n_users"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_events"), col("value_milli"), col("n_users"))

  /** Sliding window aggregate (width, step): each event lands in
    * width/step overlapping buckets. */
  def sliding(df: DataFrame, tsCol: String, valueCol: String,
      width: String, step: String): DataFrame =
    df.groupBy(window(col(tsCol), width, step))
      .agg(count(lit(1)).as("n_events"), sum(milli(col(valueCol))).as("value_milli"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_events"), col("value_milli"))

  /** Top-k keys by total value: partial-aggregated groupBy then a
    * driver-merged top-k (TakeOrderedAndProject — no global sort). */
  def topUsers(df: DataFrame, userCol: String, valueCol: String, k: Int): DataFrame =
    df.groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"), sum(milli(col(valueCol))).as("value_milli"))
      .orderBy(col("value_milli").desc, col(userCol).asc)
      .limit(k)

  /** Per-event running aggregates within each user's timeline: event
    * index and cumulative value — the window-function surface. */
  def running(df: DataFrame, userCol: String, tsCol: String, idCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    df.select(col(idCol), col(userCol),
      row_number().over(w).cast("long").as("event_idx"),
      sum(milli(col(valueCol)))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .as("cum_value_milli"))
  }

  /** As-of join (backward, inclusive): for each left row, the single
    * latest right row with right.ts <= left.ts within the same key —
    * DuckDB/kdb ASOF JOIN semantics, which Spark has no operator for.
    *
    * Implemented as the union trick — tag both sides, merge, one
    * window pass per key filling the latest right payload forward —
    * NOT as a range join: one shuffle on the key and one in-partition
    * sort, O(n log n), no per-row range probe and no candidate
    * explosion on hot keys. The right payload travels as ONE struct so
    * all its fields come from the same right row (no column tearing
    * when a payload field is legitimately null).
    *
    * Rows of the right side should be unique per (key, ts) — at equal
    * timestamps the match would otherwise be tie-ambiguous (same as
    * DuckDB ASOF). Pre-aggregate to enforce it. */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightCols: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.select(
      (keyCols :+ tsCol).map(col) :+
        struct(rightCols.map(col): _*).as("__r_payload") :+
        lit(0).as("__side"): _*)
    val merged = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal ts => inclusive match
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    merged
      .withColumn("__asof", last(col("__r_payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        rightCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Per-key statistical outliers: events whose value deviates from the
    * key's mean by more than `sigma` standard deviations, counted per
    * key. The test is evaluated WITHOUT computing mean/stddev as
    * floats: (v*n - s)^2 > sigma^2 * (ss*n - s^2) over exact integer
    * window sums (v = value millis, s = sum, ss = sum of squares), so
    * the flag is bit-deterministic across engines and partitionings —
    * a float stddev's last ulp could flip a boundary event. The squares
    * exceed int64 and are squared in double: identical operands +
    * identical op order = identical IEEE results on any engine. One
    * shuffle for the window stats, one reduced shuffle for the per-key
    * counts. */
  def anomalyCounts(df: DataFrame, userCol: String, valueCol: String,
      sigma: Double): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    val vm = milli(col(valueCol))
    val d = df.select(col(userCol), vm.as("__v"))
      .withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(col("__v")).over(w))
      .withColumn("__ss", sum(col("__v") * col("__v")).over(w))
    val lhs = (col("__v") * col("__n") - col("__s")).cast("double")
    val rhs = lit(sigma * sigma) *
      (col("__ss").cast("double") * col("__n").cast("double") -
        col("__s").cast("double") * col("__s").cast("double"))
    d.withColumn("__flag", when(lhs * lhs > rhs, 1L).otherwise(0L))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"), sum(col("__flag")).as("n_anomalies"))
  }

  /** RFM segmentation — the classic user-value taxonomy: per user,
    * Recency (last activity), Frequency (event count), and Monetary
    * (summed milli-value), each quartile-binned 0..3 across the user
    * population, composed into a 3-digit segment code (r*100+f*10+m,
    * "333" = best). Binning compares each user's metric strictly
    * above the 25/50/75% interpolated thresholds —
    * `bin = Σ (metric*1000 > round(q_i*1000))` — a single arithmetic
    * expression, not a CASE ladder. The thresholds are MILLI-ROUNDED
    * to integers before the compare (the
    * [[TextStats.lengthQuantiles]] recipe, applied for the reason it
    * exists there): engines interpolate quantiles with different
    * expression trees, so the raw doubles can differ in the last ulp,
    * and an integer metric sitting exactly on a threshold would bin
    * differently per engine; against the rounded-integer threshold
    * the compare is exact.
    *
    * Scale shape: one partial-combined per-user aggregation, one
    * REDUCED percentile row over the user frame (percentile state per
    * metric, map-side combined) broadcast back — users never shuffle
    * twice and nothing driver-side grows with the data. */
  def rfmSegments(df: DataFrame, userCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val per = df.groupBy(col(userCol))
      .agg(max(unix_micros(col(tsCol))).as("last_us"),
        count(lit(1)).as("frequency"),
        sum(milli(col(valueCol))).as("monetary_milli"))
    val th = per.agg(
      expr("percentile(last_us, array(0.25D, 0.5D, 0.75D))").as("__r"),
      expr("percentile(frequency, array(0.25D, 0.5D, 0.75D))").as("__f"),
      expr("percentile(monetary_milli, array(0.25D, 0.5D, 0.75D))").as("__m"))
    def bin(metric: String, t: String): Column =
      (1 to 3).map(i =>
        (col(metric) * 1000 >
          round(element_at(col(t), i) * 1000).cast("long")).cast("long"))
        .reduce(_ + _)
    per.crossJoin(broadcast(th))
      .select(col(userCol), col("last_us"), col("frequency"),
        col("monetary_milli"),
        bin("last_us", "__r").as("r_bin"),
        bin("frequency", "__f").as("f_bin"),
        bin("monetary_milli", "__m").as("m_bin"))
      .withColumn("segment",
        col("r_bin") * 100 + col("f_bin") * 10 + col("m_bin"))
  }

  /** Time-boxed sequential funnel — the product-analytics "completed
    * each step within the window" form, a strictly stronger semantic
    * than the first-occurrence funnel: step 1 anchors at the user's
    * FIRST `steps(0)` event; step k completes at the EARLIEST
    * `steps(k)` event strictly after step k-1's completion and within
    * `windowUs` of it (the earliest-qualifying choice is what makes
    * later steps well-defined and engine-replayable). Output: one row
    * with n_users and the cumulative per-step completion counts.
    *
    * Scale shape: one user-keyed aggregation per step (each a join of
    * the one-row-per-user frontier against that step's filtered
    * events, partial-combined; the frontier reuses its hash
    * partitioning across steps) — steps are a constant, users shuffle
    * O(steps) times, nothing driver-side. */
  def windowedFunnel(df: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowUs: Long): DataFrame = {
    require(steps.size >= 2, s"need >= 2 steps, got $steps")
    require(windowUs > 0, s"windowUs must be positive: $windowUs")
    val us = unix_micros(col(tsCol))
    var frontier = df.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(us).as("__t0"))
    for (k <- 1 until steps.size) {
      val prev = s"__t${k - 1}"
      val evs = df.filter(col(typeCol) === steps(k))
        .select(col(userCol), us.as("__e"))
      val carried = (0 until k).map(i => col(s"__t$i"))
      frontier = frontier.join(evs, Seq(userCol), "left_outer")
        .groupBy(col(userCol) +: carried: _*)
        .agg(min(when(col("__e") > col(prev) &&
            col("__e") <= col(prev) + windowUs, col("__e"))).as(s"__t$k"))
    }
    val counts = steps.indices.tail.map(k =>
      sum(col(s"__t$k").isNotNull.cast("long")).as(s"n_step$k"))
    frontier.agg(count(lit(1)).as("n_step0"), counts: _*)
  }

  /** Weekly cohort retention matrix — the classic onboarding chart:
    * cohort = each user's FIRST activity week, and for every
    * (cohort_week, activity_week) cell the count of cohort members
    * active that week (week = epoch-days div 7 — purely integral, no
    * calendar/timezone semantics to diverge between engines).
    * `n_cohort` repeats the cohort's size on every row so the
    * retention ratio is a division away.
    *
    * Scale shape: distinct (user, week) activity → a min-week
    * aggregation per user (partial-combined) joined back on user_id —
    * users shuffle twice, weeks are bounded; the output matrix is
    * weeks² cells. */
  def cohortWeeks(df: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val act = df.select(col(userCol),
        expr(s"unix_micros(${tsCol}) div 604800000000").as("week"))
      .distinct()
    val first = act.groupBy(col(userCol))
      .agg(min(col("week")).as("cohort_week"))
    val sizes = first.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_cohort"))
    act.join(first.select(col(userCol), col("cohort_week")), Seq(userCol))
      .groupBy(col("cohort_week"), col("week"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week"), col("n_active"),
        col("n_cohort"))
  }

  /** RFM segment migration — user-value churn: score [[rfmSegments]]
    * independently on the events before and at/after `splitUs` (each
    * period against its OWN population quartiles, the standard
    * re-scored-per-period semantics), then count users per
    * (segment_before, segment_after) cell. Users absent from a period
    * carry segment -1 — the new-user column and the churned-user row
    * of the classic migration matrix.
    *
    * Scale shape: two [[rfmSegments]] passes (each one user-keyed
    * partial-combined agg + a reduced broadcast percentile row), one
    * user-keyed full-outer join, and a final matrix aggregation whose
    * reduced size is ≤ 65x65 cells regardless of user count. */
  def rfmMigration(df: DataFrame, userCol: String, tsCol: String,
      valueCol: String, splitUs: Long): DataFrame = {
    val before = rfmSegments(
        df.filter(unix_micros(col(tsCol)) < splitUs), userCol, tsCol, valueCol)
      .select(col(userCol), col("segment").as("__sb"))
    val after = rfmSegments(
        df.filter(unix_micros(col(tsCol)) >= splitUs), userCol, tsCol, valueCol)
      .select(col(userCol), col("segment").as("__sa"))
    before.join(after, Seq(userCol), "full_outer")
      .groupBy(coalesce(col("__sb"), lit(-1L)).as("segment_before"),
        coalesce(col("__sa"), lit(-1L)).as("segment_after"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Per-type breakdown: counts, value, time span. */
  def typeBreakdown(df: DataFrame, typeCol: String, tsCol: String,
      valueCol: String): DataFrame =
    df.groupBy(col(typeCol))
      .agg(count(lit(1)).as("n_events"),
        sum(milli(col(valueCol))).as("value_milli"),
        min(unix_micros(col(tsCol))).as("first_us"),
        max(unix_micros(col(tsCol))).as("last_us"))

  /** Duplicate-event suppression: drop an event when the PREVIOUS
    * event of the same (user, type) — kept or not — lies within
    * `windowUs` microseconds (the at-least-once ingestion cleanup op;
    * lag-relative semantics so the rule is a pure window function,
    * deterministic under (ts, id) ordering and replayable by any SQL
    * engine). One window per (user, type) partition, predicate only —
    * no state beyond the single lag value. */
  def dedupEvents(df: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String, windowUs: Long): DataFrame = {
    // µs ordering == timestamp ordering, so the window can run over
    // the already-projected long column
    val w = Window.partitionBy(col(userCol), col(typeCol))
      .orderBy(col("ts_us").asc, col(idCol).asc)
    df.select(col(idCol), col(userCol), col(typeCol),
        unix_micros(col(tsCol)).as("ts_us"))
      .withColumn("__prev", lag(col("ts_us"), 1).over(w))
      .filter(col("__prev").isNull || col("ts_us") - col("__prev") > windowUs)
      .drop("__prev")
  }

  /** Event-type transition matrix: per-user consecutive (from, to)
    * pairs with counts and each row's share of its from-type in
    * permille (integer floor — engine-exact). Order within a user is
    * (ts, id) — deterministic under timestamp ties. One lead() window
    * per user partition, then the matrix reduces to |types|^2 rows; the
    * share window runs over that reduced frame only. */
  def transitionMatrix(df: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val m = df.select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__nxt", lead(col(typeCol), 1).over(w))
      .filter(col("__nxt").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__nxt").as("to_type"))
      .agg(count(lit(1)).as("n"))
    m.withColumn("__tot", sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("share_permille", expr("(n * 1000) div __tot"))
      .drop("__tot")
  }

  /** KMV theta-sketch SET INTERSECTION: estimated distinct-key overlap
    * for every group pair from bounded per-group sketches — the
    * "how many users do these two event types share" question answered
    * from k hashes per group instead of a distinct-pair join over the
    * raw data. Deterministic estimator (same design rule as
    * [[graft.functions.KmvDistinctAgg]]): sketches are the k SMALLEST
    * distinct hashes (a set property, no randomness), theta = the k-th
    * smallest (or the full hash space when the group is unsaturated —
    * there the sketch IS the distinct set and the estimate is exact),
    * and est = c * SPACE / min(theta_a, theta_b) in pure integer
    * arithmetic over matching hashes below the pair's theta. Hashes
    * live in a 2^52 space (hash62 >> 10) precisely so c * SPACE fits a
    * long for k <= 1024 — no BigInt, no float, oracle-exact.
    *
    * Scale shape: one distinct + one per-group window bounded by k,
    * then all joins run over the k-per-group sketch frame (|groups|*k
    * rows), never the data. */
  /** Both sketch ops hash the key as a LONG (the hash62/lehmer3
    * integer streams are what the bit-exact DuckDB oracles replay); a
    * non-numeric key would cast to null and silently vanish, so fail
    * loudly instead and tell the caller to pre-hash. */
  private def requireIntegralKey(df: DataFrame, keyCol: String, op: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(keyCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op needs an integral key column; got `$keyCol`: ${dt.simpleString}. " +
        "Pre-hash non-numeric keys to a long (e.g. xxhash64) first.")
  }

  def kmvOverlap(df: DataFrame, groupCol: String, keyCol: String,
      k: Int = 128): DataFrame = {
    require(k > 1 && k <= 1024, s"k in (1, 1024], got $k")
    requireIntegralKey(df, keyCol, "kmvOverlap")
    val space = 1L << 52
    import org.apache.spark.sql.expressions.Window
    val h = df.select(col(groupCol).as("t"),
        shiftrightunsigned(
          graft.functions.hashes.hash62(col(keyCol).cast("long")), 10).as("h"))
      .filter(col("h").isNotNull).distinct()
    val sk = h.withColumn("rn",
        row_number().over(Window.partitionBy(col("t")).orderBy(col("h").asc)))
      .filter(col("rn") <= k).select(col("t"), col("h"))
    val th = sk.groupBy(col("t"))
      .agg(count(lit(1)).as("ns"), max(col("h")).as("mx"))
      .select(col("t"),
        when(col("ns") < k, lit(space)).otherwise(col("mx")).as("theta"))
    val a = sk.select(col("t").as("ta"), col("h"))
    val b = sk.select(col("t").as("tb"), col("h").as("hb"))
    a.join(b, col("h") === col("hb") && col("ta") < col("tb"))
      .join(th.select(col("t").as("ta"), col("theta").as("tha")), "ta")
      .join(th.select(col("t").as("tb"), col("theta").as("thb")), "tb")
      .filter(col("h") < least(col("tha"), col("thb")))
      .groupBy(col("ta").as("type_a"), col("tb").as("type_b"))
      .agg(count(lit(1)).as("c"),
        max(least(col("tha"), col("thb"))).as("th"))
      .select(col("type_a"), col("type_b"),
        expr(s"(c * $space) div th").as("est_common_keys"))
  }

  /** Count-min-sketch heavy hitters: keys whose frequency is at least
    * num/den of the mean key frequency, found WITHOUT a full per-key
    * aggregation — the reason a sketch matters at 100 TB, where the
    * key space (users) can be billions but the heavy set is tiny.
    *
    * Pass 1 folds every row into a depth x width counter grid
    * (stack-style explode + partial agg: the shuffle carries at most
    * depth*width grid rows per map partition — the grid, not the
    * data). The grid (<= depth*width longs, bounded by construction
    * like the IVF centroids) collects to the driver and rides back as
    * an array literal. Pass 2 probes each ROW's own key against the
    * grid (min over depth O(1) lookups, pure codegen, no shuffle);
    * CMS never under-counts, so filtering rows by their key's
    * estimate loses no true heavy hitter and needs no distinct-key
    * enumeration. Only the surviving sliver reaches the final exact
    * groupBy. Everything is deterministic (lehmer3 bucket streams,
    * integer counters, commutative elementwise merge), so the DuckDB
    * oracle reproduces each estimate bit-for-bit.
    *
    * Returns (key, est_count, true_count) for keys with
    * est_count >= ceil(total * num / (nKeys * den)) — the threshold
    * is driver-computed exact integer math, so no row-side product
    * can overflow no matter the scale.
    */
  def heavyHittersCms(df: DataFrame, keyCol: String, depth: Int = 4,
      width: Int = 512, num: Int = 6, den: Int = 5): DataFrame = {
    requireIntegralKey(df, keyCol, "heavyHittersCms")
    import graft.functions.hashes.lehmer3
    val ev = df.select(col(keyCol).cast("long").as("key"))
      .filter(col("key").isNotNull)
    def bucket(i: Int): Column =
      pmod(lehmer3(col("key") + lit(i * 1000003L)), lit(width.toLong))

    val grid = ev.select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("i"), bucket(i).as("b"))): _*)).as("ib"))
      .groupBy(col("ib.i"), col("ib.b")).agg(count(lit(1)).as("c"))
      .collect() // bounded: <= depth*width rows by construction
    val counters = Array.fill(depth * width)(0L)
    grid.foreach(r => counters(r.getInt(0) * width + r.getLong(1).toInt) = r.getLong(2))

    // total falls out of the grid for free: every row lands in exactly
    // one bucket of row 0, so that row's counters sum to the row count
    val total = counters.view.slice(0, width).sum
    val nKeys = ev.select(col("key")).distinct().count()
    val thr = (total * num + nKeys * den - 1) / (nKeys * den) // exact ceil-div

    val est = (0 until depth).map(i =>
        element_at(lit(counters), (bucket(i) + lit(i.toLong * width + 1)).cast("int")))
      .reduce(least(_, _))
    ev.withColumn("est_count", est)
      .filter(col("est_count") >= lit(thr))
      .groupBy(col("key"))
      .agg(max(col("est_count")).as("est_count"), count(lit(1)).as("true_count"))
  }
}
