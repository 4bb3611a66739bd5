package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Regression armor for the r9 fixture incident: a driver regeneration
  * flipped events.ts from TIMESTAMP(NANOS) (long ns under
  * nanosAsLong=true) to timestamp[us] (TIMESTAMP_NTZ) and silently
  * erased the 15 event/graph correctness rows until EventQueries.ev
  * learned to type-dispatch. This spec pins that dispatch for EVERY
  * plausible physical ts encoding — nanos-as-long, timestamp[us]/NTZ,
  * tz-aware timestamp[us] — by materializing the same fixture under
  * each encoding and asserting a representative slice of the event
  * family (windows, sessions, range join, funnel, graph) returns
  * IDENTICAL rows on all of them. The next regeneration can change the
  * physical type again and land on an already-green path. */
class EventTsEncodingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    // mirror the Verify/Bench session: nanos parquet reads as long ns,
    // UTC makes NTZ<->TZ casts value-preserving
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val srcDir = "/root/testdata/sf0.001"

  /** events.ts normalized to a canonical µs TimestampType column,
    * whatever the fixture currently stores. */
  private def canonicalEvents(): DataFrame = {
    val df = spark.read.parquet(s"$srcDir/events.parquet")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Write the fixture under one physical ts encoding; returns the
    * table dir EventQueries can read. */
  private def materialize(variant: String): String = {
    val base = canonicalEvents()
    val out = variant match {
      case "nanos_long" =>
        base.withColumn("ts", (unix_micros(col("ts")) * 1000L).cast(LongType))
      case "ntz_micros" =>
        base.withColumn("ts", col("ts").cast(TimestampNTZType))
      case "tz_micros" => base
    }
    val dir = s"/tmp/tsenc_$variant"
    out.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // windows + sessions + interval join + funnel + iterative graph —
  // one query per family that died in r9 — plus the second-block RFM
  // recency probe. ev_link_prediction is deliberately absent: on this
  // small fixture the co-activity graph is complete, so the
  // non-adjacent candidate set is genuinely empty (a vacuous probe);
  // its ts path is the same session-edge recipe ev_session_overlap
  // and ev_user_components already pin here
  private val probes = Seq("ev_sessionize", "ev_session_overlap",
    "ev_tumbling_1h", "ev_range_join", "ev_funnel", "ev_user_components",
    "ev_rfm_segments", "ev_rfm_migration", "ev_cohort_weeks",
    "ev_funnel_windowed")

  private def run(name: String, dir: String): Seq[String] =
    EventQueries.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq

  test("every event-family probe returns identical rows under nanos-long, " +
      "NTZ-micros, and tz-micros physical ts encodings") {
    val dirs = Seq("nanos_long", "ntz_micros", "tz_micros")
      .map(v => v -> materialize(v))
    // sanity: the three variants genuinely carry three different
    // physical types, or the spec guards nothing
    val types = dirs.map { case (_, d) =>
      spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
    }
    assert(types(0) == LongType && types(1) == TimestampNTZType &&
      types(2) == TimestampType, types.toString)
    probes.foreach { q =>
      val results = dirs.map { case (v, d) => v -> run(q, d) }
      val (refName, ref) = results.head
      assert(ref.nonEmpty, s"$q returned 0 rows on $refName — probe is vacuous")
      results.tail.foreach { case (v, got) =>
        assert(got == ref,
          s"$q: $v diverges from $refName (first diff: " +
            s"${got.zipAll(ref, "<missing>", "<missing>").find(p => p._1 != p._2)})")
      }
    }
  }
}
