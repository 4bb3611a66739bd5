package graft.operators

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `Dedup.rebalanced` probe-skip contract (ADVICE r17 + r18).
  *
  * The footgun chain: probing partition counts via
  * `queryExecution.toRdd` on an AQE-wrapped shuffle-bearing frame
  * EXECUTES every upstream stage at plan-BUILD time (a full wasted run
  * of the input DAG). The r17 fix skipped AQE frames wholesale, which
  * lost the rebalance on exchange-free scan chains AQE happens to
  * wrap; the r18 fix keyed the skip on an Exchange in `inputPlan` —
  * but AQE captures inputPlan BEFORE EnsureRequirements, so
  * join/aggregate frames show ZERO exchanges there and fell through to
  * the probe again. The fix under test keys on `initialPlan`
  * (post-EnsureRequirements, actually exchange-bearing).
  */
class DedupRebalanceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("inputPlan hides the exchanges EnsureRequirements inserts; initialPlan has them") {
    val agg = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .groupBy($"text").agg(org.apache.spark.sql.functions.max($"doc_id"))
    agg.queryExecution.executedPlan match {
      case aqe: AdaptiveSparkPlanExec =>
        // this asymmetry is WHY the guard must read initialPlan: if
        // Spark ever starts capturing inputPlan post-EnsureRequirements
        // the first assert flips and the guard can be simplified
        assert(!aqe.inputPlan.exists(_.isInstanceOf[Exchange]),
          "inputPlan unexpectedly carries an Exchange — guard premise changed")
        assert(aqe.initialPlan.exists(_.isInstanceOf[Exchange]),
          "initialPlan must carry the aggregate's shuffle")
      case p => fail(s"expected an AQE-wrapped aggregate, got ${p.nodeName}")
    }
  }

  test("building a signature pipeline over a shuffle-bearing frame runs ZERO jobs") {
    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // a deep frame of the minhashNearDups shape: agg + self-join,
    // several upstream stages a build-time probe would execute
    val base = (1L to 500L).map(i => (i, s"token$i word${i % 7}"))
      .toDF("doc_id", "text")
    val deep = base.groupBy($"text")
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("doc_id"))
      .join(base.select($"doc_id"), "doc_id")
    spark.sparkContext.addSparkListener(listener)
    try {
      val built = Dedup.withShingles(deep, "doc_id", "text", 3, word = true)
      assert(built.columns.toSeq == Seq("doc_id", "shingles"))
      // job submission inside toRdd/getFinalPhysicalPlan is synchronous,
      // so a wasted upstream run would have fired onJobStart by now;
      // give the async listener bus time to deliver before asserting
      Thread.sleep(500)
      assert(jobs.get() == 0,
        s"plan-BUILD executed ${jobs.get()} upstream job(s) — the r17 " +
          "wasted-run regression is back")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("an under-partitioned exchange-free scan still gets the rebalance, " +
      "capped by the rows-per-partition floor (r21)") {
    val target = spark.sessionState.conf.numShufflePartitions
    // past the floor*target cap: full-width spread, exactly as before
    val big = (1L to (512L * target + 1))
      .map(i => (i, s"doc $i")).toDF("doc_id", "text").coalesce(1)
    assert(big.queryExecution.toRdd.getNumPartitions == 1)
    val builtBig = Dedup.withShingles(big, "doc_id", "text", 3, word = true)
    assert(builtBig.rdd.getNumPartitions == target,
      "narrow single-split input past the cap must spread to full width")
    // mid-size: spread to ceil(rows / floor) partitions, not target
    val mid = (1L to 1200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .coalesce(1)
    val builtMid = Dedup.withShingles(mid, "doc_id", "text", 3, word = true)
    assert(builtMid.rdd.getNumPartitions == math.min(target, 3),
      "mid-size input must spread to its row volume, not the full width")
    // tiny: fewer rows than one floor's worth — no shuffle at all
    val tiny = (1L to 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .coalesce(1)
    val builtTiny = Dedup.withShingles(tiny, "doc_id", "text", 3, word = true)
    assert(builtTiny.rdd.getNumPartitions == 1,
      "sub-floor input must not pay a spread shuffle")
  }
}
