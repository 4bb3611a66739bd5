package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class DedupIncrementalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def clusters(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.duplicateClusters(pairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("delta pairs fold into stored labels == full batch recompute") {
    val oldPairs = Seq((10L, 11L), (20L, 21L), (40L, 41L))
    val stored = Dedup.duplicateClusters(oldPairs.toDF("id_a", "id_b"))
    // delta doc 5 BRIDGES clusters {10,11} and {20,21} and carries the
    // new global min; 30/31 form a delta-only cluster; {40,41} is
    // untouched stored state
    val newPairs = Seq((5L, 11L), (5L, 21L), (30L, 31L))
    val got = Dedup.clustersIncremental(stored, newPairs.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = clusters(oldPairs ++ newPairs)
    assert(got == batch)
    // the merge landed on the global min across BOTH old clusters
    assert(got(11L) == 5L && got(21L) == 5L && got(10L) == 5L && got(20L) == 5L)
    // untouched stored cluster keeps its label; delta-only cluster forms
    assert(got(41L) == 40L && got(31L) == 30L)
  }

  test("stored self-labeled singleton untouched by delta pairs survives") {
    // (7,7) has no star edge; before the anti-join re-add it vanished
    // from the output even though the stored state contained it
    val stored = Seq((7L, 7L), (10L, 10L), (11L, 10L)).toDF("id", "cluster_id")
    val got = Dedup.clustersIncremental(stored,
        Seq((30L, 31L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(7L -> 7L, 10L -> 10L, 11L -> 10L, 30L -> 30L, 31L -> 30L))
    // a singleton TOUCHED by a delta pair is resolved once, not duplicated
    val got2 = Dedup.clustersIncremental(stored,
        Seq((7L, 3L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(3L -> 3L, 7L -> 3L, 10L -> 10L, 11L -> 10L))
  }

  test("delta member with a higher id joins without disturbing the rep") {
    val stored = Dedup.duplicateClusters(Seq((10L, 11L)).toDF("id_a", "id_b"))
    val got = Dedup.clustersIncremental(stored,
        Seq((99L, 11L)).toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 99L -> 10L))
  }
}
