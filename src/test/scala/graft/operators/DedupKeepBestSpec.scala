package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupKeepBestSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // per-cluster 40-word bases keep WITHIN-cluster pair Jaccard high
  // (>= 38/40 word-3-shingles) and across-cluster Jaccard zero;
  // suffixes tune the quality key
  private val baseA = (1 to 40).map(i => s"w$i").mkString(" ")
  private val baseB = (1 to 40).map(i => s"v$i").mkString(" ")

  private val docs = Seq(
    // cluster A: 11 beats 10 on quality (2 extra stopwords), despite
    // the higher id — min-id would keep 10
    (10L, baseA),
    (11L, baseA + " the and"),
    // cluster B: exact copies -> equal quality, tie broken by min id
    (20L, baseB + " of it here"),
    (21L, baseB + " of it here"),
    // singleton: never appears in the member frame
    (30L, (1 to 40).map(i => s"q$i").mkString(" "))
  ).toDF("doc_id", "text")

  private lazy val out = Dedup.dedupKeepBest(docs, "doc_id", "text",
    TextStats.qualityMilli(docs, "doc_id", "text"))
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    .sortBy(_._1)

  test("members match duplicateClusters; singletons excluded") {
    assert(out.map(_._1).toSeq === Seq(10L, 11L, 20L, 21L))
    assert(out.filter(_._2 == 10L).map(_._1).toSet === Set(10L, 11L))
    assert(out.filter(_._2 == 20L).map(_._1).toSet === Set(20L, 21L))
  }

  test("representative = max quality, then min id; exactly one per cluster") {
    val kept = out.filter(_._4).map(_._1).toSet
    assert(kept === Set(11L, 20L)) // quality beats id in A; tie -> min id in B
    // quality ordering that forced the choice
    val q = out.map(t => t._1 -> t._3).toMap
    assert(q(11L) > q(10L))
    assert(q(20L) === q(21L))
    assert(out.groupBy(_._2).forall(_._2.count(_._4) == 1))
  }
}
