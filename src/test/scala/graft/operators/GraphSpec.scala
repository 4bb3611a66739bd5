package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("pageRankFixedPoint: hand-computed rounds on a path graph") {
    // path 1-2-3: deg(1)=deg(3)=1, deg(2)=2. S=2^20, base=S/2.
    // round 1: pr(1)=pr(3)=524288+524288/2=786432,
    //          pr(2)=524288+(1048576+1048576)/2/... = 524288+1048576=1572864
    // round 2: pr(1)=pr(3)=524288+ (1572864/2)/2 = 917504,
    //          pr(2)=524288+(786432+786432)/2 = 1310720
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got = Graph.pageRankFixedPoint(edges, "a", "b", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 917504L, 2L -> 1310720L, 3L -> 917504L))
  }

  test("pageRankFixedPoint: symmetrization dedups reversed and repeated edges") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)).toDF("a", "b")
    val clean = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val g1 = Graph.pageRankFixedPoint(edges, "a", "b", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val g2 = Graph.pageRankFixedPoint(clean, "a", "b", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g1 == g2)
  }

  test("labelPropagation separates two bridged triangles (hand-traced)") {
    // triangles {1,2,3} and {4,5,6} bridged by 3-4. With the
    // min-label tie rule the rounds are fully deterministic; after 3
    // rounds the left triangle converges to label 1 and the right to
    // label 3 (the bridge carried 3 across before the left settled) —
    // two distinct communities, split exactly at the bridge.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    val got = Graph.labelPropagation(edges, "a", "b", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), got.toString)
  }

  test("connectedComponents: min label reaches across chains, components separate") {
    // chain 5-4-3-9 (component min 3) and edge 7-8 (component min 7).
    // diameter 3 < 8 rounds -> exact component ids.
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 9L), (7L, 8L)).toDF("a", "b")
    val got = Graph.connectedComponents(edges, "a", "b", iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 3L, 4L -> 3L, 5L -> 3L, 9L -> 3L,
      7L -> 7L, 8L -> 7L))
  }

  test("triangleCounts: shared-edge triangles credit corners exactly once each") {
    // triangles (1,2,3) and (2,3,4) share edge 2-3; edge 1-4 absent.
    // Reversed/duplicate input edges must not inflate counts.
    val edges = Seq((1L, 2L), (3L, 2L), (1L, 3L), (2L, 4L), (4L, 3L), (2L, 1L))
      .toDF("a", "b")
    val got = Graph.triangleCounts(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("pageRankFixedPoint: the hub of a star outranks its leaves") {
    val edges = (2L to 7L).map((1L, _)).toDF("a", "b")
    val got = Graph.pageRankFixedPoint(edges, "a", "b", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((2L to 7L).forall(l => got(1L) > got(l)))
    assert((2L to 7L).map(got).toSet.size == 1, "leaves tie by symmetry")
  }
}
