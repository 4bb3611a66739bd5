package graft.core

import org.scalatest.funsuite.AnyFunSuite

class LongUnionFindSpec extends AnyFunSuite {

  /** Boxed reference implementation (the pre-r16 driver-path code). */
  private def reference(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = new java.util.HashMap[Long, Long]()
    def find(x0: Long): Long = {
      var x = x0
      while (parent.get(x) != x) {
        parent.put(x, parent.get(parent.get(x)))
        x = parent.get(x)
      }
      x
    }
    edges.foreach { case (a, b) =>
      if (!parent.containsKey(a)) parent.put(a, a)
      if (!parent.containsKey(b)) parent.put(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb) }
    }
    import scala.jdk.CollectionConverters._
    parent.keySet.asScala.map(k => k.longValue -> find(k)).toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val uf = new LongUnionFind(16) // tiny: forces many grow() rounds
    edges.foreach { case (a, b) => uf.union(a, b) }
    uf.entries().toMap
  }

  test("random graphs match the boxed reference across grow cycles") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 20) {
      val n = 50 + rnd.nextInt(3000)
      // mix of dense clusters, chains, and far-apart ids (hash spread)
      val edges = Seq.fill(n) {
        rnd.nextInt(4) match {
          case 0 => val c = rnd.nextInt(10) * 1000L
                    (c + rnd.nextInt(30), c + rnd.nextInt(30))
          case 1 => val i = rnd.nextInt(5000).toLong; (i, i + 1)
          case 2 => (rnd.nextLong(1L << 40), rnd.nextLong(1L << 40))
          case _ => val i = rnd.nextInt(100).toLong; (i, i) // self loop
        }
      }
      assert(run(edges) == reference(edges), s"trial $trial n=$n")
    }
  }

  test("root is always the component minimum; entries cover every id") {
    val edges = Seq((9L, 3L), (3L, 7L), (100L, 9L), (42L, 42L))
    val m = run(edges)
    assert(m == Map(9L -> 3L, 3L -> 3L, 7L -> 3L, 100L -> 3L, 42L -> 42L))
  }
}
